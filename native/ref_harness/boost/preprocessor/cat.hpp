// Minimal BOOST_PP_CAT stand-in (boost not installed).
#pragma once
#define BOOST_PP_CAT(a, b) BOOST_PP_CAT_I(a, b)
#define BOOST_PP_CAT_I(a, b) a##b
