// Minimal BOOST_PP_SEQ_ENUM stand-in (boost not installed).
#pragma once

#include "../cat.hpp"
#include "for_each.hpp"

#define BOOST_PP_SEQ_ENUM(seq) \
    BOOST_PP_CAT(BOOST_PP_SEQ_EN_, BOOST_PP_SEQ_SIZE(seq)) seq
#define BOOST_PP_SEQ_EN_1(x) x
#define BOOST_PP_SEQ_EN_2(x) x, BOOST_PP_SEQ_EN_1
#define BOOST_PP_SEQ_EN_3(x) x, BOOST_PP_SEQ_EN_2
#define BOOST_PP_SEQ_EN_4(x) x, BOOST_PP_SEQ_EN_3
#define BOOST_PP_SEQ_EN_5(x) x, BOOST_PP_SEQ_EN_4
#define BOOST_PP_SEQ_EN_6(x) x, BOOST_PP_SEQ_EN_5
#define BOOST_PP_SEQ_EN_7(x) x, BOOST_PP_SEQ_EN_6
#define BOOST_PP_SEQ_EN_8(x) x, BOOST_PP_SEQ_EN_7
#define BOOST_PP_SEQ_EN_9(x) x, BOOST_PP_SEQ_EN_8
#define BOOST_PP_SEQ_EN_10(x) x, BOOST_PP_SEQ_EN_9
#define BOOST_PP_SEQ_EN_11(x) x, BOOST_PP_SEQ_EN_10
#define BOOST_PP_SEQ_EN_12(x) x, BOOST_PP_SEQ_EN_11
#define BOOST_PP_SEQ_EN_13(x) x, BOOST_PP_SEQ_EN_12
#define BOOST_PP_SEQ_EN_14(x) x, BOOST_PP_SEQ_EN_13
#define BOOST_PP_SEQ_EN_15(x) x, BOOST_PP_SEQ_EN_14
#define BOOST_PP_SEQ_EN_16(x) x, BOOST_PP_SEQ_EN_15
#define BOOST_PP_SEQ_EN_17(x) x, BOOST_PP_SEQ_EN_16
#define BOOST_PP_SEQ_EN_18(x) x, BOOST_PP_SEQ_EN_17
#define BOOST_PP_SEQ_EN_19(x) x, BOOST_PP_SEQ_EN_18
#define BOOST_PP_SEQ_EN_20(x) x, BOOST_PP_SEQ_EN_19
#define BOOST_PP_SEQ_EN_21(x) x, BOOST_PP_SEQ_EN_20
#define BOOST_PP_SEQ_EN_22(x) x, BOOST_PP_SEQ_EN_21
#define BOOST_PP_SEQ_EN_23(x) x, BOOST_PP_SEQ_EN_22
#define BOOST_PP_SEQ_EN_24(x) x, BOOST_PP_SEQ_EN_23
