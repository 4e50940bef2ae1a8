// Minimal BOOST_PP sequence macros (boost not installed): SEQ_SIZE,
// SEQ_FOR_EACH, head/tail helpers, supporting seqs up to 24 elements —
// enough for the reference's DS2I_FEATURE_TYPES (8) and
// DS2I_INDEX_TYPES (18).
#pragma once

#include "../cat.hpp"

// ---- size -----------------------------------------------------------
#define BOOST_PP_SEQ_SIZE(seq) \
    BOOST_PP_CAT(BOOST_PP_SEQ_SIZE_, BOOST_PP_SEQ_SIZE_0 seq)
#define BOOST_PP_SEQ_SIZE_0(_) BOOST_PP_SEQ_SIZE_1
#define BOOST_PP_SEQ_SIZE_1(_) BOOST_PP_SEQ_SIZE_2
#define BOOST_PP_SEQ_SIZE_2(_) BOOST_PP_SEQ_SIZE_3
#define BOOST_PP_SEQ_SIZE_3(_) BOOST_PP_SEQ_SIZE_4
#define BOOST_PP_SEQ_SIZE_4(_) BOOST_PP_SEQ_SIZE_5
#define BOOST_PP_SEQ_SIZE_5(_) BOOST_PP_SEQ_SIZE_6
#define BOOST_PP_SEQ_SIZE_6(_) BOOST_PP_SEQ_SIZE_7
#define BOOST_PP_SEQ_SIZE_7(_) BOOST_PP_SEQ_SIZE_8
#define BOOST_PP_SEQ_SIZE_8(_) BOOST_PP_SEQ_SIZE_9
#define BOOST_PP_SEQ_SIZE_9(_) BOOST_PP_SEQ_SIZE_10
#define BOOST_PP_SEQ_SIZE_10(_) BOOST_PP_SEQ_SIZE_11
#define BOOST_PP_SEQ_SIZE_11(_) BOOST_PP_SEQ_SIZE_12
#define BOOST_PP_SEQ_SIZE_12(_) BOOST_PP_SEQ_SIZE_13
#define BOOST_PP_SEQ_SIZE_13(_) BOOST_PP_SEQ_SIZE_14
#define BOOST_PP_SEQ_SIZE_14(_) BOOST_PP_SEQ_SIZE_15
#define BOOST_PP_SEQ_SIZE_15(_) BOOST_PP_SEQ_SIZE_16
#define BOOST_PP_SEQ_SIZE_16(_) BOOST_PP_SEQ_SIZE_17
#define BOOST_PP_SEQ_SIZE_17(_) BOOST_PP_SEQ_SIZE_18
#define BOOST_PP_SEQ_SIZE_18(_) BOOST_PP_SEQ_SIZE_19
#define BOOST_PP_SEQ_SIZE_19(_) BOOST_PP_SEQ_SIZE_20
#define BOOST_PP_SEQ_SIZE_20(_) BOOST_PP_SEQ_SIZE_21
#define BOOST_PP_SEQ_SIZE_21(_) BOOST_PP_SEQ_SIZE_22
#define BOOST_PP_SEQ_SIZE_22(_) BOOST_PP_SEQ_SIZE_23
#define BOOST_PP_SEQ_SIZE_23(_) BOOST_PP_SEQ_SIZE_24
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_0 0
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_1 1
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_2 2
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_3 3
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_4 4
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_5 5
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_6 6
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_7 7
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_8 8
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_9 9
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_10 10
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_11 11
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_12 12
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_13 13
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_14 14
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_15 15
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_16 16
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_17 17
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_18 18
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_19 19
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_20 20
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_21 21
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_22 22
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_23 23
#define BOOST_PP_SEQ_SIZE_BOOST_PP_SEQ_SIZE_24 24

// ---- head / tail ------------------------------------------------------
#define BOOST_PP_SEQ_HEAD(seq) BOOST_PP_SEQ_HEAD_I(BOOST_PP_SEQ_HEAD_X seq)
#define BOOST_PP_SEQ_HEAD_X(x) x,
#define BOOST_PP_SEQ_HEAD_I(...) BOOST_PP_SEQ_HEAD_II(__VA_ARGS__)
#define BOOST_PP_SEQ_HEAD_II(x, ...) x

#define BOOST_PP_SEQ_TAIL(seq) BOOST_PP_SEQ_TAIL_I seq
#define BOOST_PP_SEQ_TAIL_I(x)

// ---- for_each ---------------------------------------------------------
#define BOOST_PP_SEQ_FOR_EACH(m, d, seq) \
    BOOST_PP_CAT(BOOST_PP_SEQ_FE_, BOOST_PP_SEQ_SIZE(seq))(m, d, seq)
#define BOOST_PP_SEQ_FE_0(m, d, seq)
#define BOOST_PP_SEQ_FE_1(m, d, seq) m(1, d, BOOST_PP_SEQ_HEAD(seq))
#define BOOST_PP_SEQ_FE_2(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_1(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_3(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_2(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_4(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_3(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_5(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_4(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_6(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_5(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_7(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_6(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_8(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_7(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_9(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))  \
    BOOST_PP_SEQ_FE_8(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_10(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_9(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_11(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_10(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_12(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_11(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_13(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_12(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_14(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_13(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_15(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_14(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_16(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_15(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_17(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_16(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_18(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_17(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_19(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_18(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_20(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_19(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_21(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_20(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_22(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_21(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_23(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_22(m, d, BOOST_PP_SEQ_TAIL(seq))
#define BOOST_PP_SEQ_FE_24(m, d, seq) \
    m(1, d, BOOST_PP_SEQ_HEAD(seq))   \
    BOOST_PP_SEQ_FE_23(m, d, BOOST_PP_SEQ_TAIL(seq))
