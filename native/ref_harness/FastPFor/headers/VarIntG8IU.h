// Compile-only stand-in for FastPFor's VarIntG8IU base class (submodule
// absent).  The reference's varint_G8IU_block derives from it for the
// encode path and the shuffle tables; running it aborts loudly.
#pragma once

#include <cstdint>
#include <cstdlib>
#include <emmintrin.h>

#include "optpfor.h"  // ref_harness_unavailable

namespace FastPFor {

class VarIntG8IU {
public:
    __m128i vecmask[256][2];
    int maskOutputSize[256];

    VarIntG8IU() {
        for (int i = 0; i < 256; ++i) {
            vecmask[i][0] = _mm_setzero_si128();
            vecmask[i][1] = _mm_setzero_si128();
            maskOutputSize[i] = 0;
        }
    }

    size_t encodeBlock(const uint32_t*& /*src*/, size_t& /*srclen*/,
                       unsigned char*& /*dst*/, size_t& /*dstlen*/) {
        ref_harness_unavailable("VarIntG8IU::encodeBlock");
    }
};

}  // namespace FastPFor
