// Compile-only stand-in for FastPFor's OPTPFor/Simple16 (the FastPFor
// submodule is not vendored).  The reference's optpfor_block /
// simple16_block wrappers compile against these signatures; any attempt
// to actually run them aborts loudly — the cross-validation and timing
// harnesses never exercise codecs whose upstream implementation is
// absent from the reference checkout.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace FastPFor {

[[noreturn]] inline void ref_harness_unavailable(const char* what) {
    fprintf(stderr,
            "ref_harness: %s is a compile-only stand-in (FastPFor submodule "
            "absent in the reference checkout)\n",
            what);
    abort();
}

inline uint32_t maxbits(const uint32_t* begin, const uint32_t* end) {
    uint32_t m = 0;
    for (const uint32_t* p = begin; p != end; ++p) m |= *p;
    return m ? 32 - __builtin_clz(m) : 0;
}

template <bool AllowOverflow>
struct Simple16 {
    void encodeArray(const uint32_t*, size_t, uint32_t*, size_t&) {
        ref_harness_unavailable("Simple16::encodeArray");
    }
    const uint32_t* decodeArray(const uint32_t*, size_t, uint32_t*, size_t&) {
        ref_harness_unavailable("Simple16::decodeArray");
    }
};

template <uint32_t BlockSizeInUnitsOfPackSize, class ExceptionCoder>
struct OPTPFor {
    static const uint32_t PACKSIZE = 32;
    static const uint32_t BlockSize = BlockSizeInUnitsOfPackSize * PACKSIZE;

    static inline const std::vector<uint32_t> possLogs = {
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 16, 20, 32};

    uint32_t tryB(uint32_t, const uint32_t*, uint32_t) {
        ref_harness_unavailable("OPTPFor::tryB");
    }
    void encodeBlock(const uint32_t*, uint32_t*, size_t&) {
        ref_harness_unavailable("OPTPFor::encodeBlock");
    }
    const uint32_t* decodeBlock(const uint32_t*, uint32_t*, size_t&) {
        ref_harness_unavailable("OPTPFor::decodeBlock");
    }
};

}  // namespace FastPFor
