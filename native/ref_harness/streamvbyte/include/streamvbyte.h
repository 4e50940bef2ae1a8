// Compile-only stand-in for streamvbyte (submodule absent in the
// reference checkout); calls abort loudly.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>

inline size_t streamvbyte_max_compressedbytes(uint32_t length) {
    return 5 * size_t(length) + 16;
}

inline size_t streamvbyte_encode(const uint32_t*, uint32_t, uint8_t*) {
    fprintf(stderr, "ref_harness: streamvbyte_encode stand-in called\n");
    abort();
}

inline size_t streamvbyte_decode(const uint8_t*, uint32_t*, uint32_t) {
    fprintf(stderr, "ref_harness: streamvbyte_decode stand-in called\n");
    abort();
}
