// Compile-only stand-in for MaskedVByte's encoder (submodule absent);
// calls abort loudly.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>

inline size_t vbyte_encode(const uint32_t*, size_t, uint8_t*) {
    fprintf(stderr, "ref_harness: vbyte_encode stand-in called\n");
    abort();
}
