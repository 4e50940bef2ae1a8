// Compile-only stand-in for MaskedVByte's decoder (submodule absent);
// calls abort loudly.
#pragma once

#include <cstdint>
#include <cstdio>
#include <cstdlib>

inline size_t masked_vbyte_decode(const uint8_t*, uint32_t*, uint64_t) {
    fprintf(stderr, "ref_harness: masked_vbyte_decode stand-in called\n");
    abort();
}
