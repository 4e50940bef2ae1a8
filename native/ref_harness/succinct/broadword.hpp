// Minimal stand-in for succinct/broadword.hpp (submodule not
// vendored): only msb(), which the reference's util.hpp ceil_log2 /
// floor_log2 wrappers call.
#pragma once

#include <cstdint>

namespace succinct {
namespace broadword {

inline uint8_t msb(uint64_t x) {
    return x ? uint8_t(63 - __builtin_clzll(x)) : 0;
}

inline bool msb(uint64_t x, unsigned long& ret) {
    if (!x) return false;
    ret = 63 - __builtin_clzll(x);
    return true;
}

inline uint64_t popcount(uint64_t x) { return __builtin_popcountll(x); }

}  // namespace broadword
}  // namespace succinct
