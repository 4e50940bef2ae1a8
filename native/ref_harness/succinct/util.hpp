// Minimal stand-in for succinct/util.hpp (submodule not vendored):
// just ceil_div, which the reference DINT codecs use for block counts.
#pragma once

#include <cstdint>

namespace succinct {
namespace util {

inline uint64_t ceil_div(uint64_t dividend, uint64_t divisor) {
    return (dividend + divisor - 1) / divisor;
}

}  // namespace util

namespace intrinsics {

template <typename T>
inline void prefetch(T const* ptr) {
    __builtin_prefetch(ptr);
}

}  // namespace intrinsics
}  // namespace succinct
