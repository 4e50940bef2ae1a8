// Compile-only stand-in for succinct::mapper (submodule not vendored):
// the harness builds indexes in memory and never freezes/maps them, so
// the serialization entry points abort loudly if ever reached.
#pragma once

#include <cstdio>
#include <cstdlib>

#include "mappable_vector.hpp"

namespace succinct {
namespace mapper {

struct map_flags {
    static const int warmup = 1;
};

[[noreturn]] inline void ref_harness_mapper_unavailable() {
    fprintf(stderr,
            "ref_harness: succinct::mapper stand-in called (freeze/map are "
            "not provided; the harness builds indexes in memory)\n");
    abort();
}

template <typename T>
size_t freeze(T&, const char*) {
    ref_harness_mapper_unavailable();
}

template <typename T, typename Source>
size_t map(T&, Source const&, int = 0) {
    ref_harness_mapper_unavailable();
}

template <typename T>
size_t size_of(T&) {
    ref_harness_mapper_unavailable();
}

}  // namespace mapper
}  // namespace succinct
