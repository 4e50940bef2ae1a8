// Stand-in for FastPFor/headers/common.h (submodule not vendored):
// the reference's varintgb.h only needs the standard includes.
#pragma once

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <stdexcept>
#include <string>
#include <vector>

#include <emmintrin.h>
#include <smmintrin.h>
#include <tmmintrin.h>
