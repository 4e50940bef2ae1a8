// Compile-only stand-in: the reference includes FastPFor's
// variablebyte.h from block_codecs.hpp but uses nothing from it.
#pragma once
