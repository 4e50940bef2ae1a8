#!/usr/bin/env python3
"""Build a trio of block indexes (reference scripts/build.py)."""

import sys
from common import run

basename = sys.argv[1]
for t in ("block_optpfor", "block_varintg8iu", "block_interpolative"):
    run(["dint_tpu.tools.create_freq_index", t, basename, f"{basename}.{t}.idx"])
