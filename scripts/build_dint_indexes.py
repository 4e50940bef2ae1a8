#!/usr/bin/env python3
"""Build the DINT index family (reference scripts/build_dint_indexes.py
referenced types absent from its tree; these are the three shipped
ones, index_types.hpp:75-80)."""

import sys
from common import run

basename = sys.argv[1]
for t in ("single_rect_dint", "single_packed_dint", "multi_packed_dint"):
    run(["dint_tpu.tools.create_freq_index", t, basename, f"{basename}.{t}.idx", "--check"])
