#!/usr/bin/env python3
"""Timing sweep across index types (reference scripts/collect_timings.py)."""

import sys
from common import run

basename, queries = sys.argv[1], sys.argv[2]
for t in ("single_packed_dint", "multi_packed_dint", "opt", "block_optpfor"):
    idx = f"{basename}.{t}.idx"
    run(["dint_tpu.tools.create_freq_index", t, basename, idx])
    run(["dint_tpu.tools.queries", t, "and:or", idx, "--queries", queries])
