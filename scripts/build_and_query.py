#!/usr/bin/env python3
"""Build every block index type and time AND queries over query logs
(reference scripts/build_and_query.py:1-41)."""

import sys
from common import run

basename, queries = sys.argv[1], sys.argv[2]
types = [
    "block_optpfor", "block_varintg8iu", "block_interpolative", "block_qmx",
    "block_mixed", "block_u32", "block_vbyte", "block_simple16",
    "block_varintgb", "block_maskedvbyte", "block_streamvbyte",
]
for t in types:
    idx = f"{basename}.{t}.idx"
    run(["dint_tpu.tools.create_freq_index", t, basename, idx])
    run(["dint_tpu.tools.queries", t, "and", idx, "--queries", queries])
