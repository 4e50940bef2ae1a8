#!/usr/bin/env python3
"""Query sweep over one index (reference scripts/query.py)."""

import sys
from common import run

index_type, index_file, queries = sys.argv[1:4]
ops = sys.argv[4] if len(sys.argv) > 4 else "and:or"
run(["dint_tpu.tools.queries", index_type, ops, index_file, "--queries", queries])
