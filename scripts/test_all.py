#!/usr/bin/env python3
"""Vroom round-trip sweep without DINT (reference scripts/test_all.py)."""

import sys
from common import run

docs_file = sys.argv[1]
for t in ("u32", "vbyte", "streamvbyte", "maskedvbyte", "varintgb",
          "simple16", "qmx", "optpfor", "interpolative", "pef"):
    out = f"{docs_file}.{t}.bin"
    run(["dint_tpu.tools.encode", t, docs_file, "--out", out])
    run(["dint_tpu.tools.check_encoded_data", t, out, docs_file])
