#!/usr/bin/env python3
"""Vroom encode+decode sweep including DINT (reference scripts/stat_all.py;
the reference wraps these in `perf record` — here decode stats lines
carry the timings)."""

import sys
from common import run

docs_file = sys.argv[1]
types = ["single_packed_dint", "u32", "vbyte", "streamvbyte", "maskedvbyte",
         "varintgb", "simple16", "qmx", "optpfor", "pef"]
for t in types:
    out = f"{docs_file}.{t}.bin"
    args = ["dint_tpu.tools.encode", t, docs_file, "--out", out]
    run(args)
    dargs = ["dint_tpu.tools.decode", t, out]
    if t.endswith("dint"):
        import os
        base = os.path.basename(docs_file)
        kind = "single_packed" if "packed" in t else "rectangular"
        dargs += ["--dict", f"dict.{base}.{kind}.DSF-65536-16"]
    run(dargs)
