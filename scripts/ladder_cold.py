"""Measure the ladder engine's cold start (wire -> device image) and
steady-state rate on a DINT stream, without the gather leg.

The 908M evidence for VERDICT r3 item 2's second half: the gather
planner went streaming-native (37 s cold at 908M); this records the
ladder leg's cold path (native flat unit decode via
qh_decode_units_flat + ladder re-pack) before/after numbers.

Usage (TPU): python scripts/ladder_cold.py [--cache-dir .scale1e9]
             [--runs 20] [--numpy]  (--numpy forces the old batch path)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dint_tpu  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=".scale1e9")
    ap.add_argument("--stream", default="scale.single_rect_dint.bin")
    ap.add_argument("--dict", default=(
        "dict.scale_collection.docs.rectangular.DSF-65536-16"))
    ap.add_argument("--type", default="single_rect_dint")
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--numpy", action="store_true",
                    help="force the numpy batch unit decode (A/B)")
    args = ap.parse_args()
    if args.numpy:
        os.environ["DINT_TPU_NATIVE_LADDER_DECODE"] = "0"

    from dint_tpu.tools import decode as dtool
    from dint_tpu.utils import jaxcfg

    jaxcfg.enable_compile_cache()
    cache = os.path.abspath(args.cache_dir)
    t0 = time.perf_counter()
    rec = dtool.decode_stream(
        args.type,
        os.path.join(cache, args.stream),
        os.path.join(cache, args.dict),
        runs=args.runs,
        engine="ladder",
    )
    rec["wall_total_s"] = round(time.perf_counter() - t0, 1)
    rec["unit_decode"] = "numpy" if args.numpy else "native"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
