"""Measure whole-list zoo decode rates and write bench_artifacts/zoo.json.

One machine-readable artifact for the per-codec host rates (and device
rates when a TPU is attached), committed to the repo so rounds diff
numbers instead of prose (VERDICT r2 item 7).  Host decode goes through the production
vroom_zoo.decode_list_zoo path (native C++ when available — pass
--no-native to measure the numpy fallbacks).

Usage: python scripts/zoo_rates.py [--n 1000000] [--no-native] [--device]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dint_tpu  # noqa: F401  (installs the malloc/THP fixes)

CODECS = ["vbyte", "varintgb", "streamvbyte", "maskedvbyte", "varintg8iu",
          "simple16", "optpfor", "qmx"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-native", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="also record device engine rates (needs a TPU "
                         "and .bench/bench.<codec>.bin streams)")
    ap.add_argument("--device-runs", type=int, default=400)
    ap.add_argument("--bench-dir", default=None,
                    help="stream/collection cache for the device sweep "
                         "(default .bench; use .bench_skew for the "
                         "crawl-shaped collection's column)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", "zoo.json"))
    args = ap.parse_args()
    if args.no_native:
        os.environ["DINT_TPU_NATIVE_ZOO"] = "0"

    from dint_tpu.codecs import zoonative
    from dint_tpu.index import vroom_zoo

    rng = np.random.default_rng(4)
    n = args.n
    gaps = rng.integers(0, 1 << 12, size=n).astype(np.uint32)
    gaps[rng.integers(0, n, n // 2000)] = rng.integers(
        1 << 18, 1 << 23, n // 2000).astype(np.uint32)

    rec = {
        "n": n,
        "native": zoonative.get_lib() is not None,
        "host_mints_per_s": {},
        "bytes_per_int": {},
    }
    for codec in CODECS + ["interpolative"]:
        payload, _ = vroom_zoo.encode_list_zoo(codec, gaps)
        arena = np.frombuffer(payload, dtype=np.uint8)
        out = vroom_zoo.decode_list_zoo(codec, arena, 0, n)
        assert np.array_equal(out, gaps), codec
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            vroom_zoo.decode_list_zoo(codec, arena, 0, n)
            best = min(best, time.perf_counter() - t0)
        rec["host_mints_per_s"][codec] = round(n / best / 1e6, 1)
        rec["bytes_per_int"][codec] = round(len(payload) / n, 3)
        print(f"{codec:13s} {n / best / 1e6:8.1f} M ints/s "
              f"({len(payload) / n:.2f} B/int)", file=sys.stderr)

    dev_rec = None
    if args.device:
        import jax

        assert jax.default_backend() == "tpu", jax.default_backend()
        from dint_tpu.tools import decode as dtool
        from dint_tpu.utils import jaxcfg

        jaxcfg.enable_compile_cache()
        bench_dir = args.bench_dir or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench")
        bench_dir = os.path.abspath(bench_dir)
        coll = os.path.join(bench_dir, "bench_collection.docs")
        dev_rec = {"runs": args.device_runs, "engine": "ladder",
                   "collection": os.path.basename(bench_dir),
                   "gints_per_s": {}, "image_B_per_int": {},
                   "cold_start_s": {}}
        # pef/u32/interpolative: device via the ladder image only —
        # with it, ALL ELEVEN vroom list types have recorded device
        # rates (their host paths are measured elsewhere: pef in
        # .bench/ab tables, u32 is raw memory, interpolative is the
        # deliberate host-side exception for lazy block decode)
        for codec in CODECS + ["u32", "interpolative", "pef"]:
            stream = os.path.join(bench_dir, f"bench.{codec}.bin")
            if not os.path.exists(stream):
                if not os.path.exists(coll):
                    print(f"{codec:13s} (no bench stream, skipped)",
                          file=sys.stderr)
                    continue
                print(f"{codec:13s} encoding bench stream (one-time)...",
                      file=sys.stderr)
                from dint_tpu.tools import encode as etool

                etool.encode_zoo(codec, coll, stream)
            r = dtool.decode_zoo_device(
                codec, stream, args.device_runs,
                coll if os.path.exists(coll) else None,
            )
            g = float(r["ints_x_sec"]) / 1e9
            bpi = int(r["plan_bytes"]) / float(r["num_integers"])
            dev_rec["gints_per_s"][codec] = round(g, 1)
            dev_rec["image_B_per_int"][codec] = round(bpi, 3)
            # one-time wire -> device-image prep (VERDICT r3 weak #2:
            # steady-state rates must travel with their cold cost)
            dev_rec["cold_start_s"][codec] = round(
                float(r.get("cold_start_s", 0.0)), 3)
            print(f"{codec:13s} device {g:8.1f} G ints/s "
                  f"({bpi:.2f} image B/int, cold "
                  f"{float(r.get('cold_start_s', 0)):.1f}s, check="
                  f"{r.get('check', 'skipped')})", file=sys.stderr)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    key = "host_numpy" if args.no_native else "host_native"
    existing[key] = rec
    if dev_rec is not None:
        dkey = "device_ladder"
        if args.bench_dir and os.path.basename(
                os.path.abspath(args.bench_dir)) != ".bench":
            dkey += "_" + os.path.basename(
                os.path.abspath(args.bench_dir)).lstrip(".")
        existing[dkey] = dev_rec
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({key: rec}))


if __name__ == "__main__":
    main()
