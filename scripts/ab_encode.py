"""Interleaved A/B: our native DINT encoder vs the REFERENCE's own
encoders compiled from /root/reference (VERDICT r2 item 2).

The reference side is native/ref_check.cpp's timed mode (tsingle /
trect / tmulti), which drives the actual single_opt_dint /
multi_opt_dint templates (vroom_env/dint_codecs.hpp:190-518) over the
same unit stream.  Per rep each side gets FRESH state — reference:
builder load_from_file + prepare_for_encoding; ours: a fresh
NativeEncoder (so the content memo never sees cross-rep repeats) —
then encodes the full real bench unit stream once.  Reps interleave
ref/ours to ride the same VM timing phase (host timing on this box
varies +-40 percent across minutes); compare best-of-N encode-only
seconds (map building is one-time per index build on both sides and
is reported separately).

Usage: python scripts/ab_encode.py [--reps 5] [--modes single rect multi]
Requires .bench/ artifacts (run bench.py once), g++, /root/reference.
Writes bench_artifacts/ab_encode.json (tracked) and prints one JSON
line per mode.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dint_tpu  # noqa: F401  (installs the malloc/THP fixes)
from dint_tpu.codecs.encode_batch import BLOCK_SIZE, OPT_CHUNK
from dint_tpu.codecs.native import native_encoder_for
from dint_tpu.dictionary.builder import build_or_load_dict, dict_cache_name
from dint_tpu.io import collection

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("DINT_REF", "/root/reference")


def build_ref_check(tmp: str) -> str:
    exe = os.path.join(tmp, "ref_check")
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-std=c++17",
            f"-I{REF}/include", f"-I{REF}/include/dint", f"-I{REF}",
            f"-I{REPO}/native/ref_harness",
            f"{REPO}/native/ref_check.cpp", "-o", exe,
        ],
        check=True, capture_output=True,
    )
    return exe


def unit_stream(base: str, chunk: int):
    """The exact unit stream build_index hands the encoder: doc d-gaps
    chopped at `chunk`, as consecutive views of one contiguous array
    (hits the encoder's zero-copy path, like the real build)."""
    gaps_parts = []
    lens = []
    for docs, _ in collection.open_freq_collection(base):
        a = np.asarray(docs, dtype=np.uint32)
        if a.shape[0] == 0:
            continue
        g = np.empty_like(a)
        g[0] = a[0]
        np.subtract(a[1:], a[:-1], out=g[1:])
        g[1:] -= 1
        for i in range(0, g.shape[0], chunk):
            lens.append(min(chunk, g.shape[0] - i))
    flat = np.empty(sum(lens), dtype=np.uint32)
    pos = 0
    for docs, _ in collection.open_freq_collection(base):
        a = np.asarray(docs, dtype=np.uint32)
        if a.shape[0] == 0:
            continue
        g = flat[pos : pos + a.shape[0]]
        g[0] = a[0]
        np.subtract(a[1:], a[:-1], out=g[1:])
        g[1:] -= 1
        pos += a.shape[0]
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    units = [flat[offs[i] : offs[i + 1]] for i in range(len(lens))]
    return flat, units, offs


def write_units_file(path: str, flat: np.ndarray, offs: np.ndarray) -> None:
    with open(path, "wb") as f:
        np.asarray([offs.shape[0] - 1], "<u8").tofile(f)
        offs.astype("<u8").tofile(f)
        flat.astype("<u4").tofile(f)


def time_ours(d, units, mode: int):
    t0 = time.perf_counter()
    enc = native_encoder_for(d)
    t1 = time.perf_counter()
    outs = enc.encode_units(units, mode)
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1, sum(len(b) for b in outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--modes", nargs="+",
                    default=["single", "rect", "multi"],
                    choices=["single", "rect", "multi"])
    ap.add_argument("--bench-dir", default=os.path.join(REPO, ".bench"))
    args = ap.parse_args()

    base = os.path.join(args.bench_dir, "bench_collection")
    tmp = os.path.join(args.bench_dir, "ab")
    os.makedirs(tmp, exist_ok=True)
    exe = build_ref_check(tmp)

    results = {}
    for mode in args.modes:
        chunk = BLOCK_SIZE if mode == "multi" else OPT_CHUNK
        flat, units, offs = unit_stream(base, chunk)
        ufile = os.path.join(tmp, f"units.{mode}.bin")
        if not os.path.exists(ufile):
            write_units_file(ufile, flat, offs)
        kind = {"single": "single", "rect": "rectangular", "multi": "multi"}[mode]
        d = build_or_load_dict(base + ".docs", True, kind,
                               cache_dir=args.bench_dir)
        dfile = os.path.join(
            args.bench_dir, dict_cache_name(base + ".docs", kind))
        enc_mode = 1 if mode == "multi" else 0
        ref_reps, our_reps = [], []
        our_prep = []
        ref_bytes = our_bytes = None
        for rep in range(args.reps):
            r = subprocess.run(
                [exe, f"t{mode}", dfile, ufile, "1"],
                capture_output=True, text=True, check=True)
            rec = json.loads(r.stdout.strip().splitlines()[-1])
            ref_reps.append(rec["encode_s"])
            ref_bytes = rec["bytes"]
            p, e, b = time_ours(d, units, enc_mode)
            our_reps.append(e)
            our_prep.append(p)
            our_bytes = b
            print(f"  rep {rep}: ref {rec['encode_s']:.3f}s "
                  f"ours {e:.3f}s (prep {p:.3f}s)", file=sys.stderr)
        assert ref_bytes == our_bytes, (
            f"{mode}: byte totals differ ref={ref_bytes} ours={our_bytes}")
        n = int(offs[-1])
        rec = {
            "mode": mode,
            "ints": n,
            "bytes": int(our_bytes),
            "ref_best_s": min(ref_reps),
            "ours_best_s": min(our_reps),
            "ref_mints_s": round(n / min(ref_reps) / 1e6, 2),
            "ours_mints_s": round(n / min(our_reps) / 1e6, 2),
            "speedup_vs_ref": round(min(ref_reps) / min(our_reps), 3),
            "ours_prep_best_s": min(our_prep),
            "ref_reps_s": [round(x, 4) for x in ref_reps],
            "ours_reps_s": [round(x, 4) for x in our_reps],
        }
        results[mode] = rec
        print(json.dumps(rec))
    # committed artifact (bench_artifacts/ is tracked; .bench/ is an
    # ephemeral cache) so rounds diff numbers instead of prose
    out = os.path.join(REPO, "bench_artifacts", "ab_encode.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
