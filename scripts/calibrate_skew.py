"""Calibrate the crawl-shaped synthesizer against the reference's
published table (VERDICT r4 item 7).

The reference publishes exactly one bpi table, measured on its bundled
test_collection (113,306 lists / 3,327,520 postings,
/root/reference/README.md:53,105-116): multi_packed_dint docs 4.766 /
freqs 2.455 bpi.  The synthesizer's realism knobs are the document
universe (controls mean d-gap size) and burst geometry (controls the
zero-gap share); this script sweeps them, builds the byte-identical
multi_packed_dint encoder over each variant, and records how close the
docs/freqs bpi pair lands — the calibrated point becomes the default
skew column's parameters.

Usage: python scripts/calibrate_skew.py [--quick]
Writes bench_artifacts/skew_calibration.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import dint_tpu  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = {"docs_bpi": 4.766, "freqs_bpi": 2.455}  # README.md:114
LISTS, POSTINGS = 113_306, 3_327_520  # README.md:53


def build_bpi(num_docs: int, avg_burst: float, freq_zipf: float = 1.8,
              seed: int = 19):
    from dint_tpu.io import collection, synth
    from dint_tpu.index import dint_index

    td = tempfile.mkdtemp(prefix="cal_")
    try:
        base = td + "/c"
        docs, freqs = synth.make_skewed_collection(
            LISTS, num_docs, seed=seed, target_postings=POSTINGS,
            avg_burst=avg_burst, freq_zipf=freq_zipf)
        collection.write_freq_collection(base, docs, freqs, num_docs)
        total = sum(int(d.shape[0]) for d in docs)
        zero_gaps = 0
        for d in docs:
            if d.shape[0] > 1:
                zero_gaps += int((np.diff(d.astype(np.int64)) == 1).sum())
        idx = dint_index.build_index(base, kind="multi", cache_dir=td)
        st = idx.size_stats()
        return {
            "num_docs": num_docs,
            "avg_burst": avg_burst,
            "freq_zipf": freq_zipf,
            "postings": total,
            "docs_bpi": round(st["docs_bpi"], 3),
            "freqs_bpi": round(st["freqs_bpi"], 3),
            "zero_gap_share": round(zero_gaps / max(total, 1), 3),
        }
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3-point sweep only")
    ap.add_argument("--grid", nargs="*", type=str, default=None,
                    help="explicit num_docs:avg_burst pairs")
    args = ap.parse_args()

    if args.grid:
        grid = [tuple(map(float, g.split(":"))) for g in args.grid]
        grid = [(int(a), b, c) for a, b, c in grid]
    elif args.quick:
        grid = [(400_000, 8.0, 1.8), (400_000, 32.0, 2.6),
                (1_000_000, 32.0, 2.6)]
    else:
        grid = [
            (400_000, 16.0, 2.2), (400_000, 32.0, 2.6),
            (400_000, 64.0, 2.6), (1_000_000, 32.0, 2.6),
            (1_000_000, 64.0, 3.0), (400_000, 32.0, 3.0),
        ]
    rows = []
    for nd, ab, fz in grid:
        t0 = time.perf_counter()
        r = build_bpi(nd, ab, fz)
        r["err"] = round(
            abs(r["docs_bpi"] - TARGET["docs_bpi"])
            + abs(r["freqs_bpi"] - TARGET["freqs_bpi"]), 3)
        r["build_s"] = round(time.perf_counter() - t0, 1)
        rows.append(r)
        print(json.dumps(r), flush=True)
    rows.sort(key=lambda r: r["err"])
    out = {
        "target": TARGET,
        "shape": {"lists": LISTS, "postings": POSTINGS,
                  "reference": "README.md:53,105-116 (bundled "
                  "test_collection, multi_packed_dint row)"},
        "sweep": rows,
        "best": rows[0],
    }
    path = os.path.join(REPO, "bench_artifacts", "skew_calibration.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; best: {rows[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
