"""Interleaved A/B vs the reference's two host microbench tools
(VERDICT r3 item 4 — the last two §2.3 partials):

  * dict_perf_test (src/dict_perf_test.cpp:32-63): ns per random
    rectangular-dictionary copy, 10M copies x 10 runs.  Reference side
    is ref_query `tcopy` (the reference's own dictionary builder +
    copy loop, loading OUR byte-compatible dict file); our side is the
    serving-path native copy loop (query/native_host.py dict_copy_ns)
    plus the numpy batch formulation for the record.
  * pair_wise_intersect (src/pair_wise_intersect.cpp:28-120): usecs per
    materialized 2-term intersection, 10+1 runs.  Reference side is
    ref_query `intersect` (its own enumerators over an in-memory
    index); ours is the native engine's `and_collect` op over the same
    pairs on the same collection.

Both sides interleave per rep (host timing varies +-40% across minutes
on this VM) and keep the best rep; intersect asserts result parity.

Usage:
  python scripts/ab_perf.py [--collection testcoll|bench] [--reps 5]
      [--copies 10000000] [--pairs 200]

Writes bench_artifacts/ab_perf.json (tracked).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"))

import numpy as np  # noqa: E402

import dint_tpu  # noqa: F401  (installs the malloc/THP fixes)
from ab_queries import (  # noqa: E402
    REPO, SHAPES, build_ref_query, ensure_collection, ensure_index,
    ensure_queries,
)


def _iter_lists(base):
    from dint_tpu.io import collection

    return collection.open_freq_collection(base)


def ensure_rect_dict(base: str, cache: str) -> str:
    dict_file = os.path.join(
        cache,
        f"dict.{os.path.basename(base)}.docs.rectangular.DSF-65536-16",
    )
    if not os.path.exists(dict_file):
        print("[ab] training rectangular dict...", file=sys.stderr)
        from dint_tpu.tools import encode

        out = os.path.join(cache, "ab_rect_tmp.bin")
        encode.encode_collection(
            "single_rect_dint", base + ".docs", out, cache_dir=cache
        )
        os.unlink(out)
    assert os.path.exists(dict_file), dict_file
    return dict_file


def run_ref_tcopy(exe, dict_file, n, runs):
    r = subprocess.run(
        [exe, "tcopy", dict_file, str(n), str(runs)],
        capture_output=True, text=True, check=True,
    )
    for line in r.stdout.splitlines():
        i = line.find("{")
        if i >= 0:
            rec = json.loads(line[i:])
            if rec.get("query") == "dict_copy":
                return rec
    raise RuntimeError(f"no tcopy stats line in: {r.stdout!r}")


def run_our_tcopy(dict_file, n, runs):
    from dint_tpu.config import RESERVED
    from dint_tpu.dictionary.dictionary import RectangularDictionary
    from dint_tpu.query import native_host

    d = RectangularDictionary.load(dict_file)
    view = d.decode_view()
    rng = np.random.default_rng(13)
    idx = rng.integers(
        RESERVED, max(d.m_size, RESERVED + 1), n
    ).astype(np.uint32)
    return native_host.dict_copy_ns(view, idx, runs=runs), d.m_size


def run_our_tcopy_numpy(dict_file, n):
    from dint_tpu.tools import dict_perf_test

    # reuse the tool's own numpy engine through its CLI entry
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        dict_perf_test.main(
            [dict_file, "rectangular", "--copies", str(n),
             "--engine", "numpy"]
        )
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])
    return float(rec["ns_per_copy"])


def ensure_pairs(base: str, qfile: str, num_lists: int, want: int) -> str:
    """2-term pairs file: first two distinct valid terms of each query
    in the log, deduplicated, topped up with seeded random pairs."""
    out = os.path.join(os.path.dirname(base), "ab_pairs.txt")
    pairs = []
    seen = set()
    with open(qfile) as f:
        for line in f:
            ts = [int(t) for t in line.split() if 0 <= int(t) < num_lists]
            distinct = sorted(set(ts))
            if len(distinct) >= 2:
                key = (distinct[0], distinct[1])
                if key not in seen:
                    seen.add(key)
                    pairs.append(key)
    rng = np.random.default_rng(23)
    while len(pairs) < want:
        a, b = rng.choice(num_lists, size=2, replace=False)
        key = (int(min(a, b)), int(max(a, b)))
        if key not in seen:
            seen.add(key)
            pairs.append(key)
    pairs = pairs[:want]
    with open(out, "w") as f:
        for a, b in pairs:
            f.write(f"{a} {b}\n")
    return out


def run_ref_intersect(exe, type_name, base, pairs_file, cache):
    r = subprocess.run(
        [exe, "intersect", type_name, os.path.basename(base), pairs_file],
        cwd=cache, capture_output=True, text=True, check=True,
    )
    for line in r.stdout.splitlines():
        i = line.find("{")
        if i >= 0:
            rec = json.loads(line[i:])
            if rec.get("query") == "pair_intersect":
                return rec
    raise RuntimeError(f"no intersect stats line in: {r.stdout!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--collection", choices=list(SHAPES),
                    default="testcoll")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10_000_000)
    ap.add_argument("--copy-runs", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--type", default="single_packed_dint")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base = ensure_collection(args.collection)
    cache = os.path.dirname(base)
    exe = build_ref_query(cache)
    num_lists = sum(1 for _ in _iter_lists(base))
    qfile = ensure_queries(args.collection, base, num_lists)
    dict_file = ensure_rect_dict(base, cache)
    index_file = ensure_index(args.type, base, cache)
    pairs_file = ensure_pairs(base, qfile, num_lists, args.pairs)

    from dint_tpu.index.dint_index import DintIndex
    from dint_tpu.query import boolean
    from dint_tpu.query.native_host import NativeQueryEngine

    index = DintIndex.load(index_file)
    eng = NativeQueryEngine(index)
    pairs_list = boolean.parse_query_log(pairs_file)

    rec = {
        "collection": base,
        "dict": dict_file,
        "pairs_file": pairs_file,
        "copies": args.copies,
        "tcopy": {"ref": None, "ours_native": None, "ours_numpy": None},
        "intersect": {"ref": None, "ours_native": None},
    }

    for rep in range(args.reps):
        t0 = time.perf_counter()
        ref = run_ref_tcopy(exe, dict_file, args.copies, args.copy_runs)
        ours_ns, dsize = run_our_tcopy(
            dict_file, args.copies, args.copy_runs)
        cur = rec["tcopy"]
        if cur["ref"] is None or ref["ns_per_copy"] < cur["ref"]:
            cur["ref"] = round(float(ref["ns_per_copy"]), 3)
            cur["ref_dict_entries"] = int(ref["dict_entries"])
        if cur["ours_native"] is None or ours_ns < cur["ours_native"]:
            cur["ours_native"] = round(ours_ns, 3)
            cur["dict_entries"] = int(dsize)
        print(f"[ab] tcopy rep {rep}: ref {ref['ns_per_copy']:.2f} "
              f"ours {ours_ns:.2f} ns/copy "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)

        t0 = time.perf_counter()
        refi = run_ref_intersect(exe, args.type, base, pairs_file, cache)
        t_us, counts, _ = eng.run("and_collect", pairs_list, runs=11)
        ours_us = float(t_us.mean())
        cur = rec["intersect"]
        if cur["ref"] is None or refi["usec_per_intersection"] < cur["ref"]:
            cur["ref"] = round(float(refi["usec_per_intersection"]), 3)
            cur["ref_total_results"] = int(refi["total_results"])
        if cur["ours_native"] is None or ours_us < cur["ours_native"]:
            cur["ours_native"] = round(ours_us, 3)
            cur["total_results"] = int(counts.sum())
        print(f"[ab] intersect rep {rep}: ref "
              f"{refi['usec_per_intersection']:.2f} ours {ours_us:.2f} "
              f"us/intersection ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr)

    # numpy tcopy once, for the record (not the serving path)
    rec["tcopy"]["ours_numpy"] = round(
        run_our_tcopy_numpy(dict_file, min(args.copies, 2_000_000)), 3)

    assert rec["intersect"]["total_results"] == \
        rec["intersect"]["ref_total_results"], rec["intersect"]
    rec["intersect"]["parity"] = "ok"
    rec["intersect"]["num_pairs"] = len(pairs_list)
    rec["tcopy"]["speedup_native"] = round(
        rec["tcopy"]["ref"] / rec["tcopy"]["ours_native"], 3)
    rec["intersect"]["speedup_native"] = round(
        rec["intersect"]["ref"] / rec["intersect"]["ours_native"], 3)

    out = args.out or os.path.join(REPO, "bench_artifacts", "ab_perf.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # keep other collections' records in the same artifact
    all_rec = {}
    if os.path.exists(out):
        with open(out) as f:
            all_rec = json.load(f)
    all_rec[args.collection] = rec
    with open(out, "w") as f:
        json.dump(all_rec, f, indent=1)
    print(json.dumps({args.collection: rec}))


if __name__ == "__main__":
    main()
