"""Per-query maxscore diff vs the reference binary (VERDICT r4 item 1).

Runs the reference's own maxscore (native/ref_query.cpp, per-query
best-of-runs via REF_PERQUERY_DIR) and our native engine over the same
collection + query log, then ranks queries by absolute time lost and
prints their shapes (term list lengths) plus QH_PROF work counters for
the worst ones — the evidence base for fixing the tail.

Usage:
  python scripts/ab_maxscore_diff.py [--collection bench|bench_skew]
      [--type single_packed_dint] [--top 20] [--op maxscore]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import dint_tpu  # noqa: F401

from ab_queries import (  # noqa: E402
    SHAPES, build_ref_query, ensure_collection, ensure_index,
    ensure_queries, ensure_wand, load_ours,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--collection", choices=list(SHAPES), default="bench")
    ap.add_argument("--type", default="single_packed_dint")
    ap.add_argument("--op", default="maxscore")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args()

    from dint_tpu.query import native_host

    base = ensure_collection(args.collection)
    cache = os.path.dirname(base)
    from dint_tpu.io import collection as coll_io

    lists = [d for d, _ in coll_io.open_freq_collection(base)]
    num_lists = len(lists)
    qfile = ensure_queries(args.collection, base, num_lists)
    exe = build_ref_query(cache)
    wand_file = ensure_wand(base, cache)
    index_file = ensure_index(args.type, base, cache)
    index, decoder, wdata = load_ours(args.type, index_file, wand_file)
    eng = native_host.NativeQueryEngine(index, wdata)

    queries = []
    with open(qfile) as f:
        for line in f:
            q = [int(t) for t in line.split()]
            if q and all(0 <= t < num_lists for t in q):
                queries.append(q)

    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ, REF_PERQUERY_DIR=td)
        print(f"[diff] ref {args.op} on {args.collection}...",
              file=sys.stderr)
        subprocess.run(
            [exe, "query", args.type, os.path.basename(base), qfile,
             args.op],
            cwd=cache, env=env, check=True, capture_output=True)
        ref_us = np.loadtxt(os.path.join(td, f"{args.op}.txt"))
    assert ref_us.shape[0] == len(queries), (ref_us.shape, len(queries))

    print(f"[diff] ours {args.op}...", file=sys.stderr)
    t_us, cnt, _ = eng.run(args.op, queries, runs=args.runs, k=10)
    ours_us = t_us.min(axis=0)

    order = np.argsort(ours_us - ref_us)[::-1]
    print(f"total: ours {ours_us.sum()/1e3:.2f} ms  "
          f"ref {ref_us.sum()/1e3:.2f} ms  "
          f"(ours mean {ours_us.mean():.1f} us, ref {ref_us.mean():.1f})")
    hdr = (f"{'qi':>4} {'ours_us':>9} {'ref_us':>9} {'loss_us':>9} "
           f"{'terms(list_len)':<40}")
    print(hdr)
    worst = order[: args.top]
    for qi in worst:
        q = queries[qi]
        shape = " ".join(f"{t}({lists[t].shape[0]})" for t in q)
        print(f"{qi:>4} {ours_us[qi]:>9.1f} {ref_us[qi]:>9.1f} "
              f"{ours_us[qi]-ref_us[qi]:>9.1f} {shape:<40}")

    # per-query work counters on the worst queries (one at a time)
    import ctypes

    lib = eng._lib
    lib.qh_prof_enable.argtypes = [ctypes.c_int]
    lib.qh_prof_read.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    print(f"\n{'qi':>4} {'ess_docs':>10} {'ess_scans':>11} "
          f"{'ne_probes':>10} {'docs_blk':>9} {'frq_blk':>8} "
          f"{'geq':>10} {'docs_us':>8} {'frq_us':>7}")
    for qi in worst[:10]:
        lib.qh_prof_enable(1)
        eng.run(args.op, [queries[qi]], runs=2, k=10)
        buf = (ctypes.c_uint64 * 9)()
        lib.qh_prof_read(buf)
        p = list(buf)
        lib.qh_prof_enable(0)
        print(f"{qi:>4} {p[2]:>10} {p[3]:>11} {p[4]:>10} {p[0]:>9} "
              f"{p[1]:>8} {p[5]:>10} {p[7]:>8} {p[8]:>7}")


if __name__ == "__main__":
    main()
