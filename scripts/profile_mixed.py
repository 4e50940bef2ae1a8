"""Profile -> train -> rebuild mixed-block pipeline, one command.

The reference's loop (SURVEY §5 tracing): run queries over a profiled
index (block_profiler.hpp:27-54 hooks in block_posting_list decode),
train per-codec linear decode-time models (dec_time_regression.py),
then re-encode block-by-block with mixed_block's access-weighted
space-time objective (mixed_block.hpp:119-150).  This script runs all
three stages end-to-end:

    python scripts/profile_mixed.py <collection_basename> \
        --queries Q.txt [--lam 200] [--out-dir DIR]

and reports the measured space-time trade vs the lam=0 (space-only)
mixed index.  Both indexes pass the exact --check verification.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("basename")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--lam", type=float, default=200.0,
                    help="space-time tradeoff: bytes per (ns x access)")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--train-samples", type=int, default=120)
    args = ap.parse_args()

    from dint_tpu.index import block_index, mixed_block
    from dint_tpu.query import boolean
    from dint_tpu.utils import block_profiler
    from dint_tpu.utils import dec_time_prediction as dtp

    # ---- stage 1: profile a block index over the query log ----
    t0 = time.perf_counter()
    idx = block_index.build_block_index(args.basename, "optpfor")
    queries = boolean.parse_query_log(args.queries)
    queries = [q for q in queries if all(0 <= t < idx.num_lists for t in q)]
    block_profiler.reset()
    block_profiler.enable(True)
    dec = block_index.BlockTermDecoder(idx)
    for q in queries:
        terms = boolean.dedup_terms(q)
        decoded = dec.decode_docids(terms)
        res = boolean.and_query(decoded, terms)
        if res.shape[0]:
            dec.decode_freqs(terms)  # *_freq access pattern
        # per-query decode hooks fire inside block decodes; clear the
        # term cache so repeated terms re-count like the reference's
        # per-query enumerator decodes
        dec._doc_cache.clear()
        dec._freq_cache.clear()
    block_profiler.enable(False)
    prof_path = os.path.join(args.out_dir, "block_profile.tsv")
    block_profiler.dump(prof_path)
    counts = block_profiler.load(prof_path)
    touched = sum(int(c.sum()) for c in counts.values())
    print(f"[profile] {len(queries)} queries, {touched} block accesses, "
          f"{time.perf_counter()-t0:.1f}s -> {prof_path}")

    # ---- stage 2: train the decode-time predictor ----
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    from dint_tpu.io.collection import open_freq_collection
    from dint_tpu.utils import gaps as gap_mod

    view = open_freq_collection(args.basename)
    blocks = []
    for docs, freqs in view:
        g = gap_mod.docs_to_gaps(docs)
        for p in range(0, max(len(g) - 255, 0), 256):
            blocks.append(g[p:p + 256])
    if len(blocks) > args.train_samples:
        sel = rng.choice(len(blocks), args.train_samples, replace=False)
        blocks = [blocks[i] for i in sel]
    samples = {}
    for codec in mixed_block.CANDIDATES:
        try:
            samples[codec] = dtp.measure_block_decode(codec, blocks, reps=3)
        except Exception as e:  # codec can reject some blocks
            print(f"[train] {codec}: skipped ({e})")
    pred = dtp.train(samples)
    pred_path = os.path.join(args.out_dir, "decode_predictor.json")
    pred.save(pred_path)
    print(f"[train] {len(samples)} codecs on {len(blocks)} blocks, "
          f"{time.perf_counter()-t0:.1f}s -> {pred_path}")

    # ---- stage 3: rebuild mixed with and without the profile ----
    results = {}
    for name, (p, a, lam) in {
        "lam0": (None, None, 0.0),
        "profiled": (pred, counts, args.lam),
    }.items():
        t0 = time.perf_counter()
        midx = mixed_block.build_mixed_index(
            args.basename, predictor=p, access_counts=a, lam=lam
        )
        block_index.verify_block_index(midx, args.basename)  # exact check
        st = midx.size_stats()
        # access-weighted predicted decode cost of the chosen encodings.
        # Features must match the training convention exactly: the gap
        # array the codec actually encoded (gap0 = d[0] - base, rest
        # diff-1; freqs stored as freq-1) and the encoded body length.
        midx.ensure_docs_end()
        cost_ns = 0.0
        for t, c in counts.items():
            p0, p1 = midx.list_blocks(t)
            for rb in range(min(p1 - p0, c.shape[1])):
                b = p0 + rb
                acc_d, acc_f = int(c[0, rb]), int(c[1, rb])
                if acc_d:
                    d = midx.block_docs(b, t).astype(np.int64)
                    base = int(midx.block_max[b - 1]) + 1 if b > p0 else 0
                    g = np.empty(d.shape[0], np.int64)
                    g[0] = d[0] - base
                    g[1:] = np.diff(d) - 1
                    start = midx.block_start(b)
                    codec = mixed_block.CANDIDATES[int(midx.arena[start])]
                    body = bytes(midx.arena[start + 1 : int(midx.docs_end[b])])
                    pb, pe = dtp.pfor_features(codec, body, g.shape[0])
                    feats = dtp.feature_vector(
                        g.astype(np.uint32), len(body), pb, pe
                    )
                    cost_ns += acc_d * max(pred.predict(codec, feats), 0.0)
                if acc_f:
                    f = midx.block_freqs(b, t).astype(np.int64) - 1
                    fstart = int(midx.docs_end[b])
                    codec = mixed_block.CANDIDATES[int(midx.arena[fstart])]
                    body = bytes(midx.arena[fstart + 1 : int(midx.block_end[b])])
                    pb, pe = dtp.pfor_features(codec, body, f.shape[0])
                    feats = dtp.feature_vector(
                        f.astype(np.uint32), len(body), pb, pe
                    )
                    cost_ns += acc_f * max(pred.predict(codec, feats), 0.0)
        results[name] = (st, cost_ns)
        print(f"[mixed:{name}] docs_bpi {st['docs_bpi']:.3f} "
              f"freqs_bpi {st['freqs_bpi']:.3f} "
              f"predicted access-weighted decode {cost_ns/1e6:.2f} ms "
              f"(build+check {time.perf_counter()-t0:.1f}s)")

    s0, c0 = results["lam0"]
    s1, c1 = results["profiled"]
    print(
        "[result] profiled vs lam0: "
        f"space {100*(s1['docs_bpi']+s1['freqs_bpi'])/(s0['docs_bpi']+s0['freqs_bpi'])-100:+.2f}% "
        f"predicted-decode {100*c1/max(c0,1e-9)-100:+.2f}%"
    )


if __name__ == "__main__":
    main()
