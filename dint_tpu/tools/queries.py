"""Query timing CLI (src/queries.cpp equivalent).

    python -m dint_tpu.tools.queries <index_type>
        <query_type(colon-separated)> <index_file> [wand_data_file]
        --queries FILE [--runs R] [--k K]

Supported ops: and, and_freq, or, or_freq, wand, ranked_and, maxscore
(src/queries.cpp:95-115).  Reports avg/q50/q90/q95 microseconds per
query over R timed runs after one untimed warmup, one JSON line per op
(src/queries.cpp:25-61).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..index.dint_index import DintIndex
from ..query import boolean, ranked
from ..query.term_decode import TermDecoder
from . import common


def percentiles(us):
    arr = np.sort(np.asarray(us))
    q = lambda p: float(arr[min(len(arr) - 1, int(p * len(arr)))])
    return {
        "avg": float(arr.mean()),
        "q50": q(0.5),
        "q90": q(0.9),
        "q95": q(0.95),
    }


def run_op(index, decoder, wdata, queries_list, op, runs, k):
    # warm the term cache (reference warms posting lists, queries.cpp:74-83)
    all_terms = sorted({int(t) for q in queries_list for t in q})
    decoder.decode_docids(all_terms)
    if op not in ("and", "or"):
        decoder.decode_freqs(all_terms)

    def one_pass():
        t_us = []
        for q in queries_list:
            t0 = time.perf_counter()
            if op in ("and", "and_freq"):
                boolean.and_query(decoder._doc_cache, boolean.dedup_terms(q))
            elif op in ("or", "or_freq"):
                boolean.or_query(decoder._doc_cache, boolean.dedup_terms(q))
            elif op == "wand":
                ranked.wand(index, decoder, wdata, q, k)
            elif op == "maxscore":
                ranked.maxscore(index, decoder, wdata, q, k)
            elif op == "ranked_and":
                ranked.ranked_and(index, decoder, wdata, q, k)
            elif op == "ranked_or":
                ranked.ranked_or(index, decoder, wdata, q, k)
            else:
                raise ValueError(f"unsupported query type {op}")
            t_us.append((time.perf_counter() - t0) * 1e6)
        return t_us

    one_pass()  # untimed warmup run (queries.cpp:29-32 discards first)
    t_us = []
    for _ in range(runs):
        t_us = one_pass()
    return percentiles(t_us)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "index_type",
        choices=sorted(common.DINT_KINDS)
        + list(common.EF_KINDS)
        + list(common.BLOCK_KINDS),
    )
    ap.add_argument("query_types")  # colon-separated
    ap.add_argument("index_file")
    ap.add_argument("wand_data_file", nargs="?")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)

    if args.index_type in common.BLOCK_KINDS:
        from ..index.block_index import BlockIndex, BlockTermDecoder

        index = BlockIndex.load(args.index_file)
        decoder = BlockTermDecoder(index)
    elif args.index_type in common.EF_KINDS:
        from ..index.freq_index import EFTermDecoder, FreqIndexEF

        index = FreqIndexEF.load(args.index_file)
        decoder = EFTermDecoder(index)
    else:
        index = DintIndex.load(args.index_file)
        decoder = TermDecoder(index)
    wdata = (
        ranked.WandData.load(args.wand_data_file)
        if args.wand_data_file
        else None
    )
    queries_list = boolean.parse_query_log(args.queries)
    # drop queries naming unknown terms (reference relies on valid logs)
    queries_list = [
        q for q in queries_list if all(0 <= t < index.num_lists for t in q)
    ]
    common.log(f"running {len(queries_list)} queries")
    for op in args.query_types.split(":"):
        stats = run_op(index, decoder, wdata, queries_list, op, args.runs, args.k)
        common.stats_line(
            {
                "type": op,
                "index": args.index_type,
                "queries": str(len(queries_list)),
                "runs": str(args.runs),
                **{k: f"{v:.2f}" for k, v in stats.items()},
            }
        )


if __name__ == "__main__":
    main()
