"""Interleaved A/B: our query engines vs the REFERENCE's own query
algorithms, same collection, same query log, same machine (VERDICT r3
item 1 — the last unproven "matching-or-beating" axis).

The reference side is native/ref_query.cpp: it compiles the
reference's own builders, enumerators, and query functors
(include/ds2i/queries.hpp:34-573) from the read-only checkout, builds
the index in memory over the SAME ds2i collection, and times each op
with the exact protocol of src/queries.cpp:15-61 (11 runs, first
untimed, avg/q50/q90/q95 usecs).  Our side drives the host engine
(dint_tpu/tools/queries.py run_op — decode-inclusive lazy cursors) and
optionally the device batch engine over the same index type.

Fairness/safety notes:
  * reps interleave ref/ours to ride the same VM timing phase (host
    timing varies +-40% across minutes); best-of-reps per op is kept.
  * reference dictionary caches are PRE-SEEDED with our dict files
    (byte-compatible, proven by tests/test_ref_parity.py), so the ref
    build loads instead of re-training; naming matches
    dict_freq_index.hpp:139-161.
  * result parity is asserted per op: total result counts (and/or) and
    summed top-k sizes (wand/maxscore) must MATCH between sides.
  * the succinct read side of the reference build is the ref_harness
    shim (an original bit_vector); `--ref-check` runs the reference's
    own full verification over the built index first.

Usage:
  python scripts/ab_queries.py [--collection testcoll|bench]
      [--types single_packed_dint multi_packed_dint opt ...]
      [--ops and:or:wand:maxscore] [--reps 3] [--device] [--ref-check]

Writes bench_artifacts/ab_queries.json (tracked) and prints one JSON
line per (type, op).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import dint_tpu  # noqa: F401  (installs the malloc/THP fixes)
from dint_tpu.tools import common  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("DINT_REF", "/root/reference")
REF_QUERIES = os.path.join(REF, "test/test_data/queries")

# testcoll mirrors the reference's bundled test_collection shape
# (README.md:53) and uses its REAL 500-query log; bench is the heavier
# 16.7M-posting collection with generated multi-million-posting unions;
# bench_skew is the same shape with crawl-like structure (bursty docid
# locality + verbosity-correlated freqs, synth.make_skewed_collection —
# VERDICT r3 item 6: realistic selector/partition mix and block maxima
# that actually vary, so BMW/WAND pruning numbers mean something).
SHAPES = {
    "testcoll": dict(cache=".testcoll", lists=113_306, docs=10_000,
                     target_postings=3_327_520, seed=19),
    "bench": dict(cache=".bench", lists=6000, docs=4_000_000,
                  avg_len=5000.0, seed=2026),
    "bench_skew": dict(cache=".bench_skew", lists=6000, docs=4_000_000,
                       avg_len=5000.0, seed=2026, skew=True),
}


def build_ref_query(tmp: str) -> str:
    exe = os.path.join(tmp, "ref_query")
    src = os.path.join(REPO, "native", "ref_query.cpp")
    if (os.path.exists(exe)
            and os.path.getmtime(exe) > os.path.getmtime(src)):
        return exe
    subprocess.run(
        [
            # -DNDEBUG = the reference's Release config: its own
            # maxscore legally calls next_geq backward on non-essential
            # lists, which trips a debug-only assert
            # (dict_posting_list.hpp:127)
            "g++", "-O3", "-DNDEBUG", "-march=native", "-std=c++17",
            "-pthread",
            f"-I{REPO}/native/ref_harness",
            f"-I{REF}/include", f"-I{REF}/include/dint",
            f"-I{REF}/include/ds2i", f"-I{REF}",
            src, "-o", exe,
        ],
        check=True, capture_output=True,
    )
    return exe


def ensure_collection(shape_name: str) -> str:
    from dint_tpu.io import collection, synth

    cfg = SHAPES[shape_name]
    cache = os.path.join(REPO, cfg["cache"])
    os.makedirs(cache, exist_ok=True)
    base = os.path.join(
        cache,
        "test_collection" if shape_name == "testcoll" else "bench_collection",
    )
    if not os.path.exists(base + ".docs"):
        print(f"[ab] synthesizing {shape_name} collection...", file=sys.stderr)
        kw = {}
        if "target_postings" in cfg:
            kw["target_postings"] = cfg["target_postings"]
        if "avg_len" in cfg:
            kw["avg_len"] = cfg["avg_len"]
        gen = (synth.make_skewed_collection if cfg.get("skew")
               else synth.make_collection)
        docs, freqs = gen(cfg["lists"], cfg["docs"], seed=cfg["seed"], **kw)
        collection.write_freq_collection(base, docs, freqs, cfg["docs"])
        sizes = synth.doc_sizes_from_lists(docs, freqs, cfg["docs"])
        collection.write_sizes_file(base, sizes)
    if not os.path.exists(base + ".sizes"):
        docs_f = [
            (d, f) for d, f in collection.open_freq_collection(base)
        ]
        from dint_tpu.io import synth as s2

        sizes = s2.doc_sizes_from_lists(
            [d for d, _ in docs_f], [f for _, f in docs_f], cfg["docs"]
        )
        collection.write_sizes_file(base, sizes)
    return base


def ensure_queries(shape_name: str, base: str, num_lists: int) -> str:
    """testcoll uses the reference's real 500-query log; bench uses a
    seeded 500-query log of 2-5 uniform-random terms (the round-3
    protocol — uniform term draws include the multi-million-posting
    unions)."""
    if shape_name == "testcoll":
        return REF_QUERIES
    qfile = os.path.join(os.path.dirname(base), "queries_500.txt")
    if not os.path.exists(qfile):
        rng = np.random.default_rng(7)
        with open(qfile, "w") as f:
            for _ in range(500):
                n = int(rng.integers(2, 6))
                terms = rng.choice(num_lists, size=n, replace=False)
                f.write(" ".join(str(int(t)) for t in terms) + "\n")
    return qfile


def ensure_index(type_name: str, base: str, cache: str) -> str:
    from dint_tpu.tools import create_freq_index

    out = os.path.join(cache, f"ab_idx.{type_name}.bin")
    if not os.path.exists(out):
        print(f"[ab] building our {type_name} index...", file=sys.stderr)
        create_freq_index.main([type_name, base, out, "--cache-dir", cache])
    return out


def ensure_wand(base: str, cache: str) -> str:
    out = os.path.join(cache, "ab_wand")
    if not os.path.exists(out + ".npz"):
        from dint_tpu.tools import create_wand_data

        create_wand_data.main([base, out])
    return out + ".npz"


def run_reference(exe, type_name, base, qfile, ops, cache, check=False):
    """One ref_query launch (build + 11-run timing per op); returns
    {op: stats_dict}, construction seconds, and check status."""
    args = [exe, "query", type_name, os.path.basename(base), qfile, ops]
    if check:
        args.append("--check")
    r = subprocess.run(
        args, cwd=cache, capture_output=True, text=True, check=True)
    out = {}
    meta = {}
    for line in r.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            # progress chatter can prefix the JSON on the same line
            i = line.find("{")
            if i < 0:
                continue
            line = line[i:]
        rec = json.loads(line)
        if "query" in rec:
            out[rec["query"]] = rec
        elif "construction_time_s" in rec:
            meta["construction_time_s"] = rec["construction_time_s"]
            meta["model_time_s"] = rec["model_time_s"]
        elif rec.get("check") == "ok":
            meta["check"] = "ok"
    return out, meta


def load_ours(type_name, index_file, wand_file):
    from dint_tpu.index.dint_index import DintIndex
    from dint_tpu.query import ranked
    from dint_tpu.query.term_decode import TermDecoder
    from dint_tpu.tools import common

    if type_name in common.BLOCK_KINDS:
        from dint_tpu.index.block_index import BlockIndex, BlockTermDecoder

        index = BlockIndex.load(index_file)
        decoder = BlockTermDecoder(index)
    elif type_name in common.EF_KINDS:
        from dint_tpu.index.freq_index import EFTermDecoder, FreqIndexEF

        index = FreqIndexEF.load(index_file)
        decoder = EFTermDecoder(index)
    else:
        index = DintIndex.load(index_file)
        decoder = TermDecoder(index)
    wdata = ranked.WandData.load(wand_file)
    return index, decoder, wdata


def our_result_counts(index, decoder, wdata, queries_list, op, k=10):
    """Total results across the query set, mirroring the reference's
    total_results accounting (queries.hpp: and/or count matches;
    wand/maxscore count topk sizes)."""
    from dint_tpu.query import boolean, ranked

    total = 0
    # the block-skip boolean path needs a block-structured index;
    # EF-family indexes (opt/uniform/ef/single) decode-and-merge
    # instead (parity accounting only, untimed)
    blocky = hasattr(index, "list_blocks")
    # freq variants return the same result sets as their base ops
    op = {"and_freq": "and", "or_freq": "or"}.get(op, op)
    for q in queries_list:
        if op in ("and", "or"):
            if blocky:
                cache_factory = type(decoder.lazy_cache)
                cache = cache_factory(index)
                fn = (boolean.and_query_lazy if op == "and"
                      else boolean.or_query_lazy)
                total += int(fn(cache, q).shape[0])
            else:
                decoded = decoder.decode_docids(list(set(q)))
                fn = boolean.and_query if op == "and" else boolean.or_query
                total += int(fn(decoded, q).shape[0])
        elif op in ("wand", "maxscore", "ranked_and"):
            fn = {"wand": ranked.wand, "maxscore": ranked.maxscore,
                  "ranked_and": ranked.ranked_and}[op]
            total += int(fn(index, decoder, wdata, q, k).shape[0])
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--collection", choices=list(SHAPES), default="testcoll")
    ap.add_argument("--types", nargs="+",
                    default=["single_packed_dint", "multi_packed_dint",
                             "opt"])
    ap.add_argument("--ops", default="and:or:wand:maxscore")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--device", action="store_true",
                    help="also time our device batch engine (TPU)")
    ap.add_argument("--ref-check", action="store_true",
                    help="run the reference's full index verification "
                    "on the first rep")
    ap.add_argument("--no-python-host", action="store_true",
                    help="skip the Python host engine timing (it is "
                    "~100x the native engine; on the heavy bench "
                    "collection a single rep would take ~25 min)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from dint_tpu.query import boolean
    from dint_tpu.tools import queries as qtool

    base = ensure_collection(args.collection)
    cache = os.path.dirname(base)
    num_lists = sum(1 for _ in _iter_lists(base))
    qfile = ensure_queries(args.collection, base, num_lists)
    exe = build_ref_query(cache)
    wand_file = ensure_wand(base, cache)

    queries_list = boolean.parse_query_log(qfile)
    queries_list = [
        q for q in queries_list if all(0 <= t < num_lists for t in q)
    ]
    print(f"[ab] {len(queries_list)} queries on {base}", file=sys.stderr)

    ops = args.ops.split(":")
    results = {"collection": base, "queries": qfile,
               "num_queries": len(queries_list), "types": {}}
    for type_name in args.types:
        index_file = ensure_index(type_name, base, cache)
        index, decoder, wdata = load_ours(type_name, index_file, wand_file)
        rec = {"ref": {}, "ref_meta": {}}
        if not args.no_python_host:
            rec["ours_host"] = {}
        native_eng = None
        if type_name.endswith("_dint") or type_name in common.BLOCK_KINDS:
            from dint_tpu.query import native_host

            if native_host.available():
                native_eng = native_host.NativeQueryEngine(index, wdata)
                rec["ours_native"] = {}
        elif type_name in common.EF_KINDS:
            # EF-family serving: load-time u32 block view through the
            # native cursor engine (query/block_view.py) — transcode
            # time recorded as the engine's cold start
            from dint_tpu.query import block_view, native_host

            if native_host.available():
                view = block_view.from_ef_index(index, decoder)
                native_eng = native_host.NativeQueryEngine(view, wdata)
                rec["ours_native"] = {}
                rec["native_cold_start_s"] = round(view.cold_start_s, 3)
        for rep in range(args.reps):
            check = args.ref_check and rep == 0
            t0 = time.perf_counter()
            try:
                ref_stats, meta = run_reference(
                    exe, type_name, base, qfile, args.ops, cache,
                    check=check)
            except subprocess.CalledProcessError as e:
                # the reference binary can die on its own (e.g. its
                # block_varintgb decode segfaults on this workload);
                # record the crash and keep timing our side
                rec["ref_error"] = (
                    f"reference binary failed: rc={e.returncode}")
                print(f"[ab] {type_name} rep {rep}: REF CRASHED "
                      f"({e.returncode})", file=sys.stderr)
                ref_stats, meta = {}, {}
            print(f"[ab] {type_name} rep {rep}: ref launch "
                  f"{time.perf_counter()-t0:.1f}s "
                  f"(build {meta.get('construction_time_s', 0):.1f}s"
                  f"{', check ok' if meta.get('check') else ''})",
                  file=sys.stderr)
            rec["ref_meta"].update(meta)
            for op, st in ref_stats.items():
                cur = rec["ref"].get(op)
                if cur is None or st["avg"] < cur["avg"]:
                    rec["ref"][op] = {k: st[k] for k in
                                      ("avg", "q50", "q90", "q95",
                                       "total_results")}
            for op in ops:
                if native_eng is not None:
                    t_us, cnt, _ = native_eng.run(
                        op, queries_list, runs=args.runs + 1, k=10)
                    st = qtool.percentiles(t_us.ravel())
                    cur = rec["ours_native"].get(op)
                    if cur is None or st["avg"] < cur["avg"]:
                        rec["ours_native"][op] = {
                            **{k: round(v, 2) for k, v in st.items()},
                            "total_results": int(cnt.sum()),
                        }
                    print(f"[ab] {type_name} rep {rep} native {op}: "
                          f"avg {st['avg']:.1f} q50 {st['q50']:.1f}",
                          file=sys.stderr)
                if args.no_python_host:
                    continue
                st = qtool.run_op(index, decoder, wdata, queries_list,
                                  op, args.runs, 10)
                cur = rec["ours_host"].get(op)
                if cur is None or st["avg"] < cur["avg"]:
                    rec["ours_host"][op] = {
                        k: round(v, 2) for k, v in st.items()}
                print(f"[ab] {type_name} rep {rep} ours {op}: "
                      f"avg {st['avg']:.1f} q50 {st['q50']:.1f}",
                      file=sys.stderr)
        # result parity (untimed, once per type)
        parity = {}
        for op in ops:
            if op not in rec["ref"]:
                continue
            ours_total = our_result_counts(
                index, decoder, wdata, queries_list, op)
            ref_total = rec["ref"][op]["total_results"]
            parity[op] = {"ref": int(ref_total), "ours": int(ours_total),
                          "match": bool(ours_total == ref_total)}
        for op in ops:
            if op in rec["ref"] and op in rec.get("ours_native", {}):
                parity.setdefault(op, {})["native"] = int(
                    rec["ours_native"][op]["total_results"])
                parity[op]["native_match"] = bool(
                    parity[op]["native"] == int(
                        rec["ref"][op]["total_results"]))
        rec["result_parity"] = parity
        for op in ops:
            if op in rec["ref"] and op in rec.get("ours_host", {}):
                r, o = rec["ref"][op], rec["ours_host"][op]
                rec.setdefault("speedup_host_avg", {})[op] = round(
                    r["avg"] / max(o["avg"], 1e-9), 3)
                rec.setdefault("speedup_host_q50", {})[op] = round(
                    r["q50"] / max(o["q50"], 1e-9), 3)
            if op in rec["ref"] and op in rec.get("ours_native", {}):
                r, o = rec["ref"][op], rec["ours_native"][op]
                rec.setdefault("speedup_native_avg", {})[op] = round(
                    r["avg"] / max(o["avg"], 1e-9), 3)
                rec.setdefault("speedup_native_q50", {})[op] = round(
                    r["q50"] / max(o["q50"], 1e-9), 3)
        if args.device:
            rec["ours_device"] = {}
            for op in ops:
                if op in ("and", "or", "wand", "maxscore"):
                    try:
                        st, shape, extra = qtool.run_op_device(
                            index, decoder, wdata, queries_list, op,
                            args.runs, 10)
                        rec["ours_device"][op] = {
                            **{k: round(v, 2) for k, v in st.items()},
                            **extra}
                    except Exception as e:  # noqa: BLE001
                        rec["ours_device"][op] = {"error": repr(e)}
        results["types"][type_name] = rec
        print(json.dumps({type_name: rec}, indent=1))

    out = args.out or os.path.join(
        REPO, "bench_artifacts",
        "ab_queries.json" if args.collection == "testcoll"
        else f"ab_queries_{args.collection}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


def _iter_lists(base):
    from dint_tpu.io import collection

    return collection.open_freq_collection(base)


if __name__ == "__main__":
    main()
