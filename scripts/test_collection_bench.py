"""BASELINE configs 1 and 3: the bundled-test_collection-shaped runs.

The reference snapshot is missing test_collection.docs/.freqs
(/root/reference/.MISSING_LARGE_BLOBS) but documents its shape (113,306
lists / 3,327,520 postings, README.md:53) and ships num_docs=10,000
(.sizes) plus the real 500-query log.  This script synthesizes a
collection of exactly that shape (seeded), then runs:

  config 1: single_packed_dint index build (--check semantics) +
            the 500 real AND queries, p50/p90 latency
  config 3: multi_packed_dint build + OR queries + full verification

and prints one stats line per stage (bpi are on the synthetic
collection — comparable in spirit, not byte-identical, to
BASELINE.md's numbers on the lost original).

Usage: python scripts/test_collection_bench.py  (CPU is fine; set
JAX_PLATFORMS= for the TPU decode path)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".testcoll")
REF_QUERIES = "/root/reference/test/test_data/queries"

NUM_LISTS = 113_306
NUM_DOCS = 10_000
TARGET_POSTINGS = 3_327_520


def build_collection():
    from dint_tpu.io import collection, synth

    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, "test_collection")
    if not os.path.exists(base + ".docs"):
        docs, freqs = synth.make_collection(
            NUM_LISTS, NUM_DOCS, seed=19, target_postings=TARGET_POSTINGS
        )
        collection.write_freq_collection(base, docs, freqs, NUM_DOCS)
        sizes = synth.doc_sizes_from_lists(docs, freqs, NUM_DOCS)
        collection.write_sizes_file(base, sizes)
        total = sum(len(d) for d in docs)
        print(f"[tc] synthesized {NUM_LISTS} lists, {total} postings")
    return base


def build_index(type_name, base, out):
    from dint_tpu.tools import create_freq_index

    if not os.path.exists(out):
        t0 = time.perf_counter()
        create_freq_index.main(
            [type_name, base, out, "--cache-dir", CACHE]
        )
        print(f"[tc] {type_name} build: {time.perf_counter()-t0:.1f}s")
    return out


def run_queries(type_name, index_file, ops, engine="host", wand_file=None):
    from dint_tpu.tools import queries as qtool

    argv = [type_name, ops, index_file]
    if wand_file:
        argv.append(wand_file)
    argv += ["--queries", REF_QUERIES, "--runs", "3", "--engine", engine]
    qtool.main(argv)


def build_wand(base):
    out = os.path.join(CACHE, "wand.npz")
    if not os.path.exists(out):
        from dint_tpu.tools import create_wand_data

        create_wand_data.main([base, out[: -len(".npz")]])
    return out


def verify(type_name, index_file, base):
    from dint_tpu.tools import check_index

    check_index.main([type_name, index_file, base])
    print(f"[tc] {type_name} verification ok")


def main():
    base = build_collection()
    wand_file = build_wand(base)
    # config 1: single_packed_dint + AND over the real 500-query log
    idx1 = build_index(
        "single_packed_dint", base, os.path.join(CACHE, "idx.spd.bin")
    )
    run_queries("single_packed_dint", idx1, "and")
    run_queries("single_packed_dint", idx1, "and:or", engine="device")
    run_queries(
        "single_packed_dint", idx1, "wand:maxscore", wand_file=wand_file
    )
    run_queries(
        "single_packed_dint", idx1, "wand", engine="device",
        wand_file=wand_file,
    )
    verify("single_packed_dint", idx1, base)
    # config 3: multi_packed_dint + OR + verification
    idx3 = build_index(
        "multi_packed_dint", base, os.path.join(CACHE, "idx.mpd.bin")
    )
    run_queries("multi_packed_dint", idx3, "or")
    verify("multi_packed_dint", idx3, base)


if __name__ == "__main__":
    main()
