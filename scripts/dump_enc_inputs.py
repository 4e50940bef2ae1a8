"""Dump native-encoder profiling inputs to /tmp/enc_*.npy.

Feeds native/bench_encoder.cpp (the phase-timing harness).  Recreates
the exact unit stream the library hands the native encoder for the
bench collection: docs lists -> d-gaps (*it - prev - 1), chopped at
OPT_CHUNK for single mode or BLOCK_SIZE for multi mode.

Usage: python scripts/dump_enc_inputs.py [--multi]
Requires .bench/ artifacts (run bench.py once to create them).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dint_tpu  # noqa: F401  (installs the malloc/THP fixes)
from dint_tpu.codecs.encode_batch import BLOCK_SIZE, OPT_CHUNK
from dint_tpu.config import NUM_ENTRIES
from dint_tpu.dictionary.dictionary import RectangularDictionary
from dint_tpu.io import collection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--multi", action="store_true", help="256-int units (multi mode)")
    ap.add_argument("--bench-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench"))
    args = ap.parse_args()

    base = os.path.join(args.bench_dir, "bench_collection")
    dict_file = os.path.join(
        args.bench_dir, "dict.bench_collection.docs.rectangular.DSF-65536-16")
    d = RectangularDictionary.load(dict_file)
    view = d.decode_view()
    counts = [d.context_count(c) for c in range(view.offsets.shape[0])] \
        if hasattr(d, "context_count") else [getattr(d, "m_size", getattr(d, "size", 0))]

    chunk = BLOCK_SIZE if args.multi else OPT_CHUNK
    gaps_parts = []
    offs = [0]
    total = 0
    for docs, _ in collection.open_freq_collection(base):
        a = np.asarray(docs, dtype=np.uint32)
        if a.shape[0] == 0:
            continue
        g = np.empty_like(a)
        g[0] = a[0]
        np.subtract(a[1:], a[:-1], out=g[1:])
        g[1:] -= 1
        for i in range(0, max(1, g.shape[0]), chunk):
            u = g[i: i + chunk]
            gaps_parts.append(u)
            total += u.shape[0]
            offs.append(total)
    flat = np.concatenate(gaps_parts)

    np.save("/tmp/enc_table.npy", np.ascontiguousarray(view.table, dtype=np.uint32))
    np.save("/tmp/enc_offsets.npy", np.ascontiguousarray(view.offsets, dtype=np.uint32))
    np.save("/tmp/enc_lengths.npy", np.ascontiguousarray(view.lengths, dtype=np.int32))
    np.save("/tmp/enc_counts.npy", np.ascontiguousarray(
        np.minimum(np.asarray(counts, dtype=np.int32), NUM_ENTRIES)))
    np.save("/tmp/enc_gaps.npy", flat)
    np.save("/tmp/enc_offs.npy", np.asarray(offs, dtype=np.int64))
    print(f"dumped {len(offs)-1} units, {total} ints (chunk={chunk})", file=sys.stderr)


if __name__ == "__main__":
    main()
