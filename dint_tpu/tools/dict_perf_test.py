"""Dictionary-copy microbenchmark (src/dict_perf_test.cpp equivalent).

Times random dictionary `copy` operations — on TPU a batched gather of
entry rows — and reports ns/copy over N random indices (:32-63 does 10M
random copies on a rectangular dictionary).

    python -m dint_tpu.tools.dict_perf_test <dict_file> <kind> [--copies N]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..config import MAX_ENTRY_SIZE, NUM_ENTRIES, RESERVED
from ..dictionary.dictionary import (
    MultiPackedDictionary,
    PackedDictionary,
    RectangularDictionary,
)
from . import common


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dict_file")
    ap.add_argument("kind", choices=["rectangular", "single", "multi"])
    ap.add_argument("--copies", type=int, default=10_000_000)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(13)
    if args.kind == "rectangular":
        d = RectangularDictionary.load(args.dict_file)
        view = d.decode_view()
        idx = rng.integers(
            RESERVED, max(d.m_size, RESERVED + 1), args.copies
        ).astype(np.int64)
        def resolve():
            return view.offsets[0][idx].astype(np.int64)
    elif args.kind == "multi":
        # sample (context, entry) across ALL selector classes with
        # per-class valid counts — the decode access pattern (context 0
        # alone holds only the handful of longest-run codewords)
        d = MultiPackedDictionary.load(args.dict_file)
        view = d.decode_view()
        counts = np.array(
            [min(d.context_count(c), NUM_ENTRIES)
             for c in range(view.offsets.shape[0])], np.int64)
        ctx = rng.integers(0, len(counts), args.copies)
        ent = RESERVED + (
            rng.integers(0, 1 << 30, args.copies)
            % np.maximum(counts[ctx] - RESERVED, 1))
        def resolve():
            return view.offsets[ctx, ent].astype(np.int64)
    else:
        d = PackedDictionary.load(args.dict_file)
        view = d.decode_view()
        idx = rng.integers(
            RESERVED, max(d.size, RESERVED + 1), args.copies
        ).astype(np.int64)
        def resolve():
            return view.offsets[0][idx].astype(np.int64)

    # batched copy: resolve offsets, then gather 16-wide rows (the TPU
    # analogue of the reference's random-access memcpy loop,
    # rectangular_dictionary.hpp:206-213 — offset resolution stays
    # inside the timed region like the reference's `offset(i)` call).
    # Chunked into a reused output buffer: the reference copies into
    # one fixed 16-word target, so a fresh multi-hundred-MB output
    # array would time this VM's page-fault pathology, not the copies.
    chunk = 1_000_000
    buf = np.empty((chunk, MAX_ENTRY_SIZE), np.uint32)
    gidx = np.empty((chunk, MAX_ENTRY_SIZE), np.int64)
    ar = np.arange(MAX_ENTRY_SIZE, dtype=np.int64)[None, :]
    checksum = 0
    t0 = time.perf_counter()
    flat = resolve()
    for s in range(0, args.copies, chunk):
        f = flat[s : s + chunk]
        m = f.shape[0]
        np.add(f[:, None], ar, out=gidx[:m])
        np.take(view.table, gidx[:m], out=buf[:m])
        checksum += int(buf[:m, 0].astype(np.int64).sum())
    t1 = time.perf_counter()
    ns = (t1 - t0) * 1e9 / args.copies
    common.stats_line(
        {
            "type": f"dict_copy_{args.kind}",
            "copies": str(args.copies),
            "ns_per_copy": f"{ns:.3f}",
            "checksum": str(checksum),
        }
    )


if __name__ == "__main__":
    main()
