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

    if args.kind == "rectangular":
        d = RectangularDictionary.load(args.dict_file)
        size = d.m_size
    elif args.kind == "multi":
        d = MultiPackedDictionary.load(args.dict_file)
        size = min(d.context_count(0), NUM_ENTRIES)
    else:
        d = PackedDictionary.load(args.dict_file)
        size = d.size
    view = d.decode_view()
    rng = np.random.default_rng(13)
    idx = rng.integers(RESERVED, max(size, RESERVED + 1), args.copies).astype(np.int64)

    # batched copy: gather offsets/lengths then 16-wide rows (the TPU
    # analogue of the memcpy loop, rectangular_dictionary.hpp:206-213)
    t0 = time.perf_counter()
    offs = view.offsets[0][idx].astype(np.int64)
    rows = view.table[offs[:, None] + np.arange(MAX_ENTRY_SIZE)[None, :]]
    checksum = int(rows[:, 0].astype(np.int64).sum())
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
