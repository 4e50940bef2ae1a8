"""Cacheable block statistics with DSF filtering.

Reference: block_statistics.hpp.  Streams a collection, d-gaps docs
(freqs become freq-1), collects sub-block counts, filters blocks by the
DSF saving estimate (keeping singletons unconditionally), sorts by
(freq desc, length desc) and persists to disk with create-or-load
semantics (:26-43, :142-165).

On-disk format matches the reference byte-for-byte
(:111-140, :286-324): u64 total_integers, then per selector context a
u32 num_blocks followed by (u32 size, u32 freq, size × u32 data)
records.  The single variant has one context, the multi variant
NUM_SELECTORS contexts, and the cache filename patterns are
``<file>.block_statistics-16-adjusted`` and
``<file>.block_multi_statistics-16-adjusted.multi``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List

import numpy as np

from ..config import (
    CODEWORD_BITS,
    DSF_FILTER_THRESHOLD,
    INITIAL_BPI,
    MAX_ENTRY_SIZE,
    NUM_ENTRIES,
    NUM_SELECTORS,
)
from ..io.collection import BinaryCollection
from ..utils import gaps as gap_mod
from . import collectors


@dataclass
class SelectorStats:
    """Filtered, sorted block list for one selector context (SoA layout)."""

    lengths: np.ndarray  # (U,) int32
    freqs: np.ndarray  # (U,) int64
    data: np.ndarray  # (U, MAX_ENTRY_SIZE) u32, zero-padded beyond length


@dataclass
class BlockStats:
    total_integers: int
    contexts: List[SelectorStats]

    @property
    def is_multi(self) -> bool:
        return len(self.contexts) > 1


def dsf_saving(lengths: np.ndarray, freqs: np.ndarray, total_integers: int) -> np.ndarray:
    """compute_saving (dictionary_builders.hpp:19-26)."""
    return (
        freqs.astype(np.float64)
        * (INITIAL_BPI * lengths.astype(np.float64) - CODEWORD_BITS)
        / float(total_integers)
    )


def _filter_sort(
    per_size: dict, total_integers: int, threshold: float = DSF_FILTER_THRESHOLD
) -> SelectorStats:
    """Apply the DSF cost filter + singleton keep, then (freq, length) sort."""
    lens_parts, freq_parts, data_parts = [], [], []
    for size, (windows, freqs) in per_size.items():
        if windows.shape[0] == 0:
            continue
        lengths = np.full(freqs.shape[0], size, dtype=np.int32)
        keep = (dsf_saving(lengths, freqs, total_integers) > threshold) | (
            lengths == 1
        )
        windows, freqs, lengths = windows[keep], freqs[keep], lengths[keep]
        padded = np.zeros((windows.shape[0], MAX_ENTRY_SIZE), dtype=np.uint32)
        padded[:, :size] = windows
        lens_parts.append(lengths)
        freq_parts.append(freqs)
        data_parts.append(padded)
    if not lens_parts:
        z = np.zeros(0, dtype=np.int64)
        return SelectorStats(
            z.astype(np.int32), z, np.zeros((0, MAX_ENTRY_SIZE), np.uint32)
        )
    lengths = np.concatenate(lens_parts)
    freqs = np.concatenate(freq_parts)
    data = np.concatenate(data_parts)
    # freq_length_sorter (statistics_collectors.hpp:57-64): freq desc,
    # tie-break length desc.  The reference's std::sort leaves further
    # ties unordered; we add a content tie-break for determinism.
    content_key = np.ascontiguousarray(data.byteswap()).view(
        np.dtype((np.void, MAX_ENTRY_SIZE * 4))
    ).ravel()
    order = np.lexsort((content_key, -lengths.astype(np.int64), -freqs))
    return SelectorStats(lengths[order], freqs[order], data[order])


def gap_stream(collection: BinaryCollection, compute_gaps: bool):
    """Yield the transformed (d-gap / freq-1) stream per list.

    Reference block_statistics.hpp:62-79: for docs, skip the leading
    num-docs singleton and d-gap each list; for freqs subtract 1.
    """
    from ..utils.progress import ProgressLogger

    it = iter(range(len(collection)))
    if compute_gaps:
        next(it)  # leading num-docs singleton
    prog = ProgressLogger(len(collection), "statistics: lists scanned")
    for i in it:
        prog.add()
        seq = collection.sequence(i)
        if seq.shape[0] == 0:
            continue
        if compute_gaps:
            yield gap_mod.docs_to_gaps(seq)
        else:
            yield gap_mod.freqs_to_gaps(seq)


def compute_stats(
    collection: BinaryCollection, compute_gaps: bool, multi: bool
) -> BlockStats:
    total = collection.num_postings() - (2 if compute_gaps else 0)
    if multi:
        per_key = collectors.collect_multi(gap_stream(collection, compute_gaps))
        contexts = []
        for sel in range(NUM_SELECTORS):
            per_size = {s: per_key[(sel, s)] for s in collectors.TARGET_SIZES}
            contexts.append(_filter_sort(per_size, total))
    else:
        per_size = collectors.collect_single(gap_stream(collection, compute_gaps))
        contexts = [_filter_sort(per_size, total)]
    return BlockStats(total, contexts)


def stats_cache_name(collection_path: str, multi: bool) -> str:
    base = os.path.basename(collection_path)
    if multi:
        return f"./{base}.block_multi_statistics-{MAX_ENTRY_SIZE}-adjusted.multi"
    return f"./{base}.block_statistics-{MAX_ENTRY_SIZE}-adjusted"


def store_stats(stats: BlockStats, path: str) -> None:
    with open(path, "wb") as f:
        np.asarray([stats.total_integers], dtype="<u8").tofile(f)
        for ctx in stats.contexts:
            np.asarray([ctx.lengths.shape[0]], dtype="<u4").tofile(f)
            for i in range(ctx.lengths.shape[0]):
                size = int(ctx.lengths[i])
                np.asarray([size, int(ctx.freqs[i]) & 0xFFFFFFFF], dtype="<u4").tofile(f)
                np.asarray(ctx.data[i, :size], dtype="<u4").tofile(f)


def load_stats(path: str, multi: bool, cap_single: bool = True) -> BlockStats:
    raw = np.fromfile(path, dtype=np.uint8)
    total = int(raw[:8].view("<u8")[0])
    words = raw[8:].view("<u4")
    pos = 0
    contexts = []
    n_ctx = NUM_SELECTORS if multi else 1
    for _ in range(n_ctx):
        num_blocks = int(words[pos])
        pos += 1
        # The single-variant loader caps at num_entries
        # (block_statistics.hpp:121-122); multi loads everything.
        limit = min(num_blocks, NUM_ENTRIES) if (cap_single and not multi) else num_blocks
        lengths = np.zeros(limit, dtype=np.int32)
        freqs = np.zeros(limit, dtype=np.int64)
        data = np.zeros((limit, MAX_ENTRY_SIZE), dtype=np.uint32)
        for i in range(num_blocks):
            size = int(words[pos])
            freq = int(words[pos + 1])
            if i < limit:
                lengths[i] = size
                freqs[i] = freq
                data[i, :size] = words[pos + 2 : pos + 2 + size]
            pos += 2 + size
        contexts.append(SelectorStats(lengths, freqs, data))
    return BlockStats(total, contexts)


def create_or_load(
    collection_path: str, compute_gaps: bool, multi: bool, cache_dir: str = "."
) -> BlockStats:
    """create-or-load discipline (block_statistics.hpp:26-43)."""
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, os.path.basename(stats_cache_name(collection_path, multi)))
    if os.path.exists(cache):
        return load_stats(cache, multi)
    coll = BinaryCollection(collection_path)
    stats = compute_stats(coll, compute_gaps, multi)
    try:
        store_stats(stats, cache)
    except OSError:
        pass
    return stats
