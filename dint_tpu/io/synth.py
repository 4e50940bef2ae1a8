"""Synthetic test collections.

The reference ships a 113,306-list / 3,327,520-posting sample collection
whose `.docs`/`.freqs` blobs are absent from our snapshot
(/root/reference/.MISSING_LARGE_BLOBS:1-2), so local baselines are
measured on synthesized compatible collections.  The generator mirrors
the shape of real inverted indexes: Zipf-ish list lengths, clustered
docIDs (runs of consecutive documents, which produce zero d-gaps — the
pattern DINT's run codewords exploit), and small skewed frequencies.

Randomness mirrors the reference's test fixture style
(test/test_generic_sequence.hpp:7-26) but is numpy-vectorized.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def random_posting_list(
    rng: np.random.Generator, universe: int, n: int, cluster: float = 0.3
) -> np.ndarray:
    """Strictly-increasing docid list of length n over [0, universe).

    ``cluster`` is the probability that a posting continues a run of
    consecutive documents (gap of 1); the remaining mass is spread
    geometrically so the expected total span stays within the universe.
    """
    assert 0 < n <= universe
    # Gap budget: sum(gaps) <= universe with every gap >= 1.
    # With prob `cluster` the gap is exactly 1 (consecutive docs ->
    # zero d-gap, the pattern DINT run codewords exploit); otherwise
    # 1 + Geom.  If the draw overspends the universe, the non-run
    # extras are scaled down — strict monotonicity is preserved
    # because the base gap of 1 is untouched.
    is_run = rng.random(n) < cluster
    mean_extra = max((universe / max(n, 1) - 1.0) / max(1e-9, (1.0 - cluster)), 0.001)
    p = min(1.0, 1.0 / (1.0 + mean_extra))
    extra = (rng.geometric(p, size=n) - 1).astype(np.int64)
    extra[is_run] = 0
    total = n + int(extra.sum())
    if total > universe:
        budget = universe - n
        ext_total = max(int(extra.sum()), 1)
        extra = (extra * (budget * 0.98 / ext_total)).astype(np.int64)
    gaps = 1 + extra
    docs = np.cumsum(gaps) - 1
    assert int(docs[-1]) < universe
    return docs.astype(np.uint32)


def random_freqs(rng: np.random.Generator, n: int) -> np.ndarray:
    """Small skewed positive frequencies (mostly 1..4)."""
    f = rng.zipf(2.0, size=n)
    return np.minimum(f, 1 << 20).astype(np.uint32)


def zipf_lengths(
    rng: np.random.Generator,
    num_lists: int,
    target_sum: int,
    cap: int,
) -> np.ndarray:
    """Zipf-tailed list lengths with an EXACT total, each in [1, cap].

    Rank-frequency power law (Zipf's law proper): len(rank) =
    cap * rank^-alpha, with alpha binary-searched so the total hits
    target_sum.  (Sampling i.i.d. Zipf values and rescaling degenerates
    when cap << the tail: the cap destroys the mass and ~everything
    collapses to length 1.)
    """
    ranks = np.arange(1, num_lists + 1, dtype=np.float64)

    def lens_of(alpha: float) -> np.ndarray:
        return np.maximum(
            1, np.round(cap * ranks ** -alpha)
        ).astype(np.int64)

    lo, hi = 0.0, 12.0  # sum decreases as alpha grows
    for _ in range(80):
        mid = (lo + hi) / 2
        if int(lens_of(mid).sum()) > target_sum:
            lo = mid
        else:
            hi = mid
    lens = lens_of(lo)
    rng.shuffle(lens)
    # exact correction: walk off the residual one list at a time
    diff = int(lens.sum()) - target_sum
    i = 0
    order = np.argsort(-lens)
    while diff != 0 and i < num_lists:
        j = order[i % num_lists]
        if diff > 0 and lens[j] > 1:
            lens[j] -= 1
            diff -= 1
        elif diff < 0 and lens[j] < cap:
            lens[j] += 1
            diff += 1
        i += 1
    return lens


def make_collection(
    num_lists: int,
    num_docs: int,
    seed: int = 1,
    avg_len: float = 30.0,
    cluster: float = 0.3,
    target_postings: int = 0,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """A (doc_lists, freq_lists) pair shaped like the bundled sample.

    List lengths follow a truncated Zipf so a few terms are dense (long
    runs, highly compressible) and the long tail is short, as in real
    collections.  With target_postings > 0 the lengths are rescaled so
    the total posting count is exact even when num_docs caps the tail.
    """
    rng = np.random.default_rng(seed)
    if target_postings:
        lens = zipf_lengths(rng, num_lists, int(target_postings), num_docs)
    else:
        raw = rng.zipf(1.35, size=num_lists).astype(np.float64)
        lens = np.maximum(1, (raw / raw.mean() * avg_len)).astype(np.int64)
        lens = np.minimum(lens, num_docs)
    doc_lists: List[np.ndarray] = []
    freq_lists: List[np.ndarray] = []
    for n in lens:
        n = int(n)
        doc_lists.append(random_posting_list(rng, num_docs, n, cluster))
        freq_lists.append(random_freqs(rng, n))
    return doc_lists, freq_lists


def doc_sizes_from_lists(
    doc_lists: List[np.ndarray], freq_lists: List[np.ndarray], num_docs: int
) -> np.ndarray:
    """Per-document lengths: sum of freqs of postings naming the doc."""
    sizes = np.zeros(num_docs, dtype=np.int64)
    for d, f in zip(doc_lists, freq_lists):
        np.add.at(sizes, d.astype(np.int64), f.astype(np.int64))
    return np.maximum(sizes, 1).astype(np.uint32)
