"""Crawl-shaped synthetic collections (io/synth.py bursty/skewed mode,
VERDICT r3 item 6): validity + the distributional properties that make
it a meaningful pruning benchmark (heavy-tailed gaps, locally
correlated frequencies) vs the uniform-geometric model."""

import numpy as np
import pytest

from dint_tpu.io import synth


def test_bursty_list_valid():
    rng = np.random.default_rng(4)
    for n, universe in [(1, 10), (100, 10_000), (5000, 6000),
                        (3000, 3000), (256, 1 << 20)]:
        d = synth.bursty_posting_list(rng, universe, n)
        assert d.shape[0] == n
        assert d.dtype == np.uint32
        assert int(d[-1]) < universe
        if n > 1:
            assert (np.diff(d.astype(np.int64)) >= 1).all()


def test_bursty_gaps_heavy_tailed():
    """Pareto between-burst jumps: the max gap dwarfs the median gap
    (the uniform-geometric model keeps them within ~2 orders)."""
    rng = np.random.default_rng(7)
    d = synth.bursty_posting_list(rng, 50_000_000, 20_000)
    gaps = np.diff(d.astype(np.int64))
    assert np.median(gaps) <= 4  # bursts dominate the count
    assert gaps.max() > 1000 * max(np.median(gaps), 1)  # heavy tail
    # zero d-gaps (gap==1) are common — DINT run-codeword food
    assert (gaps == 1).mean() > 0.4


def test_skewed_collection_shape_and_reproducibility():
    docs, freqs = synth.make_skewed_collection(40, 20_000, seed=9)
    docs2, freqs2 = synth.make_skewed_collection(40, 20_000, seed=9)
    assert len(docs) == len(freqs) == 40
    for d, f, d2, f2 in zip(docs, freqs, docs2, freqs2):
        assert d.shape == f.shape
        np.testing.assert_array_equal(d, d2)
        np.testing.assert_array_equal(f, f2)
        assert (f >= 1).all()
        if d.shape[0] > 1:
            assert (np.diff(d.astype(np.int64)) >= 1).all()
        if d.shape[0]:
            assert int(d[-1]) < 20_000


def test_skewed_blocks_have_varied_maxima():
    """The motivating property: per-256-block frequency maxima vary far
    more than the uniform model's, so block-max pruning has something
    to skip."""
    def block_max_spread(fn):
        docs, freqs = fn
        # longest list's per-256 block maxima
        i = int(np.argmax([d.shape[0] for d in docs]))
        f = freqs[i].astype(np.float64)
        nb = f.shape[0] // 256
        assert nb >= 8
        bm = f[: nb * 256].reshape(nb, 256).max(axis=1)
        return bm.max() / max(np.median(bm), 1.0)

    skew = block_max_spread(
        synth.make_skewed_collection(30, 60_000, seed=3, avg_len=2000))
    unif = block_max_spread(
        synth.make_collection(30, 60_000, seed=3, avg_len=2000))
    assert skew > 2 * unif, (skew, unif)


def test_skewed_target_postings_exact():
    docs, _ = synth.make_skewed_collection(
        50, 30_000, seed=2, target_postings=100_000)
    assert sum(d.shape[0] for d in docs) == 100_000
