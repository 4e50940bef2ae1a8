"""Block-Max WAND pruning tests (query/bmw.py).

Gates: exact top-k parity with ranked_or (host reduction AND through
the device sort-merge kernel), real pruning on skewed shapes (fails if
the pruner degenerates to keep-everything), and sidecar save/load.
"""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import bmw, device_batch, lazy_decode, ranked, term_decode


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bmw") / "c")
    docs, freqs = synth.make_collection(60, 9000, seed=23, avg_len=140)
    collection.write_freq_collection(base, docs, freqs, 9000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 9000)
    )
    idx = dint_index.build_index(
        base, kind="single", cache_dir=str(tmp_path_factory.mktemp("bmwc"))
    )
    wd = ranked.build_wand_data(base)
    return idx, wd, docs, base


def test_wand_data_block_sidecar_roundtrip(built, tmp_path):
    idx, wd, docs, base = built
    assert wd.block_maxw is not None
    assert int(wd.block_ptr[-1]) == wd.block_maxw.shape[0]
    p = str(tmp_path / "w")
    wd.save(p)
    wd2 = ranked.WandData.load(p)
    np.testing.assert_array_equal(wd.block_maxw, wd2.block_maxw)
    np.testing.assert_array_equal(wd.block_ptr, wd2.block_ptr)
    # block geometry aligns with the index's blocks
    for t in range(len(docs)):
        p0, p1 = idx.list_blocks(t)
        assert int(wd.block_ptr[t + 1] - wd.block_ptr[t]) == p1 - p0


def test_bmw_host_matches_ranked_or(built):
    idx, wd, docs, _ = built
    dec = term_decode.TermDecoder(idx)
    rng = np.random.default_rng(0)
    nonempty = [t for t in range(len(docs)) if len(docs[t])]
    for _ in range(40):
        q = list(rng.choice(nonempty, size=rng.integers(1, 5), replace=False))
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        got = bmw.ranked_topk_pruned_host(
            lazy_decode.BlockCache(idx), idx, wd, q, k=10
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, rtol=1e-4), (q, got, want)


def test_bmw_rows_through_device_kernel(built):
    """Pruned rows fed to the ranked_union_topk sort-merge kernel give
    ranked_or's top-k — the device BMW serving path end-to-end."""
    idx, wd, docs, _ = built
    dec = term_decode.TermDecoder(idx)
    rng = np.random.default_rng(7)
    nonempty = [t for t in range(len(docs)) if len(docs[t])]
    queries = [
        list(rng.choice(nonempty, size=rng.integers(1, 5), replace=False))
        for _ in range(12)
    ]
    drows, srows, stats = bmw.build_pruned_rows(
        lazy_decode.BlockCache(idx), idx, wd, queries, 10
    )
    assert stats["postings_kept"] <= stats["postings_total"]
    kernel, _, _ = device_batch._kernels()
    import jax.numpy as jnp

    d = jnp.asarray(
        device_batch.pad_batch(drows, device_batch.PAD_DOC, np.int32)
    )
    s = jnp.asarray(device_batch.pad_batch(srows, 0.0, np.float32))
    top, top_docs = kernel(d, s, k=10)
    top = np.asarray(top)
    for i, q in enumerate(queries):
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        got = top[i][: want.shape[0]]
        got = got[got > -np.inf]
        assert got.shape == want.shape, (q, got, want)
        assert np.allclose(got, want, rtol=1e-4), (q, got, want)


@pytest.fixture(scope="module")
def skew(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bmwskew") / "c")
    rng = np.random.default_rng(5)
    nd = 800_000
    big = np.sort(rng.choice(nd, 200_000, replace=False)).astype(np.uint32)
    rare = np.sort(rng.choice(nd, 90, replace=False)).astype(np.uint32)
    ds = [big, rare]
    fs = [
        np.ones(len(big), np.uint32),
        rng.integers(1, 6, len(rare)).astype(np.uint32),
    ]
    collection.write_freq_collection(base, ds, fs, nd)
    collection.write_sizes_file(base, synth.doc_sizes_from_lists(ds, fs, nd))
    idx = dint_index.build_index(
        base, kind="single", cache_dir=str(tmp_path_factory.mktemp("bmwsc"))
    )
    wd = ranked.build_wand_data(base)
    return idx, wd, ds


def test_bmw_actually_prunes(skew):
    """FAILS if the pruner keeps (nearly) everything on rare+huge."""
    idx, wd, ds = skew
    cache = lazy_decode.BlockCache(idx)
    keep, tau, stats = bmw.prune_blocks(cache, idx, wd, [0, 1], k=10)
    assert tau > 0
    assert stats["postings_kept"] < stats["postings_total"] * 0.25, stats
    dec = term_decode.TermDecoder(idx)
    want = ranked.ranked_or(idx, dec, wd, [0, 1], k=10)
    got = bmw.ranked_topk_pruned_host(
        lazy_decode.BlockCache(idx), idx, wd, [0, 1], k=10
    )
    assert np.allclose(got, want, rtol=1e-4)
