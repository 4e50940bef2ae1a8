"""Fused device serving (query/device_serve.py) parity.

The HBM-resident store path must return the SAME ranked top-k as the
host oracle (ranked_or) and the round-4 row-upload device engine, with
and without Block-Max pruning, across uniform and crawl-shaped
collections and edge query shapes.  On the CPU test backend the block
copy runs through the portable XLA row-gather path; the Pallas kernel
is shape-compatible by construction (same (1, 256) blocks)."""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import device_batch, device_serve, lazy_decode, ranked
from dint_tpu.query.term_decode import TermDecoder


@pytest.fixture(scope="module", params=["uniform", "skew"])
def built(request, tmp_path_factory):
    shape = request.param
    base = str(tmp_path_factory.mktemp(f"ds_{shape}") / "c")
    if shape == "skew":
        docs, freqs = synth.make_skewed_collection(
            40, 30_000, seed=11, avg_len=400)
    else:
        docs, freqs = synth.make_collection(40, 30_000, seed=11,
                                            avg_len=400)
    docs[7] = np.zeros(0, np.uint32)
    freqs[7] = np.zeros(0, np.uint32)
    docs[8] = docs[8][:1]
    freqs[8] = freqs[8][:1]
    collection.write_freq_collection(base, docs, freqs, 30_000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 30_000))
    idx = dint_index.build_index(
        base, kind="single",
        cache_dir=str(tmp_path_factory.mktemp(f"ds_cache_{shape}")))
    wd = ranked.build_wand_data(base)
    rng = np.random.default_rng(3)
    queries = [
        [int(t) for t in rng.integers(0, 40, size=int(rng.integers(1, 5)))]
        for _ in range(30)
    ]
    queries += [[7], [7, 3], [8, 8, 8]]
    return idx, wd, queries


def _oracle(idx, wd, q, k):
    dec = TermDecoder(idx)
    dec._lazy_cache = lazy_decode.BlockCache(idx)
    return ranked.ranked_or(idx, dec, wd, q, k)


def test_store_layout(built):
    idx, wd, queries = built
    dec = TermDecoder(idx)
    store = device_serve.DeviceServingStore(idx, dec, wd)
    # every term's blocks hold its postings in order, PAD-padded
    docs = dec.decode_docids(list(range(idx.num_lists)))
    d_host = np.asarray(store._dstore).reshape(-1, 256)
    for t in range(idx.num_lists):
        n = docs[t].shape[0]
        nb = int(store.nb[t])
        assert nb == -(-n // 256) if n else nb == 0
        if not n:
            continue
        flat = d_host[int(store.blk_off[t]):int(store.blk_off[t]) + nb]
        flat = flat.reshape(-1)
        np.testing.assert_array_equal(flat[:n], docs[t].astype(np.int64))
        assert (flat[n:] == int(device_serve.PAD_DOC)).all()
    # dedicated PAD block
    assert (d_host[-1] == int(device_serve.PAD_DOC)).all()


def test_ranked_topk_matches_oracle(built):
    idx, wd, queries = built
    dec = TermDecoder(idx)
    store = device_serve.DeviceServingStore(idx, dec, wd)
    k = 10
    out_s, out_d, stats = store.ranked_topk(queries, k=k, prune=False)
    assert stats["upload_bytes"] < 1 << 20  # metadata, not rows
    for i, q in enumerate(queries):
        want = np.sort(_oracle(idx, wd, q, k))[::-1]
        got = out_s[i]
        assert got.shape[0] == want.shape[0], (i, q)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5,
                                   err_msg=f"query {i} {q}")


def test_ranked_topk_pruned_matches(built):
    idx, wd, queries = built
    dec = TermDecoder(idx)
    store = device_serve.DeviceServingStore(idx, dec, wd)
    cache = lazy_decode.BlockCache(idx)
    k = 10
    out_s, _, stats = store.ranked_topk(
        queries, k=k, prune=True, lazy_cache=cache)
    assert stats["blocks_kept"] <= stats["blocks_total"]
    for i, q in enumerate(queries):
        want = np.sort(_oracle(idx, wd, q, k))[::-1]
        np.testing.assert_allclose(out_s[i], want, rtol=2e-4, atol=1e-5,
                                   err_msg=f"pruned query {i} {q}")


def test_matches_row_upload_engine(built):
    """Same scores as the round-4 device path (identical f32 partials,
    same sort-merge reduction)."""
    idx, wd, queries = built
    dec = TermDecoder(idx)
    store = device_serve.DeviceServingStore(idx, dec, wd)
    old = device_batch.ranked_or_batch(idx, dec, wd, queries, k=10)
    new_s, _, _ = store.ranked_topk(queries, k=10, prune=False)
    for i in range(len(queries)):
        np.testing.assert_allclose(new_s[i], old[i], rtol=1e-6, atol=1e-7)


def test_hierarchical_topk_exact():
    """_topk_rows at monster widths (hierarchical path) returns exactly
    the flat top-k scores."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    P = 1 << 19
    cand = rng.standard_normal((2, P)).astype(np.float32)
    cand[0, ::7] = -np.inf
    d = rng.integers(0, 1 << 30, size=(2, P)).astype(np.int32)
    top, docs = device_serve._topk_rows(jnp.asarray(cand),
                                        jnp.asarray(d), 10)
    want = np.sort(cand, axis=1)[:, ::-1][:, :10]
    np.testing.assert_allclose(np.asarray(top), want, rtol=0, atol=0)
