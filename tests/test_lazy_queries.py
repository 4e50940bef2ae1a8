"""Skip-aware lazy decode + real WAND/maxscore tests.

These tests encode the round-2 acceptance gates:
* lazy per-block decode (vectorized + batched) is bit-exact vs the
  source collection, for single and multi dictionary kinds;
* WAND and maxscore produce ranked_or's top-k (the reference's own
  acceptance criterion, test_ranked_queries.cpp:43-55);
* pruning is REAL: counter assertions fail if WAND degenerates to
  exhaustive scoring (VERDICT round-1 finding).
"""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import boolean, lazy_decode, ranked, term_decode


@pytest.fixture(scope="module", params=["single", "multi"])
def built(request, tmp_path_factory):
    kind = request.param
    base = str(tmp_path_factory.mktemp(f"lazy_{kind}") / "c")
    docs, freqs = synth.make_collection(60, 9000, seed=17, avg_len=130)
    collection.write_freq_collection(base, docs, freqs, 9000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 9000)
    )
    idx = dint_index.build_index(base, kind=kind, cache_dir=str(tmp_path_factory.mktemp(f"cache_{kind}")))
    wd = ranked.build_wand_data(base)
    return idx, wd, docs, freqs


def test_lazy_block_decode_exact(built):
    idx, _, docs, freqs = built
    cache = lazy_decode.BlockCache(idx)
    for t in range(len(docs)):
        if not len(docs[t]):
            continue
        p0, p1 = idx.list_blocks(t)
        got_d = np.concatenate(
            [cache.docs_block(t, b) for b in range(p0, p1)]
        )
        got_f = np.concatenate(
            [cache.freqs_block(t, b) for b in range(p0, p1)]
        )
        np.testing.assert_array_equal(got_d, docs[t], err_msg=f"docs {t}")
        np.testing.assert_array_equal(got_f, freqs[t], err_msg=f"freqs {t}")


def test_lazy_batch_decode_exact(built):
    idx, _, docs, freqs = built
    cache = lazy_decode.BlockCache(idx)
    pairs = []
    for t in range(len(docs)):
        p0, p1 = idx.list_blocks(t)
        pairs += [(t, b) for b in range(p0, p1)]
    cache.docs_blocks_batch(pairs)
    cache.freqs_blocks_batch(pairs)
    for t in range(len(docs)):
        if not len(docs[t]):
            continue
        p0, p1 = idx.list_blocks(t)
        got_d = np.concatenate([cache._docs[b] for b in range(p0, p1)])
        got_f = np.concatenate([cache._freqs[b] for b in range(p0, p1)])
        np.testing.assert_array_equal(got_d, docs[t])
        np.testing.assert_array_equal(got_f, freqs[t])


def test_lazy_decode_with_exceptions(tmp_path):
    """Gaps beyond 2^16 force 4-byte exception codewords — the dirty
    scalar fallback path must stay bit-exact."""
    base = str(tmp_path / "x")
    rng = np.random.default_rng(9)
    nd = 40_000_000
    lists = []
    for n in (300, 700, 64, 1):
        lists.append(
            np.sort(rng.choice(nd, size=n, replace=False)).astype(np.uint32)
        )
    fr = [np.minimum(rng.integers(1, 9, len(d)), 255).astype(np.uint32) for d in lists]
    collection.write_freq_collection(base, lists, fr, nd)
    idx = dint_index.build_index(base, kind="single", cache_dir=str(tmp_path))
    cache = lazy_decode.BlockCache(idx)
    pairs = []
    for t in range(len(lists)):
        p0, p1 = idx.list_blocks(t)
        pairs += [(t, b) for b in range(p0, p1)]
    cache.docs_blocks_batch(pairs)
    for t in range(len(lists)):
        p0, p1 = idx.list_blocks(t)
        got = np.concatenate([cache.docs_block(t, b) for b in range(p0, p1)])
        np.testing.assert_array_equal(got, lists[t])


def test_cursor_next_geq(built):
    idx, _, docs, _ = built
    cache = lazy_decode.BlockCache(idx)
    rng = np.random.default_rng(3)
    terms = [t for t in range(len(docs)) if len(docs[t]) > 10][:10]
    for t in terms:
        d = docs[t]
        probes = np.concatenate(
            [rng.choice(int(d[-1]) + 2, 25), d[:3].astype(np.int64)]
        )
        for probe in probes:
            c = lazy_decode.Cursor(cache, t)
            c.next_geq(int(probe))
            tail = d[d >= probe]
            if len(tail):
                assert c.docid() == tail[0]
                assert c.freq() >= 1
            else:
                assert c.docid() == idx.num_docs

        # sequential next() walks the whole list
        c = lazy_decode.Cursor(cache, t)
        walked = []
        while c.docid() != idx.num_docs:
            walked.append(c.docid())
            c.next()
        np.testing.assert_array_equal(np.asarray(walked, np.uint32), d)


def test_wand_maxscore_match_ranked_or(built):
    idx, wd, docs, _ = built
    dec = term_decode.TermDecoder(idx)
    rng = np.random.default_rng(0)
    nonempty = [t for t in range(len(docs)) if len(docs[t])]
    for _ in range(40):
        q = list(rng.choice(nonempty, size=rng.integers(1, 5), replace=False))
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        got_w = ranked.wand(idx, dec, wd, q, k=10)
        got_m = ranked.maxscore(idx, dec, wd, q, k=10)
        assert got_w.shape == want.shape
        assert np.allclose(got_w, want, rtol=1e-4), (q, got_w, want)
        assert got_m.shape == want.shape
        assert np.allclose(got_m, want, rtol=1e-4), (q, got_m, want)


@pytest.fixture(scope="module")
def skew(tmp_path_factory):
    """A rare term and a huge term: the pruning stress shape."""
    base = str(tmp_path_factory.mktemp("skew") / "c")
    rng = np.random.default_rng(5)
    nd = 1_000_000
    big = np.sort(rng.choice(nd, 250_000, replace=False)).astype(np.uint32)
    mid = np.sort(rng.choice(nd, 20_000, replace=False)).astype(np.uint32)
    rare = np.sort(rng.choice(nd, 80, replace=False)).astype(np.uint32)
    ds = [big, mid, rare]
    fs = [
        np.ones(len(big), np.uint32),
        rng.integers(1, 4, len(mid)).astype(np.uint32),
        rng.integers(1, 6, len(rare)).astype(np.uint32),
    ]
    collection.write_freq_collection(base, ds, fs, nd)
    collection.write_sizes_file(base, synth.doc_sizes_from_lists(ds, fs, nd))
    idx = dint_index.build_index(
        base, kind="single", cache_dir=str(tmp_path_factory.mktemp("skewc"))
    )
    wd = ranked.build_wand_data(base)
    return idx, wd, ds, fs, base


def test_wand_actually_prunes(skew):
    """FAILS if wand degenerates to exhaustive: on rare+huge it must
    score a tiny fraction of the postings and decode a tiny fraction
    of the blocks (queries.hpp:241-253 pivoting)."""
    idx, wd, ds, _, _ = skew
    dec = term_decode.TermDecoder(idx)
    total_postings = sum(len(d) for d in ds)
    want = None
    for algo in (ranked.wand, ranked.maxscore):
        dec._lazy_cache = None
        got = algo(idx, dec, wd, [0, 2], k=10)
        c = dec.lazy_cache
        assert c.postings_scored < total_postings * 0.01, (
            algo.__name__, c.postings_scored, total_postings)
        assert c.docs_blocks_decoded < idx.num_blocks * 0.25, (
            algo.__name__, c.docs_blocks_decoded, idx.num_blocks)
        if want is None:
            want = got
        else:
            assert np.allclose(got, want, rtol=1e-4)


def test_and_lazy_skips_blocks(skew):
    idx, _, ds, fs, _ = skew
    cache = lazy_decode.BlockCache(idx)
    got = boolean.and_query_lazy(cache, [0, 2])
    want = np.intersect1d(ds[0], ds[2])
    np.testing.assert_array_equal(got, want)
    # rare term has <=1 block; candidate probes touch at most one block each
    assert cache.docs_blocks_decoded <= 1 + len(ds[2]) + 4, (
        cache.docs_blocks_decoded
    )
    assert cache.docs_blocks_decoded < idx.num_blocks * 0.15
    # freq access decodes only matched blocks
    if len(got):
        before = cache.freqs_blocks_decoded
        mf = boolean.matched_freqs_lazy(cache, [0, 2], got)
        assert cache.freqs_blocks_decoded - before < idx.num_blocks * 0.15
        for t in (0, 2):
            pos = np.searchsorted(ds[t], got)
            ok = pos < len(ds[t])
            ok[ok] = ds[t][pos[ok]] == got[ok]
            want_f = np.zeros(len(got), np.uint32)
            want_f[ok] = fs[t][pos[ok]]
            np.testing.assert_array_equal(mf[t], want_f)


def test_lazy_and_or_parity(built):
    idx, _, docs, _ = built
    rng = np.random.default_rng(11)
    nonempty = [t for t in range(len(docs)) if len(docs[t])]
    for _ in range(30):
        q = list(rng.choice(nonempty, size=rng.integers(2, 5), replace=False))
        cache = lazy_decode.BlockCache(idx)
        got_and = boolean.and_query_lazy(cache, q)
        want_and = boolean.and_query({t: docs[t] for t in q}, q)
        np.testing.assert_array_equal(got_and, want_and, err_msg=str(q))
        got_or = boolean.or_query_lazy(lazy_decode.BlockCache(idx), q)
        want_or = boolean.or_query({t: docs[t] for t in q}, q)
        np.testing.assert_array_equal(got_or, want_or, err_msg=str(q))


@pytest.mark.parametrize("codec", ["optpfor", "streamvbyte", "mixed"])
def test_wand_on_block_codec_indexes(tmp_path, codec):
    """WAND/maxscore run with real pruning over the block-codec index
    family too (ZooBlockCache): parity with ranked_or, counters prove
    lazy decode."""
    from dint_tpu.index import block_index, mixed_block

    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(40, 8000, seed=31, avg_len=120)
    collection.write_freq_collection(base, docs, freqs, 8000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 8000)
    )
    if codec == "mixed":
        idx = mixed_block.build_mixed_index(base)
    else:
        idx = block_index.build_block_index(base, codec)
    wd = ranked.build_wand_data(base)
    dec = block_index.BlockTermDecoder(idx)
    rng = np.random.default_rng(2)
    nonempty = [t for t in range(40) if len(docs[t])]
    for _ in range(15):
        q = list(rng.choice(nonempty, size=rng.integers(1, 4), replace=False))
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        got_w = ranked.wand(idx, dec, wd, q, k=10)
        got_m = ranked.maxscore(idx, dec, wd, q, k=10)
        assert got_w.shape == want.shape
        assert np.allclose(got_w, want, rtol=1e-4), (codec, q)
        assert np.allclose(got_m, want, rtol=1e-4), (codec, q)
    assert dec.lazy_cache.docs_blocks_decoded > 0


@pytest.mark.parametrize("codec", ["optpfor", "qmx"])
def test_wand_actually_prunes_block_index(skew, codec, tmp_path):
    """The DINT anti-degeneration gate applied to the ZooBlockCache
    family: on the rare+huge skew shape, a WAND/maxscore fallback to
    exhaustive scoring fails the counter bounds (VERDICT r2 weak #5)."""
    from dint_tpu.index import block_index

    _, wd, ds, _, base = skew
    idx = block_index.build_block_index(base, codec)
    dec = block_index.BlockTermDecoder(idx)
    total_postings = sum(len(d) for d in ds)
    want = None
    for algo in (ranked.wand, ranked.maxscore):
        dec._lazy_cache = None
        got = algo(idx, dec, wd, [0, 2], k=10)
        c = dec.lazy_cache
        assert c.postings_scored < total_postings * 0.01, (
            codec, algo.__name__, c.postings_scored, total_postings)
        assert c.docs_blocks_decoded < idx.num_blocks * 0.25, (
            codec, algo.__name__, c.docs_blocks_decoded, idx.num_blocks)
        if want is None:
            want = got
        else:
            assert np.allclose(got, want, rtol=1e-4)
