"""Index build/verify/save/load + boolean and ranked query correctness.

Follows the reference's oracle style (test_ranked_queries.cpp:43-55):
query results are compared against brute-force evaluation over the raw
collection.
"""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import boolean, ranked
from dint_tpu.query.term_decode import TermDecoder


@pytest.fixture(scope="module")
def coll(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("coll")
    base = str(tmp / "tc")
    docs, freqs = synth.make_collection(150, 20000, seed=5, avg_len=120)
    collection.write_freq_collection(base, docs, freqs, 20000)
    sizes = synth.doc_sizes_from_lists(docs, freqs, 20000)
    collection.write_sizes_file(base, sizes)
    return base, docs, freqs


@pytest.fixture(scope="module", params=["single", "multi"])
def built(coll, request, tmp_path_factory):
    base, docs, freqs = coll
    cache = str(tmp_path_factory.mktemp(f"cache_{request.param}"))
    idx = dint_index.build_index(base, kind=request.param, cache_dir=cache)
    return idx, base, docs, freqs


def test_index_verify(built):
    idx, base, docs, freqs = built
    dint_index.verify_index(idx, base)
    stats = idx.size_stats()
    assert stats["postings"] == sum(len(d) for d in docs)
    assert 0 < stats["docs_bpi"] < 48
    assert 0 < stats["freqs_bpi"] < 48


def test_index_save_load_verify(built, tmp_path):
    idx, base, docs, freqs = built
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = dint_index.DintIndex.load(p)
    assert idx2.kind == idx.kind
    assert idx2.docs_end is None  # recovered lazily, not serialized
    dint_index.verify_index(idx2, base)
    np.testing.assert_array_equal(idx2.docs_end, idx.docs_end)


def test_term_decoder_matches_collection(built):
    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    terms = [0, 1, len(docs) // 2, len(docs) - 1]
    got_d = dec.decode_docids(terms)
    got_f = dec.decode_freqs(terms)
    for t in terms:
        np.testing.assert_array_equal(got_d[t], docs[t])
        np.testing.assert_array_equal(got_f[t], freqs[t])


def _random_queries(rng, num_terms, n=40):
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 5))
        out.append(list(rng.integers(0, num_terms, size=k)))
    return out


def test_boolean_queries_exact(built):
    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    rng = np.random.default_rng(17)
    queries = _random_queries(rng, len(docs))
    res_and, _ = boolean.run_boolean_batch(dec, queries, "and")
    res_or, _ = boolean.run_boolean_batch(dec, queries, "or")
    for q, ra, ro in zip(queries, res_and, res_or):
        terms = boolean.dedup_terms(q)
        sets = [set(docs[t].tolist()) for t in terms]
        expect_and = sorted(set.intersection(*sets))
        expect_or = sorted(set.union(*sets))
        np.testing.assert_array_equal(ra, np.asarray(expect_and, np.uint32))
        np.testing.assert_array_equal(ro, np.asarray(expect_or, np.uint32))


def test_ranked_queries_oracle(built):
    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    wdata = ranked.build_wand_data(base)
    rng = np.random.default_rng(23)
    queries = _random_queries(rng, len(docs), n=15)

    # brute-force oracle over the raw collection
    def brute_topk(terms, k=10):
        qf = {}
        for t in terms:
            qf[int(t)] = qf.get(int(t), 0) + 1
        scores = {}
        for t, f in qf.items():
            qw = ranked.query_term_weight(f, len(docs[t]), idx.num_docs)
            for d, fr in zip(docs[t], freqs[t]):
                w = float(
                    ranked.doc_term_weight(
                        np.asarray([fr]), wdata.norm_lens[[int(d)]]
                    )[0]
                )
                scores[int(d)] = scores.get(int(d), 0.0) + qw * w
        return sorted(scores.values(), reverse=True)[:k]

    for q in queries:
        got = ranked.ranked_or(idx, dec, wdata, q, k=10)
        gotw = ranked.wand(idx, dec, wdata, q, k=10)
        gotm = ranked.maxscore(idx, dec, wdata, q, k=10)
        expect = brute_topk(q)
        np.testing.assert_allclose(got, expect, rtol=2e-5)
        np.testing.assert_array_equal(got, gotw)
        np.testing.assert_array_equal(got, gotm)


def test_ranked_and_subset_of_or(built):
    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    wdata = ranked.build_wand_data(base)
    q = [0, 1]
    ra = ranked.ranked_and(idx, dec, wdata, q, k=10)
    ro = ranked.ranked_or(idx, dec, wdata, q, k=10000000)
    # every AND score appears among the OR scores
    for s in ra:
        assert np.isclose(ro, s, rtol=1e-5).any()


def test_device_batch_boolean_parity(built):
    """Device sort-merge batch engine vs the host merges (exact)."""
    from dint_tpu.query import device_batch

    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    rng = np.random.default_rng(31)
    queries = _random_queries(rng, len(docs), n=25) + [[]]
    res_and = device_batch.and_results_batch(dec, queries)
    counts_and = device_batch.boolean_count_batch(dec, queries, "and")
    counts_or = device_batch.boolean_count_batch(dec, queries, "or")
    for q, ra, ca, co in zip(queries, res_and, counts_and, counts_or):
        terms = boolean.dedup_terms(q)
        if not terms:
            assert ca == 0 and co == 0 and ra.shape[0] == 0
            continue
        want_and = boolean.and_query(dec._doc_cache, terms)
        want_or = boolean.or_query(dec._doc_cache, terms)
        np.testing.assert_array_equal(ra, want_and)
        assert int(ca) == want_and.shape[0]
        assert int(co) == want_or.shape[0]


def test_device_batch_ranked_parity(built):
    """Device batched union top-k vs the host oracle (reference
    tolerance: test_ranked_queries.cpp compares within 0.1%)."""
    from dint_tpu.query import device_batch

    idx, base, docs, freqs = built
    dec = TermDecoder(idx)
    wdata = ranked.build_wand_data(base)
    rng = np.random.default_rng(37)
    queries = _random_queries(rng, len(docs), n=12)
    got = device_batch.ranked_or_batch(idx, dec, wdata, queries, k=10)
    for q, g in zip(queries, got):
        want = ranked.ranked_or(idx, dec, wdata, q, k=10)
        assert g.shape[0] == want.shape[0]
        np.testing.assert_allclose(g, want, rtol=1e-3)


def test_endpoint_directory_bits_exact(built):
    """size_stats' EF directory size is the EXACT serialized size: an
    actual compact-EF write of the per-list start offsets (m_endpoints
    analogue, dict_freq_index.hpp:97-100) lands on exactly
    endpoint_directory_bits() bits (regression for the closed-form
    estimate this replaced)."""
    from dint_tpu.codecs import ef
    from dint_tpu.utils.bitio import BitBuilder

    idx = built[0]
    idx.ensure_docs_end()
    L = idx.num_lists
    starts = np.asarray(
        [idx.block_start(int(idx.block_ptr[i])) for i in range(L)],
        dtype=np.uint64,
    )
    u = max(int(idx.arena.shape[0]), 1)
    bb = BitBuilder()
    ef.compact_elias_fano.write(bb, starts, u, L, ef.PARAMS)
    assert bb.size == idx.endpoint_directory_bits()
    # decode back: directory is lossless
    got = ef.compact_elias_fano.decode_all(bb.words(), 0, u, L, ef.PARAMS)
    np.testing.assert_array_equal(got, starts)
    # size_stats self-consistency: components sum to the reported bytes
    st = idx.size_stats()
    assert st["docs_bytes"] > 0 and st["freqs_bytes"] > 0
    assert st["docs_bytes"] + st["freqs_bytes"] >= int(idx.arena.shape[0])
