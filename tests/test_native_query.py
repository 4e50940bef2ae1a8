"""Native host query engine parity (query/native_host.py vs the
Python oracle engines).

The native engine re-implements the reference's query algorithms
(queries.hpp:34-573) in C++ over the DintIndex structure-of-arrays;
these tests gate it against the Python engines that are themselves
oracle-tested (test_lazy_queries.py): result counts match EXACTLY for
every op, top-k scores match within float tolerance, across all three
dictionary kinds, partial/full blocks, exception codewords, and edge
query shapes (single term, duplicate terms, empty lists).
"""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.query import boolean, lazy_decode, ranked
from dint_tpu.query import native_host
from dint_tpu.query.term_decode import TermDecoder

pytestmark = pytest.mark.skipif(
    not native_host.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module", params=["single", "rectangular", "multi"])
def built(request, tmp_path_factory):
    kind = request.param
    base = str(tmp_path_factory.mktemp(f"nq_{kind}") / "c")
    docs, freqs = synth.make_collection(50, 9000, seed=23, avg_len=140)
    # an empty list and a singleton exercise cursor edge cases
    docs[7] = np.zeros(0, np.uint32)
    freqs[7] = np.zeros(0, np.uint32)
    docs[8] = docs[8][:1]
    freqs[8] = freqs[8][:1]
    collection.write_freq_collection(base, docs, freqs, 9000)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, 9000)
    )
    idx = dint_index.build_index(
        base, kind=kind,
        cache_dir=str(tmp_path_factory.mktemp(f"nq_cache_{kind}")),
    )
    wd = ranked.build_wand_data(base)
    rng = np.random.default_rng(5)
    queries = []
    for _ in range(60):
        n = int(rng.integers(1, 5))
        queries.append([int(t) for t in rng.integers(0, 50, size=n)])
    queries.append([7])          # empty list only
    queries.append([7, 3])       # empty + real
    queries.append([8, 8, 8])    # duplicates (qf=3) on a singleton
    return idx, wd, queries


def test_boolean_counts_match(built):
    idx, wd, queries = built
    eng = native_host.NativeQueryEngine(idx, wd)
    for op in ("and", "or", "and_freq", "or_freq"):
        _, cnt, _ = eng.run(op, queries, runs=2)
        fn = (
            boolean.and_query_lazy
            if op.startswith("and")
            else boolean.or_query_lazy
        )
        for i, q in enumerate(queries):
            cache = lazy_decode.BlockCache(idx)
            want = int(fn(cache, q).shape[0])
            assert int(cnt[i]) == want, (op, i, q)


def test_long_run_blocks_decode_exactly():
    """Blocks dominated by >16-length zero-gap runs (consecutive
    docids — the DINT run codewords' whole-block case).  The decoders
    zero run tails explicitly rather than relying on a pre-zeroed
    buffer; a stale-buffer regression here corrupts docids/freqs on
    the SECOND block entered by a cursor (the reference's own decode
    has exactly that latent bug, vroom_env/dint_codecs.hpp:51)."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        base = td + "/c"
        rng = np.random.default_rng(99)
        docs, freqs = [], []
        # dense consecutive runs: docids i..i+n-1 (all-zero d-gaps)
        for start, n in [(0, 1000), (3000, 700), (100, 512), (7, 300)]:
            docs.append(np.arange(start, start + n, dtype=np.uint32))
            freqs.append(np.ones(n, np.uint32))
        # one mixed list: runs interleaved with jumps
        d = np.concatenate([
            np.arange(0, 200, dtype=np.uint32),
            np.arange(2000, 2300, dtype=np.uint32),
            np.arange(5000, 5600, dtype=np.uint32),
        ])
        docs.append(d)
        freqs.append((rng.integers(1, 4, d.shape[0])).astype(np.uint32))
        collection.write_freq_collection(base, docs, freqs, 8000)
        collection.write_sizes_file(
            base, synth.doc_sizes_from_lists(docs, freqs, 8000))
        for kind in ("single", "multi"):
            idx = dint_index.build_index(base, kind=kind, cache_dir=td)
            dec = TermDecoder(idx)
            for t, d in enumerate(docs):
                np.testing.assert_array_equal(
                    dec.decode_docids([t])[t], d, err_msg=f"{kind} {t}")
            wd = ranked.build_wand_data(base)
            eng = native_host.NativeQueryEngine(idx, wd)
            queries = [[0], [1], [0, 2], [0, 1, 2, 3, 4], [4, 2]]
            _, cnt, _ = eng.run("and", queries, runs=2)
            _, cnt_or, _ = eng.run("or", queries, runs=2)
            for i, q in enumerate(queries):
                cache = lazy_decode.BlockCache(idx)
                assert int(cnt[i]) == int(
                    boolean.and_query_lazy(cache, q).shape[0])
                cache = lazy_decode.BlockCache(idx)
                assert int(cnt_or[i]) == int(
                    boolean.or_query_lazy(cache, q).shape[0])
            _, cntw, scores = eng.run("wand", queries, runs=2, k=10)
            decoder = TermDecoder(idx)
            for i, q in enumerate(queries):
                decoder._lazy_cache = lazy_decode.BlockCache(idx)
                want = ranked.wand(idx, decoder, wdata=wd, terms=q, k=10)
                got = scores[i][scores[i] >= 0]
                np.testing.assert_allclose(
                    got, np.sort(want)[::-1], rtol=2e-4, atol=1e-5)
            # native flat unit decode over the same stream shape
            view = idx.docs_dict.decode_view()
            n_rows = view.offsets.shape[0] * view.offsets.shape[1]
            assert n_rows > 0


def test_and_collect_counts_match(built):
    """op 8 (pair_wise_intersect semantics: results materialized into a
    num_docs buffer) returns the same counts as the counting AND."""
    idx, wd, queries = built
    eng = native_host.NativeQueryEngine(idx, wd)
    pairs = [q for q in queries if len(set(q)) == 2]
    assert pairs, "fixture must contain 2-term queries"
    _, cnt, _ = eng.run("and_collect", pairs, runs=2)
    _, cnt_plain, _ = eng.run("and", pairs, runs=2)
    np.testing.assert_array_equal(cnt, cnt_plain)


def test_dict_copy_ns_runs(built):
    """The native dict-copy microbench loop (src/dict_perf_test.cpp:
    43-63 mirror) runs over a real DecodeView and returns sane ns."""
    idx, wd, queries = built
    dv = idx.docs_dict.decode_view()
    rng = np.random.default_rng(3)
    n_rows = dv.offsets.shape[0] * dv.offsets.shape[1]
    ridx = rng.integers(0, n_rows, 10000).astype(np.uint32)
    ns = native_host.dict_copy_ns(dv, ridx, runs=2)
    assert 0.0 < ns < 1e5


@pytest.mark.parametrize("op", ["wand", "maxscore", "ranked_and", "ranked_or"])
def test_ranked_scores_match(built, op):
    idx, wd, queries = built
    eng = native_host.NativeQueryEngine(idx, wd)
    decoder = TermDecoder(idx)
    fn = {
        "wand": ranked.wand,
        "maxscore": ranked.maxscore,
        "ranked_and": ranked.ranked_and,
        "ranked_or": ranked.ranked_or,
    }[op]
    _, cnt, scores = eng.run(op, queries, runs=2, k=10)
    for i, q in enumerate(queries):
        decoder._lazy_cache = lazy_decode.BlockCache(idx)
        want = fn(idx, decoder, wdata=wd, terms=q, k=10)
        got = scores[i][scores[i] >= 0]
        assert int(cnt[i]) == want.shape[0], (op, i, q)
        np.testing.assert_allclose(
            got, np.sort(want)[::-1], rtol=2e-4, atol=1e-5,
            err_msg=f"{op} query {i} {q}",
        )


def test_maxscore_promotion_demoted_cursor(tmp_path):
    """Regression: the single-essential fast path must only engage when
    the essential cursor actually sits at cur_doc.  Right after an
    insert promotes non_essential to m-1, cur_doc was computed as the
    min over the PREVIOUS essential range and can be a just-demoted
    cursor's docid below the remaining essential cursor's — the buggy
    fast path then scored cur_doc with the essential cursor's freq
    taken at a DIFFERENT document and advanced past it, permanently
    skipping that document's essential contribution (ADVICE r4 high).

    Shape: a strong term (huge freqs -> big max_weight) and a weak
    term (all-1 freqs).  k=1: the first scored doc raises the
    threshold past the weak term's bound, demoting it while it holds
    the minimum docid.  The skipped doc is the true top-1."""
    base = str(tmp_path / "m")
    nd = 10_000
    docs = [
        np.array([0, 500, 900], np.uint32),        # strong
        np.array([250, 500, 901], np.uint32),      # weak
        np.array([100, 600, 5000], np.uint32),     # filler (3-term case)
    ]
    freqs = [
        np.array([50, 60, 1], np.uint32),
        np.array([1, 1, 1], np.uint32),
        np.array([1, 1, 1], np.uint32),
    ]
    collection.write_freq_collection(base, docs, freqs, nd)
    sizes = synth.doc_sizes_from_lists(docs, freqs, nd)
    sizes[250] = 400          # demoted doc long -> low per-term weight
    sizes[500] = 2            # skipped doc short -> clear top-1
    collection.write_sizes_file(base, sizes)
    idx = dint_index.build_index(base, kind="single",
                                 cache_dir=str(tmp_path))
    wd = ranked.build_wand_data(base)
    eng = native_host.NativeQueryEngine(idx, wd)
    decoder = TermDecoder(idx)
    queries = [[0, 1], [1, 0], [0, 1, 2]]
    for k in (1, 2, 3):
        _, cnt, scores = eng.run("maxscore", queries, runs=2, k=k)
        for i, q in enumerate(queries):
            decoder._lazy_cache = lazy_decode.BlockCache(idx)
            want = ranked.maxscore(idx, decoder, wdata=wd, terms=q, k=k)
            got = scores[i][scores[i] >= 0]
            assert int(cnt[i]) == want.shape[0], (k, i, q)
            np.testing.assert_allclose(
                got, np.sort(want)[::-1], rtol=2e-4, atol=1e-5,
                err_msg=f"maxscore k={k} query {i} {q}")


def test_exception_codewords(tmp_path):
    """Gaps beyond 2^16 force 4-byte exception codewords; the native
    decode must stay exact through them (and through partial blocks)."""
    base = str(tmp_path / "x")
    rng = np.random.default_rng(11)
    nd = 40_000_000
    docs, freqs = [], []
    for n in (700, 300, 64, 1, 513):
        docs.append(
            np.sort(rng.choice(nd, size=n, replace=False)).astype(np.uint32)
        )
        freqs.append(rng.integers(1, 9, size=n).astype(np.uint32))
    collection.write_freq_collection(base, docs, freqs, nd)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs, nd)
    )
    idx = dint_index.build_index(base, kind="single", cache_dir=str(tmp_path))
    wd = ranked.build_wand_data(base)
    eng = native_host.NativeQueryEngine(idx, wd)
    queries = [[0, 1], [0, 1, 2, 3, 4], [3], [4, 0]]
    for op in ("and", "or"):
        _, cnt, _ = eng.run(op, queries, runs=2)
        fn = (
            boolean.and_query_lazy if op == "and" else boolean.or_query_lazy
        )
        for i, q in enumerate(queries):
            cache = lazy_decode.BlockCache(idx)
            assert int(cnt[i]) == int(fn(cache, q).shape[0])
    decoder = TermDecoder(idx)
    _, cnt, scores = eng.run("wand", queries, runs=2, k=10)
    for i, q in enumerate(queries):
        decoder._lazy_cache = lazy_decode.BlockCache(idx)
        want = ranked.wand(idx, decoder, wd, q, 10)
        got = scores[i][scores[i] >= 0]
        assert int(cnt[i]) == want.shape[0]
        np.testing.assert_allclose(got, np.sort(want)[::-1], rtol=2e-4,
                                   atol=1e-5)
