"""Multi-process sharded construction equals the serial build.

The semiasync_queue contract (semiasync_queue.hpp:12-95): parallel
prepare, in-order commit, output independent of scheduling.  Here the
grain is contiguous list ranges built by worker processes
(dint_tpu/parallel/build.py); these tests assert the committed index is
field-for-field identical to build_index's serial output.
"""

import numpy as np
import pytest

from dint_tpu.index import dint_index
from dint_tpu.io import collection, synth
from dint_tpu.parallel import build as pbuild


@pytest.fixture(scope="module")
def coll(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("shbuild") / "coll")
    docs, freqs = synth.make_collection(num_lists=40, num_docs=4000, seed=11)
    collection.write_freq_collection(base, docs, freqs, num_docs=4000)
    return base


def assert_index_equal(a: dint_index.DintIndex, b: dint_index.DintIndex):
    assert a.kind == b.kind and a.num_docs == b.num_docs
    np.testing.assert_array_equal(a.list_n, b.list_n)
    np.testing.assert_array_equal(a.block_ptr, b.block_ptr)
    np.testing.assert_array_equal(a.block_max, b.block_max)
    np.testing.assert_array_equal(a.docs_end, b.docs_end)
    np.testing.assert_array_equal(a.block_end, b.block_end)
    np.testing.assert_array_equal(a.arena, b.arena)


@pytest.mark.parametrize("kind", ["single", "multi"])
def test_sharded_serial_ranges_identical(coll, kind, tmp_path):
    cache = str(tmp_path)
    full = dint_index.build_index(coll, kind=kind, cache_dir=cache)
    sharded = pbuild.build_index_sharded(
        coll, kind=kind, cache_dir=cache, n_workers=3, serial=True
    )
    assert_index_equal(full, sharded)


def test_sharded_process_pool_identical(coll, tmp_path):
    cache = str(tmp_path)
    full = dint_index.build_index(coll, kind="single", cache_dir=cache)
    sharded = pbuild.build_index_sharded(
        coll, kind="single", cache_dir=cache, n_workers=2, serial=False
    )
    assert_index_equal(full, sharded)


def test_doc_sharded_build_and_serve_parity(coll, tmp_path):
    """Per-doc-range self-contained indexes + catalog (global BM25
    stats) served over the 8-device mesh == exhaustive ranked_or on the
    unsharded index."""
    import jax
    from jax.sharding import Mesh

    from dint_tpu.io import collection as coll_mod
    from dint_tpu.io import synth as synth_mod
    from dint_tpu.parallel import serve
    from dint_tpu.query import ranked
    from dint_tpu.query.term_decode import TermDecoder

    cache = str(tmp_path / "c")
    out = str(tmp_path / "shards")
    # 2 worker processes: shard builds are fully independent
    sharded = pbuild.build_doc_sharded(coll, out, n_shards=8, n_workers=2)
    # reload from disk (catalog + per-shard indexes round-trip)
    sharded = pbuild.DocShardedIndex.load(out)
    assert len(sharded.shards) == 8
    # shard num_docs cover the doc space exactly
    assert int(sharded.doc_hi[-1]) == sharded.num_docs

    full = dint_index.build_index(coll, kind="single", cache_dir=cache)
    view = coll_mod.open_freq_collection(coll)
    import os

    if not os.path.exists(coll + ".sizes"):
        docs = [d for d, _ in view]
        freqs_l = [f for _, f in view]
        coll_mod.write_sizes_file(
            coll, synth_mod.doc_sizes_from_lists(docs, freqs_l, view.num_docs)
        )
    wdata = ranked.build_wand_data(coll)
    dec = TermDecoder(full)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    rng = np.random.default_rng(5)
    nonempty = [t for t in range(full.num_lists) if full.list_n[t]]
    queries = [
        list(rng.choice(nonempty, size=int(rng.integers(1, 4)), replace=False))
        for _ in range(8)
    ]
    vals, ids = serve.serve_ranked_doc_sharded(
        mesh, sharded, wdata.norm_lens, queries, k=10
    )
    for qi, q in enumerate(queries):
        want = ranked.ranked_or(full, dec, wdata, q, k=10)
        got = vals[qi][: want.shape[0]]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    # boolean AND over the shard set: concatenation of local ANDs
    from dint_tpu.query import boolean as bool_mod

    and_queries = [q for q in queries if len(q) >= 2] + [[1, 2, 3]]
    got_and = serve.serve_boolean_doc_sharded(sharded, and_queries)
    decoded = dec.decode_docids(sorted({t for q in and_queries for t in q}))
    for q, g in zip(and_queries, got_and):
        want = bool_mod.and_query(decoded, q)
        np.testing.assert_array_equal(np.sort(g), np.sort(want))


def test_list_range_matches_full_slice(coll, tmp_path):
    cache = str(tmp_path)
    full = dint_index.build_index(coll, kind="single", cache_dir=cache)
    a, b = 7, 23
    part = dint_index.build_index(
        coll, kind="single", cache_dir=cache, list_range=(a, b)
    )
    np.testing.assert_array_equal(part.list_n, full.list_n[a:b])
    p0, p1 = int(full.block_ptr[a]), int(full.block_ptr[b])
    np.testing.assert_array_equal(
        part.block_max, full.block_max[p0:p1]
    )
    np.testing.assert_array_equal(
        np.asarray(part.block_ptr, np.int64),
        np.asarray(full.block_ptr[a : b + 1], np.int64) - p0,
    )
    s0 = int(full.block_end[p0 - 1]) if p0 > 0 else 0
    np.testing.assert_array_equal(
        np.asarray(part.block_end, np.int64),
        np.asarray(full.block_end[p0:p1], np.int64) - s0,
    )
    np.testing.assert_array_equal(
        part.arena, full.arena[s0 : int(full.block_end[p1 - 1])]
    )


def test_term_sharded_build_and_serve_parity(coll, tmp_path):
    """Per-term-range self-contained indexes (SURVEY §2.6's term
    partitioning) served via the all_to_all repartition step == the
    exhaustive ranked_or on the unsharded index."""
    import os

    import jax
    from jax.sharding import Mesh

    from dint_tpu.io import collection as coll_mod
    from dint_tpu.io import synth as synth_mod
    from dint_tpu.parallel import serve
    from dint_tpu.query import ranked
    from dint_tpu.query.term_decode import TermDecoder

    cache = str(tmp_path / "c")
    out = str(tmp_path / "tshards")
    tsh = pbuild.build_term_sharded(coll, out, n_shards=8, n_workers=2)
    # reload from disk (catalog + per-shard indexes round-trip)
    tsh = pbuild.TermShardedIndex.load(out)
    assert len(tsh.shards) == 8
    full = dint_index.build_index(coll, kind="single", cache_dir=cache)
    assert tsh.num_docs == full.num_docs
    np.testing.assert_array_equal(tsh.df, np.asarray(full.list_n))
    # term ranges tile the term space; each shard's lists equal the
    # full-index lists for its range (docids stay GLOBAL)
    assert int(tsh.term_lo[0]) == 0
    assert int(tsh.term_hi[-1]) == full.num_lists
    np.testing.assert_array_equal(tsh.term_lo[1:], tsh.term_hi[:-1])
    dec_full = TermDecoder(full)
    for j in (0, 3, 7):
        lo, hi = int(tsh.term_lo[j]), int(tsh.term_hi[j])
        sdec = TermDecoder(tsh.shards[j])
        for t in range(lo, min(hi, lo + 5)):
            np.testing.assert_array_equal(
                sdec.decode_docids([t - lo])[t - lo],
                dec_full.decode_docids([t])[t],
            )

    if not os.path.exists(coll + ".sizes"):
        view = coll_mod.open_freq_collection(coll)
        docs = [d for d, _ in view]
        freqs_l = [f for _, f in view]
        coll_mod.write_sizes_file(
            coll,
            synth_mod.doc_sizes_from_lists(docs, freqs_l, view.num_docs),
        )
    wdata = ranked.build_wand_data(coll)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    rng = np.random.default_rng(7)
    nonempty = [t for t in range(full.num_lists) if full.list_n[t]]
    queries = [
        list(rng.choice(nonempty, size=int(rng.integers(1, 5)), replace=False))
        for _ in range(8)
    ]
    # make at least one query span multiple term shards
    queries.append([int(nonempty[0]), int(nonempty[-1])])
    vals, ids = serve.serve_ranked_term_sharded(
        mesh, tsh, wdata.norm_lens, queries, k=10
    )
    for qi, q in enumerate(queries):
        want = ranked.ranked_or(full, dec_full, wdata, q, k=10)
        got = vals[qi][: want.shape[0]]
        np.testing.assert_allclose(got, want, rtol=1e-5)
