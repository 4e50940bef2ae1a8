"""Batched encoder vs scalar oracle, and XLA decoder vs oracle.

The batched DP mirrors the oracle's relaxation order and tie-breaking,
so its output must be BYTE-identical for units within one chunk.  The
XLA decoder must reproduce the oracle decode exactly (clean fast path
and exception chain-scan path).
"""

import numpy as np
import pytest

from dint_tpu.codecs import dint, encode_batch
from dint_tpu.config import NUM_SELECTORS
from dint_tpu.dictionary.builder import build_dictionary
from dint_tpu.kernels import decode_xla
from dint_tpu.stats import block_stats, collectors
from tests.test_dictionary_and_dint import make_gap_lists


@pytest.fixture(scope="module")
def setup():
    gap_lists = make_gap_lists(np.random.default_rng(7), num=60, mean_len=500)
    total = sum(len(g) for g in gap_lists)
    per_size = collectors.collect_single(gap_lists)
    ctx = block_stats._filter_sort(per_size, total)
    sstats = block_stats.BlockStats(total, [ctx])
    per_key = collectors.collect_multi(gap_lists)
    contexts = [
        block_stats._filter_sort(
            {s: per_key[(sel, s)] for s in collectors.TARGET_SIZES}, total
        )
        for sel in range(NUM_SELECTORS)
    ]
    mstats = block_stats.BlockStats(total, contexts)
    ds = build_dictionary(sstats, "single")
    dm = build_dictionary(mstats, "multi")
    return gap_lists, ds, dm


def test_batch_opt_matches_oracle_bytes(setup):
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    lists = [g for g in gap_lists if len(g) <= encode_batch.OPT_CHUNK][:30]
    batch, _ = encode_batch.encode_opt_lists(lt, lists)
    for g, got in zip(lists, batch):
        ref = dint.encode_opt_single(lt, g)
        assert got == ref, f"byte mismatch for n={len(g)}"


def test_batch_multi_matches_oracle_bytes(setup):
    gap_lists, _, dm = setup
    lt16, lt8 = dm.lookup_tables()
    lists = gap_lists[:20]
    streams, block_lens = encode_batch.encode_multi_opt_lists(dm, lists)
    for g, got, bl in zip(lists, streams, block_lens):
        ref = dint.encode_multi_opt(lt16, lt8, g)
        assert got == ref
        assert len(bl) == (len(g) + 255) // 256
        assert sum(bl) == len(got)


def test_long_list_chunked_roundtrip(setup):
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(1)
    g = np.where(rng.random(30000) < 0.5, 0, rng.integers(0, 2000, 30000)).astype(
        np.uint32
    )
    buf = encode_batch.encode_opt_list(lt, g)
    out = np.zeros(len(g), np.uint32)
    end = dint.decode_single(view, buf, 0, len(g), out)
    assert end == len(buf)
    np.testing.assert_array_equal(out, g)


def _xla_decode_lists(view, bufs, ns, b=16, ctxs=None):
    """Helper: decode byte streams via the XLA path, one bucket."""
    W = max(1, max(len(bf) // (b // 8) for bf in bufs))
    W = 1 << int(np.ceil(np.log2(max(2, W))))
    N = 1 << int(np.ceil(np.log2(max(2, max(ns)))))
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.cumsum([0] + [len(bf) for bf in bufs])[:-1]
    cw = decode_xla.tokens_from_arena(arena, starts, W, b)
    wv = np.asarray([len(bf) // (b // 8) for bf in bufs], np.int32)
    n = np.asarray(ns, np.int32)
    ctx = np.zeros(len(bufs), np.int32) if ctxs is None else np.asarray(ctxs, np.int32)
    clean = not (cw < 2).any()
    out, produced, _consumed = decode_xla.decode_units(
        cw,
        wv,
        n,
        ctx,
        view.lengths.astype(np.int32),
        view.offsets.astype(np.int32),
        view.table,
        b=b,
        n_out=N,
        assume_clean=clean,
    )
    return np.asarray(out), np.asarray(produced)


def test_xla_decode_matches_oracle_single(setup):
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 4096][:25]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    ns = [len(g) for g in lists]
    out, produced = _xla_decode_lists(view, bufs, ns)
    for i, g in enumerate(lists):
        assert produced[i] == len(g)
        np.testing.assert_array_equal(out[i, : len(g)], g)
        assert (out[i, len(g) :] == 0).all()


def test_xla_decode_exception_paths(setup):
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(11)
    # dense exceptions incl. values >= 2^16 and tiny values 0/1 in payload
    lists = []
    for _ in range(8):
        n = int(rng.integers(5, 600))
        g = rng.integers(0, 1 << 22, n).astype(np.uint32)
        g[rng.random(n) < 0.3] = 0
        lists.append(g)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    out, produced = _xla_decode_lists(view, bufs, [len(g) for g in lists])
    for i, g in enumerate(lists):
        assert produced[i] == len(g)
        np.testing.assert_array_equal(out[i, : len(g)], g)


def test_xla_decode_b8_blocks(setup):
    gap_lists, _, dm = setup
    lt16, lt8 = dm.lookup_tables()
    view = dm.decode_view()
    # produce multi streams, then decode each block via its selector
    lists = [g for g in gap_lists if len(g) >= 256][:6]
    for g in lists:
        stream = dint.encode_multi_opt(lt16, lt8, g)
        # split blocks by walking with the oracle to find boundaries
        pos = 0
        out_ref = np.zeros(len(g), np.uint32)
        bufs16, ns16, ctx16 = [], [], []
        bufs8, ns8, ctx8 = [], [], []
        done = 0
        while done < len(g):
            size = min(256, len(g) - done)
            sc = stream[pos]
            tmp = np.zeros(size, np.uint32)
            if sc < NUM_SELECTORS:
                end = dint.decode_single(view, stream, pos + 1, size, tmp, 0, 16, sc)
                bufs16.append(bytes(stream[pos + 1 : end]))
                ns16.append(size)
                ctx16.append(sc)
            else:
                end = dint.decode_single(
                    view, stream, pos + 1, size, tmp, 0, 8, sc - NUM_SELECTORS
                )
                bufs8.append(bytes(stream[pos + 1 : end]))
                ns8.append(size)
                ctx8.append(sc - NUM_SELECTORS)
            out_ref[done : done + size] = tmp
            pos = end
            done += size
        np.testing.assert_array_equal(out_ref, g)  # oracle self-check
        for bufs, ns, ctxs, b in ((bufs16, ns16, ctx16, 16), (bufs8, ns8, ctx8, 8)):
            if not bufs:
                continue
            out, produced = _xla_decode_lists(view, bufs, ns, b=b, ctxs=ctxs)
            off = 0
            k16 = 0
            # reassemble in original order
            idx = 0
            for j in range(len(bufs)):
                assert produced[j] == ns[j]
            # compare against oracle-decoded segments
            seg_starts = np.cumsum([0] + ns)[:-1]
            # match segments back by re-decoding each individually
            for j in range(len(bufs)):
                tmp = np.zeros(ns[j], np.uint32)
                dint.decode_single(view, bufs[j], 0, ns[j], tmp, 0, b, ctxs[j])
                np.testing.assert_array_equal(out[j, : ns[j]], tmp)


def test_xla_decode_tiny_b8_unit(setup):
    """Regression: b=8 chain state depth (5) exceeding tiny token counts."""
    _, _, dm = setup
    view = dm.decode_view()
    # one small exception in a b=8 stream: tokens [0, lo, hi] (W=3 < depth 5)
    buf = bytes([0, 0x2A, 0x01])
    out, produced = _xla_decode_lists(view, [buf], [1], b=8, ctxs=[0])
    assert produced[0] == 1 and out[0, 0] == 0x012A


def test_heuristic_greedy_env_switch(setup, monkeypatch):  # noqa: F811
    """DS2I_HEURISTIC_GREEDY=1 selects the greedy parse (decodes to the
    same ints; size >= the optimal parse's)."""
    import numpy as np

    from dint_tpu.codecs import dint, encode_batch

    gap_lists, ds, _ = setup
    lists = [g for g in gap_lists if 0 < len(g) <= 1500][:6]
    opt_streams, _ = encode_batch.encode_single_lists(ds, lists)
    monkeypatch.setenv("DS2I_HEURISTIC_GREEDY", "1")
    greedy_streams, _ = encode_batch.encode_single_lists(ds, lists)
    view = ds.decode_view()
    lt = ds.lookup_table()
    for g, ob, gb in zip(lists, opt_streams, greedy_streams):
        assert len(gb) >= len(ob)
        assert gb == dint.encode_greedy_single(lt, g)
        out = np.zeros(len(g), np.uint32)
        buf = np.frombuffer(gb, dtype=np.uint8)
        dint.decode_single(view, buf, 0, len(g), out, 0, 16, 0)
        np.testing.assert_array_equal(out, g)
