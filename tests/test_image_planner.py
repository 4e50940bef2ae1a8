"""Streaming image planner (native plan2) vs the LocalPlan pipeline.

The exactness gate: the engine-ready class arrays built shard-by-shard
by native/dint_planner.cpp plan2 must decode to the same ints as the
LocalPlan path (itself gated against the scalar oracle in
test_decode_local.py).  Off-TPU the ImageDecodeEngine runs the same
Pallas kernels in interpret mode.
"""

import numpy as np
import pytest

from dint_tpu.codecs import dint
from dint_tpu.kernels import decode_local, planner_native
from tests.test_batch_encode_decode import setup  # noqa: F401

pytestmark = pytest.mark.skipif(
    planner_native.get_lib() is None, reason="native planner unavailable"
)


def _mk_stream(view, bufs):
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return arena, starts, np.asarray([len(b) for b in bufs], np.int64)


def _image_roundtrip(view, bufs, ns, ctxs, b_bits, **kw):
    arena, starts, lens = _mk_stream(view, bufs)
    img = decode_local.plan_stream_image(
        arena, starts, lens, ns, ctxs, b_bits, view, **kw
    )
    assert img is not None
    eng = decode_local.ImageDecodeEngine(img)
    outs = eng.decode_all()
    return img, eng, eng.gather_units(outs, len(bufs), ns)


def _mixed_lists(gap_lists, rng):
    lists = [g for g in gap_lists if 0 < len(g) <= 4000][:15]
    for _ in range(3):  # exception-heavy
        n = int(rng.integers(50, 1200))
        g = rng.integers(0, 1 << 22, n).astype(np.uint32)
        g[rng.random(n) < 0.35] = 0
        lists.append(g)
    # run-heavy (drives the zero class) and a long multi-row list
    lists.append(np.zeros(900, np.uint32))
    g = np.where(
        rng.random(9000) < 0.7, 0, rng.integers(0, 500, 9000)
    ).astype(np.uint32)
    lists.append(g)
    return lists


def test_image_matches_collection_single(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(4)
    lists = _mixed_lists(gap_lists, rng)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    ns = [len(g) for g in lists]
    img, eng, got = _image_roundtrip(
        view, bufs, ns, [0] * len(bufs), [16] * len(bufs)
    )
    for g, r in zip(lists, got):
        np.testing.assert_array_equal(r, g)
    assert eng.total_ints() == sum(ns)
    # all three width classes exercised
    assert img.n0.shape[0] > 0
    assert img.n16.shape[0] > 0
    assert img.n32.shape[0] > 0


def test_image_matches_local_plan_outputs(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(7)
    lists = _mixed_lists(gap_lists, rng)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    ns = [len(g) for g in lists]
    arena, starts, lens = _mk_stream(view, bufs)
    plan = decode_local.plan_stream(
        arena, starts, lens, ns, [0] * len(bufs), [16] * len(bufs), view,
        pack_units=True,
    )
    old = decode_local.LocalDecodeEngine(plan)
    old_units = old.gather_units(old.decode_all(), len(bufs), ns)
    _, _, new_units = _image_roundtrip(
        view, bufs, ns, [0] * len(bufs), [16] * len(bufs)
    )
    for a, b in zip(old_units, new_units):
        np.testing.assert_array_equal(a, b)


def test_image_sharded_and_threaded_deterministic(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(11)
    lists = _mixed_lists(gap_lists, rng)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    ns = [len(g) for g in lists]
    arena, starts, lens = _mk_stream(view, bufs)
    args = (arena, starts, lens, ns, [0] * len(bufs), [16] * len(bufs), view)
    one = decode_local.plan_stream_image(*args, shard_ints=10**12, threads=1)
    # tiny shards + a thread pool: identical image
    many = decode_local.plan_stream_image(*args, shard_ints=2000, threads=3)
    import dataclasses

    for f in dataclasses.fields(decode_local.DecodeImage):
        a, b = getattr(one, f.name), getattr(many, f.name)
        # shard-local FFD packs rows differently; the IMAGE may differ
        # row-for-row, but per-class totals and decoded units must match
        if f.name.startswith("seg_"):
            continue
        assert a.dtype == b.dtype
    assert one.total_ints() == many.total_ints()
    e1 = decode_local.ImageDecodeEngine(one)
    e2 = decode_local.ImageDecodeEngine(many)
    u1 = e1.gather_units(e1.decode_all(), len(bufs), ns)
    u2 = e2.gather_units(e2.decode_all(), len(bufs), ns)
    for a, b in zip(u1, u2):
        np.testing.assert_array_equal(a, b)
    for g, r in zip(lists, u2):
        np.testing.assert_array_equal(r, g)


def test_image_save_load_roundtrip(setup, tmp_path):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 2000][:8]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    ns = [len(g) for g in lists]
    arena, starts, lens = _mk_stream(view, bufs)
    img = decode_local.plan_stream_image(
        arena, starts, lens, ns, [0] * len(bufs), [16] * len(bufs), view
    )
    p = str(tmp_path / "img.npz")
    decode_local.save_image(img, p)
    back = decode_local.load_image(p)
    assert back is not None
    import dataclasses

    for f in dataclasses.fields(decode_local.DecodeImage):
        np.testing.assert_array_equal(getattr(img, f.name),
                                      getattr(back, f.name))


def test_image_multi_selector_stream(setup):  # noqa: F811
    """Multi-kind units (selector contexts, 16- and 8-bit codewords)."""
    from dint_tpu.codecs import encode_batch
    from dint_tpu.config import NUM_SELECTORS

    gap_lists, _, dm = setup
    view = dm.decode_view()
    lists = [g for g in gap_lists if len(g) > 0][:12]
    streams, block_lens = encode_batch.encode_multi_opt_lists(dm, lists)
    bufs = []
    ns = []
    ctxs = []
    b_bits = []
    for g, stream, bl in zip(lists, streams, block_lens):
        off = 0
        for bi, ln in enumerate(bl):
            unit = stream[off : off + ln]
            off += ln
            sc = unit[0]
            bufs.append(unit[1:])
            ns.append(min(256, len(g) - bi * 256))
            ctxs.append(int(sc) if sc < NUM_SELECTORS
                        else int(sc) - NUM_SELECTORS)
            b_bits.append(16 if sc < NUM_SELECTORS else 8)
    _, _, got = _image_roundtrip(view, bufs, ns, ctxs, b_bits)
    pos = 0
    for g in lists:
        for s in range(0, len(g), 256):
            chunk = g[s : s + 256]
            np.testing.assert_array_equal(got[pos], chunk)
            pos += 1
