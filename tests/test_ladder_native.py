"""Fused native ladder build (qh_ladder_build) parity vs the numpy
oracle (ladder_plan_from_values over the flat-decoded stream).

The fused path decodes DINT units straight into per-width bit-packed
lane-major class arrays (native/query_host.cpp qh_ladder_build) —
classification (smallest ladder width >= the block max's bit width),
per-class out_base order, packed words, lane transpose, and tail must
all match the numpy pipeline exactly."""

import numpy as np
import pytest

from dint_tpu.io import collection, synth
from dint_tpu.index import stream as stream_mod
from dint_tpu.kernels import unpack_device
from dint_tpu.query import native_host
from dint_tpu.tools import decode as dtool
from dint_tpu.tools import encode


@pytest.fixture(scope="module")
def stream_env(tmp_path_factory):
    if not native_host.available():
        pytest.skip("native query engine unavailable")
    tmp = tmp_path_factory.mktemp("ladnat")
    base = str(tmp / "lc")
    # zipf lengths: short lists (partial tail blocks crossing units) +
    # long lists (dense run codewords / all widths)
    docs, freqs = synth.make_collection(90, 60000, seed=5, avg_len=400)
    collection.write_freq_collection(base, docs, freqs, 60000)
    import os

    old = os.getcwd()
    os.chdir(str(tmp))
    try:
        encode.main(["single_rect_dint", base + ".docs", "--out", "l.bin"])
    finally:
        os.chdir(old)
    dict_file = str(
        tmp / f"dict.{'lc'}.docs.rectangular.DSF-65536-16"
    )
    arena, meta = stream_mod.load_stream(str(tmp / "l.bin"))
    d = dtool.load_dictionary("single_rect_dint", dict_file)
    view = d.decode_view()
    lay = dtool.units_from_meta(arena, meta, False)
    return arena, meta, view, lay


def test_fused_classes_match_numpy_plan(stream_env):
    arena, meta, view, lay = stream_env
    res = native_host.decode_units_to_ladder(
        view, arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
        lay.b_bits,
    )
    assert res is not None
    classes, tail = res

    flat = native_host.decode_units_flat(
        view, arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
        lay.b_bits,
    )
    # the oracle must be the NUMPY pipeline (ladder_plan_from_values
    # itself now routes through qh_ladder_from_values by default)
    import os

    os.environ["DINT_TPU_NATIVE_LADDER"] = "0"
    try:
        want = unpack_device.ladder_plan_from_values(flat)
    finally:
        os.environ["DINT_TPU_NATIVE_LADDER"] = "1"

    want_classes = {c.b: c for c in want.classes}
    assert sorted(w for w, _, _ in classes) == sorted(want_classes)
    for w, lane, out_base in classes:
        wc = want_classes[w]
        np.testing.assert_array_equal(out_base, wc.out_base)
        ref_lane = unpack_device._lane_major(
            unpack_device._pack_w(wc.payload.astype(np.uint32), w)
        )
        assert lane.shape == ref_lane.shape, (w, lane.shape, ref_lane.shape)
        np.testing.assert_array_equal(lane, ref_lane)
    # tail == the numpy plan's single partial
    if tail.size:
        assert len(want.partials) == 1
        off, vals = want.partials[0]
        np.testing.assert_array_equal(tail, vals)
    else:
        assert not want.partials


def test_fused_engine_decodes_exactly(stream_env):
    arena, meta, view, lay = stream_env
    res = native_host.decode_units_to_ladder(
        view, arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
        lay.b_bits,
    )
    classes, tail = res
    total = int(np.asarray(meta.n, np.int64).sum())
    plan = unpack_device.ladder_plan_prepacked(classes, tail, total)
    eng = unpack_device.UnpackEngine(plan)
    got = eng.decode_all_ordered()
    flat = native_host.decode_units_flat(
        view, arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
        lay.b_bits,
    )
    np.testing.assert_array_equal(got, flat)


def test_from_values_matches_numpy_plan():
    """qh_ladder_from_values (the zoo/PEF plan path) vs the numpy
    pipeline, absolute AND base-relative (PEF docid) modes: same
    classification, packed words, out_base order, val_base, tail."""
    if not native_host.available():
        pytest.skip("native query engine unavailable")
    import os

    rng = np.random.default_rng(17)
    # absolute gap-like stream with all width classes + a tail
    parts = []
    for w in (1, 3, 7, 12, 19, 31):
        parts.append(
            rng.integers(0, 1 << w, size=777, dtype=np.uint32))
    parts.append(np.zeros(400, np.uint32))  # all-zero blocks
    flat = np.concatenate(parts)
    # monotone docid-like stream for base_relative
    mono = np.cumsum(
        rng.integers(1, 5000, size=3000, dtype=np.uint64)
    ).astype(np.uint32)
    for vals, rel in ((flat, False), (mono, True), (flat[:256], False),
                      (flat[:100], True), (np.zeros(0, np.uint32), False)):
        os.environ["DINT_TPU_NATIVE_LADDER"] = "0"
        try:
            want = unpack_device.ladder_plan_from_values(
                vals, base_relative=rel)
        finally:
            os.environ["DINT_TPU_NATIVE_LADDER"] = "1"
        got = unpack_device.ladder_plan_from_values(
            vals, base_relative=rel)
        # plans compare through the engine images: same classes (width,
        # out_base, packed device words, val_base) and same tail
        ew = unpack_device.UnpackEngine(want)
        eg = unpack_device.UnpackEngine(got)
        assert len(ew._dev) == len(eg._dev), (rel, len(vals))
        for (kw, ww, aw, bw), (kg, wg, ag, bg), mw, mg in zip(
                ew._dev, eg._dev, ew._meta, eg._meta):
            assert (kw, ww) == (kg, wg)
            np.testing.assert_array_equal(np.asarray(aw), np.asarray(ag))
            if bw is None:
                assert bg is None
            else:
                np.testing.assert_array_equal(
                    np.asarray(bw), np.asarray(bg))
            np.testing.assert_array_equal(mw[0], mg[0])
        assert len(want.partials) == len(got.partials)
        for (ow, tw), (og, tg) in zip(want.partials, got.partials):
            assert ow == og
            np.testing.assert_array_equal(tw, tg)
        # and the decoded stream round-trips exactly
        if len(vals):
            out = eg.decode_all_ordered()
            np.testing.assert_array_equal(np.asarray(out), vals)
