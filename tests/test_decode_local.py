"""Localized decode engine vs the scalar oracle (exactness gate)."""

import numpy as np
import pytest

from dint_tpu.codecs import dint
from dint_tpu.kernels import decode_local
from tests.test_batch_encode_decode import setup  # noqa: F401


def _roundtrip_units(view, bufs, ns, ctxs, b_bits):
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, ctxs, b_bits, view
    )
    eng = decode_local.LocalDecodeEngine(plan)
    outs = eng.decode_all()
    return eng.gather_units(outs, len(bufs), ns)


def test_local_matches_oracle_single(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 6000][:30]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    got = _roundtrip_units(
        view, bufs, [len(g) for g in lists], [0] * len(bufs), [16] * len(bufs)
    )
    for g, r in zip(lists, got):
        np.testing.assert_array_equal(r, g)


def test_local_exception_heavy(setup):  # noqa: F811
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(3)
    lists = []
    for _ in range(6):
        n = int(rng.integers(10, 900))
        g = rng.integers(0, 1 << 22, n).astype(np.uint32)
        g[rng.random(n) < 0.4] = 0
        lists.append(g)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    got = _roundtrip_units(
        view, bufs, [len(g) for g in lists], [0] * len(bufs), [16] * len(bufs)
    )
    for g, r in zip(lists, got):
        np.testing.assert_array_equal(r, g)


def test_local_runs_and_long_lists(setup):  # noqa: F811
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(9)
    g = np.where(rng.random(20000) < 0.7, 0, rng.integers(0, 500, 20000)).astype(
        np.uint32
    )
    from dint_tpu.codecs import encode_batch

    buf = encode_batch.encode_opt_list(lt, g)
    # single long unit spanning many sub-units
    got = _roundtrip_units(view, [buf], [len(g)], [0], [16])
    np.testing.assert_array_equal(got[0], g)


def test_native_planner_matches_python(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(21)
    lists = [g for g in gap_lists if 0 < len(g) <= 4000][:20]
    # add exception-heavy and run-heavy lists to cover all token kinds
    for _ in range(4):
        n = int(rng.integers(50, 1200))
        g = rng.integers(0, 1 << 22, n).astype(np.uint32)
        g[rng.random(n) < 0.35] = 0
        lists.append(g)
    lists.append(
        np.where(rng.random(9000) < 0.8, 0, rng.integers(0, 300, 9000))
        .astype(np.uint32)
    )
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    args = (arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
            [16] * len(bufs), view)
    py = decode_local._plan_stream_py(*args)
    nat = decode_local.plan_stream(*args, prefer_native=True)
    from dint_tpu.kernels import planner_native

    if planner_native.get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    for f in ("tokens", "meta", "table", "out_n", "unit_id", "out_pos"):
        np.testing.assert_array_equal(
            getattr(nat, f), getattr(py, f), err_msg=f
        )


def test_plan_save_load_roundtrip(setup, tmp_path):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 2000][:8]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
        [16] * len(bufs), view,
    )
    path = str(tmp_path / "plan.npz")
    decode_local.save_plan(plan, path)
    loaded = decode_local.load_plan(path)
    assert loaded is not None
    for f in ("tokens", "meta", "table", "out_n", "unit_id", "out_pos"):
        np.testing.assert_array_equal(getattr(loaded, f), getattr(plan, f))
    eng = decode_local.LocalDecodeEngine(loaded)
    got = eng.gather_units(eng.decode_all(), len(bufs), ns)
    for g, r in zip(lists, got):
        np.testing.assert_array_equal(r, g)
    # version mismatch -> cache miss, not a crash
    z = dict(np.load(path))
    z["version"] = np.asarray([0, 0, 0, 0])
    np.savez(path, **z)
    assert decode_local.load_plan(path) is None
    assert decode_local.load_plan(str(tmp_path / "absent.npz")) is None


def test_local_multi_blocks_b8_b16(setup):  # noqa: F811
    gap_lists, _, dm = setup
    lt16, lt8 = dm.lookup_tables()
    view = dm.decode_view()
    from dint_tpu.config import NUM_SELECTORS

    lists = [g for g in gap_lists if len(g) >= 256][:5]
    for g in lists:
        stream = dint.encode_multi_opt(lt16, lt8, g)
        # split per block like the index/vroom layout does
        pos = 0
        done = 0
        bufs, ns, ctxs, b_bits = [], [], [], []
        while done < len(g):
            size = min(256, len(g) - done)
            sc = stream[pos]
            tmp = np.zeros(size, np.uint32)
            if sc < NUM_SELECTORS:
                end = dint.decode_single(view, stream, pos + 1, size, tmp, 0, 16, sc)
                ctxs.append(sc)
                b_bits.append(16)
            else:
                end = dint.decode_single(
                    view, stream, pos + 1, size, tmp, 0, 8, sc - NUM_SELECTORS
                )
                ctxs.append(sc - NUM_SELECTORS)
                b_bits.append(8)
            bufs.append(bytes(stream[pos + 1 : end]))
            ns.append(size)
            pos = end
            done += size
        got = _roundtrip_units(view, bufs, ns, ctxs, b_bits)
        merged = np.concatenate(got)
        np.testing.assert_array_equal(merged, g)


def test_decode_chain_runs_distinct_and_complete(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 2000][:6]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
        [16] * len(bufs), view,
    )
    eng = decode_local.LocalDecodeEngine(plan)
    s1 = int(np.asarray(eng.decode_chain(1)))
    s3 = int(np.asarray(eng.decode_chain(3)))
    # deterministic and runs-dependent (each run folds into the salt)
    assert s1 == int(np.asarray(eng.decode_chain(1)))
    assert s3 != s1


def test_local_u32_boundary_values(setup):  # noqa: F811
    """Max-magnitude gaps (4-byte exceptions at the u32 edge) survive
    the salt wrap-add arithmetic exactly."""
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(41)
    lists = []
    for _ in range(4):
        n = int(rng.integers(20, 400))
        g = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        g[rng.random(n) < 0.2] = 0xFFFFFFFF
        g[rng.random(n) < 0.2] = 0
        lists.append(g)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    got = _roundtrip_units(
        view, bufs, [len(g) for g in lists], [0] * len(bufs), [16] * len(bufs)
    )
    for g, r in zip(lists, got):
        np.testing.assert_array_equal(r, g)


def test_decode_docids_all_matches_host_rebuild(setup):  # noqa: F811
    """Device docid rebuild (decode_docids_all with row carries) vs the
    host cumsum, including units that span multiple plan rows."""
    _, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(43)
    lists = []
    for _ in range(5):
        n = int(rng.integers(100, 1200))
        g = np.where(rng.random(n) < 0.5, 0, rng.integers(0, 60, n)).astype(
            np.uint32
        )
        lists.append(g)
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
        [16] * len(bufs), view,
    )
    eng = decode_local.LocalDecodeEngine(plan)
    bases = np.asarray([7, 0, 1000, 123456, 42], np.uint32)
    outs = eng.decode_docids_all(bases)
    got = eng.gather_units(outs, len(bufs), ns)
    for g, base, r in zip(lists, bases, got):
        want = (np.cumsum(g.astype(np.uint64) + 1) - 1 + base).astype(
            np.uint32
        )
        np.testing.assert_array_equal(r, want)


def test_split_width_class_engine_interpret(tmp_path, monkeypatch):
    """The TPU engine's packed-u16/i32 width-class split, run in pallas
    interpret mode on CPU: decode_all, gather_units (row permutation),
    decode_docids_all, and decode_chain must all match the unsplit XLA
    path bit-for-bit, including plans that contain BOTH classes."""
    import numpy as np

    from dint_tpu.codecs import dint
    from dint_tpu.dictionary.builder import build_dictionary
    from dint_tpu.kernels import decode_local
    from dint_tpu.stats import block_stats, collectors

    rng = np.random.default_rng(4)
    gap_lists = []
    for i in range(14):
        n = int(rng.integers(40, 900))
        g = np.where(
            rng.random(n) < 0.5, 0, rng.integers(1, 300, n)
        ).astype(np.uint32)
        if i % 3 == 0:  # large values force 4-byte exceptions ->
            g[rng.integers(0, n, 3)] = rng.integers(1 << 17, 1 << 25, 3)
        gap_lists.append(g)  # i32-class rows (table words >= 2^16)
    # all-zero lists (pure zero runs) -> all-zero local tables -> the
    # write-only zero class
    gap_lists.append(np.zeros(700, np.uint32))
    gap_lists.append(np.zeros(512, np.uint32))
    per_size = collectors.collect_single(gap_lists)
    ctx = block_stats._filter_sort(per_size, sum(map(len, gap_lists)))
    stats = block_stats.BlockStats(sum(map(len, gap_lists)), [ctx])
    d = build_dictionary(stats, "single")
    view = d.decode_view()
    bufs = [dint.encode_opt_single(d.lookup_table(), g) for g in gap_lists]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs],
        [len(g) for g in gap_lists], [0] * len(bufs), [16] * len(bufs),
        view,
    )

    # ground truth through the unsplit XLA path
    ref_eng = decode_local.LocalDecodeEngine(plan)
    assert not ref_eng.use_pallas
    ref_units = ref_eng.gather_units(
        ref_eng.decode_all(), len(bufs), [len(g) for g in gap_lists]
    )

    monkeypatch.setattr(decode_local, "FORCE_SPLIT_INTERPRET", True)
    eng = decode_local.LocalDecodeEngine(plan, row_tile=32)
    assert eng.use_pallas
    cls_rows = {m: r.shape[0] for m, r, _ in eng._classes}
    assert cls_rows[32] > 0 and cls_rows[16] > 0 and cls_rows[0] > 0, (
        "plan must contain zero, packed and i32 width classes", cls_rows)
    units = eng.gather_units(
        eng.decode_all(), len(bufs), [len(g) for g in gap_lists]
    )
    for a, b, g in zip(units, ref_units, gap_lists):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, g)

    # docid rebuild with permuted bases
    bases = np.arange(len(bufs), dtype=np.uint32) * 1000
    docs = eng.gather_units(
        eng.decode_docids_all(bases), len(bufs), [len(g) for g in gap_lists]
    )
    ref_docs = ref_eng.gather_units(
        ref_eng.decode_docids_all(bases), len(bufs),
        [len(g) for g in gap_lists],
    )
    for a, b in zip(docs, ref_docs):
        np.testing.assert_array_equal(a, b)

    # chain runs and is runs-dependent
    s2 = int(np.asarray(eng.decode_chain(2)))
    s3 = int(np.asarray(eng.decode_chain(3)))
    assert s2 != s3

    # large-plan chain flavor (sum-emitting kernels): force the
    # crossover to 0 so the sums path runs in interpret mode — it must
    # be deterministic, runs-dependent, and decode_all (always the
    # plain kernels) must be unaffected
    monkeypatch.setattr(decode_local, "CHAIN_SUMS_MIN_OUT_BYTES", 0)
    decode_local._pallas_split_fns.cache_clear()
    eng2 = decode_local.LocalDecodeEngine(plan, row_tile=32)
    units2 = eng2.gather_units(
        eng2.decode_all(), len(bufs), [len(g) for g in gap_lists]
    )
    for a, g in zip(units2, gap_lists):
        np.testing.assert_array_equal(a, g)
    t2 = int(np.asarray(eng2.decode_chain(2)))
    t3 = int(np.asarray(eng2.decode_chain(3)))
    assert t2 != t3
    assert t2 == int(np.asarray(eng2.decode_chain(2)))
    decode_local._pallas_split_fns.cache_clear()


def test_pack_plan_units_exact_and_budgeted(setup):  # noqa: F811
    """Multi-unit row packing: identical unit outputs through the
    engine, fewer rows, all three budgets respected."""
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 4000][:40]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns,
        [0] * len(bufs), [16] * len(bufs), view,
    )
    packed = decode_local.pack_plan_units(plan)
    assert packed.packed and packed.rows <= plan.rows
    # budgets hold for every merged row
    lens = (packed.meta >> 13).astype(np.int64)
    offs = (packed.meta & ((1 << 13) - 1)).astype(np.int64)
    assert int((offs + lens).max()) <= decode_local.TABLE_CLS
    assert int(packed.out_n.max()) <= decode_local.N_OUT
    # segment map covers every int exactly once per unit
    total = int(packed.seg_len.sum())
    assert total == sum(ns)
    # engine outputs identical through both plans
    eng_a = decode_local.LocalDecodeEngine(plan)
    eng_b = decode_local.LocalDecodeEngine(packed)
    got_a = eng_a.gather_units(eng_a.decode_all(), len(bufs), ns)
    got_b = eng_b.gather_units(eng_b.decode_all(), len(bufs), ns)
    for g, a, b in zip(lists, got_a, got_b):
        np.testing.assert_array_equal(a, g)
        np.testing.assert_array_equal(b, g)
    # docid rebuild refuses packed plans (index path keeps per-unit rows)
    with pytest.raises(AssertionError):
        eng_b.decode_docids_all(np.zeros(len(bufs), np.uint32))
