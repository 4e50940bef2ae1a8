"""Dictionary building + DINT encode/decode oracle tests.

The reference has no DINT unit tests (SURVEY.md §4); these add the
coverage it lacked: dictionary build determinism, DP-parse optimality
vs greedy, pack-policy prefix compaction, selector bucketing, and exact
round-trips for all three dictionary kinds.
"""

import itertools

import numpy as np
import pytest

from dint_tpu.codecs import dint
from dint_tpu.config import NUM_SELECTORS, RESERVED, SMALL_EXCEPTION_LIMIT
from dint_tpu.dictionary import policies
from dint_tpu.dictionary.builder import build_dictionary
from dint_tpu.dictionary.dictionary import (
    MultiPackedDictionary,
    PackedDictionary,
    RectangularDictionary,
)
from dint_tpu.stats import block_stats, collectors


def make_gap_lists(rng, num=80, mean_len=400):
    """Gap streams with DINT-friendly structure: zero runs + small gaps."""
    lists = []
    for _ in range(num):
        n = max(1, int(rng.exponential(mean_len)))
        kind = rng.random(n)
        g = np.where(
            kind < 0.45, 0, np.where(kind < 0.9, rng.integers(1, 8, n), rng.integers(8, 3000, n))
        )
        # sprinkle rare huge values to exercise 4-byte exceptions
        huge = rng.random(n) < 0.002
        g = np.where(huge, rng.integers(1 << 17, 1 << 25, n), g)
        lists.append(g.astype(np.uint32))
    return lists


@pytest.fixture(scope="module")
def gap_lists():
    return make_gap_lists(np.random.default_rng(99))


@pytest.fixture(scope="module")
def single_stats(gap_lists):
    per_size = collectors.collect_single(gap_lists)
    total = sum(len(g) for g in gap_lists)
    ctx = block_stats._filter_sort(per_size, total)
    return block_stats.BlockStats(total, [ctx])


@pytest.fixture(scope="module")
def multi_stats(gap_lists):
    per_key = collectors.collect_multi(gap_lists)
    total = sum(len(g) for g in gap_lists)
    contexts = [
        block_stats._filter_sort(
            {s: per_key[(sel, s)] for s in collectors.TARGET_SIZES}, total
        )
        for sel in range(NUM_SELECTORS)
    ]
    return block_stats.BlockStats(total, contexts)


def test_selector_thresholds():
    blocks = np.zeros((7, 256), dtype=np.uint32)
    for i, mx in enumerate([0, 1, 2, 5, 100, 1000, 1 << 20]):
        blocks[i, 3] = mx
    sel = collectors.selectors_for_blocks(blocks)
    assert list(sel) == [0, 0, 1, 2, 3, 4, 5]
    # cross-check against the scalar reference formula
    for mx in [1, 2, 3, 4, 15, 16, 255, 256, 65535, 65536, (1 << 32) - 1]:
        expected = (
            collectors.ceil_log2_int(collectors.ceil_log2_int(mx + 1)) if mx > 1 else 0
        )
        b = np.zeros((1, 256), np.uint32)
        b[0, 0] = mx
        assert collectors.selectors_for_blocks(b)[0] == expected


def test_pack_policy_prefix_removal():
    targets = [[(1, 2), (1, 2, 3, 4), (1, 2, 3), (5,), (5, 6), (9,)]]
    out = policies.pack_compact(targets)
    assert (1, 2) not in out and (1, 2, 3) not in out and (5,) not in out
    assert (1, 2, 3, 4) in out and (5, 6) in out and (9,) in out
    # order: (size, lex)
    assert out == sorted(out, key=lambda t: (len(t), t))


def test_overlap_policy_substring_and_merge():
    targets = [[(2, 3), (1, 2, 3, 4), (3, 4, 5, 6)]]
    out = policies.overlap_compact(targets)
    assert (2, 3) not in out  # substring-contained
    # (1,2,3,4) + (3,4,5,6) overlap by 2 -> merged
    assert (1, 2, 3, 4, 5, 6) in out


def test_counting_exact(rng):
    lists = [np.array([1, 1, 2, 2] * 8, np.uint32)]
    per_size = collectors.collect_single(lists)
    w2, f2 = per_size[2]
    # windows of size 2 at offsets 0,2,..30: (1,1) x8 and (2,2) x8
    got = {tuple(w): int(f) for w, f in zip(w2, f2)}
    assert got == {(1, 1): 8, (2, 2): 8}
    w1, f1 = per_size[1]
    got1 = {tuple(w): int(f) for w, f in zip(w1, f1)}
    assert got1 == {(1,): 16, (2,): 16}


@pytest.mark.parametrize("kind", ["single", "rectangular"])
def test_dint_roundtrip_single(gap_lists, single_stats, kind):
    d = build_dictionary(single_stats, kind)
    lt = d.lookup_table()
    view = d.decode_view()
    total_greedy = total_opt = total_ints = 0
    for g in gap_lists[:40]:
        for enc_name, enc in (("greedy", dint.encode_greedy_single), ("opt", dint.encode_opt_single)):
            buf = enc(lt, g)
            out = np.zeros(len(g), dtype=np.uint32)
            end = dint.decode_single(view, buf, 0, len(g), out)
            assert end == len(buf), f"{enc_name}: trailing bytes"
            np.testing.assert_array_equal(out, g)
            if enc_name == "greedy":
                total_greedy += len(buf)
            else:
                total_opt += len(buf)
        total_ints += len(g)
    assert total_opt <= total_greedy  # DP is optimal for the cost model
    assert total_opt * 8 / total_ints < 48  # beats raw exceptions


def test_dp_optimal_vs_bruteforce(single_stats):
    d = build_dictionary(single_stats, "single")
    lt = d.lookup_table()
    rng = np.random.default_rng(5)

    def brute_cost(g):
        n = len(g)
        best = [10**9] * (n + 1)
        best[0] = 0
        for i in range(n):
            if best[i] >= 10**9:
                continue
            lrs = dint.zero_run_length(g, i, min(256, n - i))
            if lrs >= 16:
                for k, _ in dint._run_edges(lrs):
                    best[i + k] = min(best[i + k], best[i] + 1)
            for s in (16, 8, 4, 2, 1):
                ln = min(s, n - i)
                if lt.lookup_one(g[i : i + ln]) >= 0:
                    best[i + ln] = min(best[i + ln], best[i] + 1)
            c = 2 if g[i] < SMALL_EXCEPTION_LIMIT else 3
            best[i + 1] = min(best[i + 1], best[i] + c)
        return best[n]

    for _ in range(30):
        n = int(rng.integers(1, 40))
        g = rng.integers(0, 10, n).astype(np.uint32)
        _, _, cost = dint.opt_parse(lt, g)
        assert int(cost[n]) == brute_cost(g)


def test_runs_encode_small(single_stats):
    d = build_dictionary(single_stats, "single")
    lt = d.lookup_table()
    view = d.decode_view()
    g = np.zeros(300, dtype=np.uint32)
    buf = dint.encode_opt_single(lt, g)
    assert len(buf) <= 2 * 4  # 256-run + 32-run + maybe small pieces
    out = np.zeros(300, np.uint32)
    end = dint.decode_single(view, buf, 0, 300, out)
    assert end == len(buf)
    np.testing.assert_array_equal(out, g)


def test_dint_roundtrip_multi(gap_lists, multi_stats):
    d = build_dictionary(multi_stats, "multi")
    lt16, lt8 = d.lookup_tables()
    view = d.decode_view()
    for g in gap_lists[:30]:
        buf = dint.encode_multi_opt(lt16, lt8, g)
        out = np.zeros(len(g), dtype=np.uint32)
        end = dint.decode_multi(view, buf, 0, len(g), out)
        assert end == len(buf)
        np.testing.assert_array_equal(out, g)


def test_multi_not_worse_than_single(gap_lists, single_stats, multi_stats):
    ds = build_dictionary(single_stats, "single")
    dm = build_dictionary(multi_stats, "multi")
    lt = ds.lookup_table()
    lt16, lt8 = dm.lookup_tables()
    # On tiny synthetic stats the 6-way selector split starves each
    # context, so multi need not beat single here (it does at scale,
    # reference README.md:112-114); just bound the regression.
    tot_s = tot_m = 0
    for g in gap_lists:
        if len(g) >= 256:
            tot_s += len(dint.encode_opt_single(lt, g))
            tot_m += len(dint.encode_multi_opt(lt16, lt8, g))
    assert 0 < tot_m <= tot_s * 2.5


def test_dict_store_load_roundtrip(tmp_path, single_stats, multi_stats):
    d = build_dictionary(single_stats, "single")
    p = str(tmp_path / "d.single")
    d.store(p)
    d2 = PackedDictionary.load(p)
    np.testing.assert_array_equal(d.offsets, d2.offsets)
    np.testing.assert_array_equal(d.table, d2.table)

    m = build_dictionary(multi_stats, "multi")
    pm = str(tmp_path / "d.multi")
    m.store(pm)
    m2 = MultiPackedDictionary.load(pm)
    np.testing.assert_array_equal(m.offsets, m2.offsets)
    np.testing.assert_array_equal(m.start_offsets, m2.start_offsets)
    np.testing.assert_array_equal(m.table, m2.table)

    r = build_dictionary(single_stats, "rectangular")
    pr = str(tmp_path / "d.rect")
    r.store(pr)
    r2 = RectangularDictionary.load(pr)
    np.testing.assert_array_equal(r.table[: r.m_size], r2.table[: r2.m_size])


def test_stats_store_load_roundtrip(tmp_path, single_stats):
    p = str(tmp_path / "stats.bin")
    block_stats.store_stats(single_stats, p)
    loaded = block_stats.load_stats(p, multi=False)
    n = loaded.contexts[0].lengths.shape[0]
    assert n == min(single_stats.contexts[0].lengths.shape[0], 65536)
    np.testing.assert_array_equal(
        loaded.contexts[0].lengths, single_stats.contexts[0].lengths[:n]
    )
    np.testing.assert_array_equal(
        loaded.contexts[0].data, single_stats.contexts[0].data[:n]
    )


def test_lookup_batch_matches_scalar(single_stats):
    d = build_dictionary(single_stats, "single")
    lt = d.lookup_table()
    rng = np.random.default_rng(3)
    for L in (1, 2, 4, 8, 16):
        wins = rng.integers(0, 6, size=(200, L)).astype(np.uint32)
        batch = lt.lookup_batch(wins)
        for i in range(200):
            assert batch[i] == lt.lookup_one(wins[i])


def test_device_merge_matches_numpy_unique():
    """Device sort-merge dedup (stats/device_merge.py) vs the numpy
    weighted-unique, across window widths incl. the 16-wide worst case
    and u32 values above 2^31 (signed-sort order must not affect
    dedup exactness)."""
    import numpy as np

    from dint_tpu.stats import collectors, device_merge

    rng = np.random.default_rng(11)
    for s in (1, 2, 4, 8, 16):
        N = 5000
        pool = rng.integers(0, 2**32, (200, s), dtype=np.uint64).astype(
            np.uint32
        )
        windows = pool[rng.integers(0, 200, N)]
        weights = rng.integers(1, 5, N).astype(np.int64)
        got = device_merge.unique_weighted_device(windows, weights, force=True)
        assert got is not None
        gw, gc = got
        want_rows, want_w = collectors.unique_weighted(
            collectors._rows_view(windows), weights
        )
        want = {
            bytes(r.tobytes()): int(w) for r, w in zip(want_rows, want_w)
        }
        gotmap = {
            bytes(gw[i].tobytes()): int(gc[i]) for i in range(gw.shape[0])
        }
        assert gotmap == want, f"size {s}"


def test_device_merge_chunked_tree():
    """Tree-merge path (input larger than one chunk) stays exact."""
    import numpy as np

    from dint_tpu.stats import collectors, device_merge

    rng = np.random.default_rng(13)
    old = device_merge.CHUNK
    device_merge.CHUNK = 1 << 12
    try:
        s = 4
        N = 3 * (1 << 12) + 777
        pool = rng.integers(0, 2**32, (500, s), dtype=np.uint64).astype(
            np.uint32
        )
        windows = pool[rng.integers(0, 500, N)]
        weights = rng.integers(1, 3, N).astype(np.int64)
        got = device_merge.unique_weighted_device(windows, weights, force=True)
        assert got is not None
        gw, gc = got
        want_rows, want_w = collectors.unique_weighted(
            collectors._rows_view(windows), weights
        )
        want = {bytes(r.tobytes()): int(w) for r, w in zip(want_rows, want_w)}
        gotmap = {
            bytes(gw[i].tobytes()): int(gc[i]) for i in range(gw.shape[0])
        }
        assert gotmap == want
    finally:
        device_merge.CHUNK = old
