"""EF sequence family property tests.

Mirrors the reference's generic-sequence property pattern
(test/test_generic_sequence.hpp:7-26): random (strictly) monotone
sequences over varied densities, round-tripped through every sequence
type; sizes must equal the reference layout's bitsize; freq_index
round-trips on-disk like test_freq_index.cpp:43-66.
"""

import numpy as np
import pytest

from dint_tpu.codecs import ef
from dint_tpu.index import freq_index
from dint_tpu.io import collection, synth
from dint_tpu.utils import bitio
from dint_tpu.utils.bitio import BitBuilder


def random_sequence(rng, universe, n, strict=True):
    if strict:
        v = np.sort(rng.choice(universe, size=n, replace=False))
    else:
        v = np.sort(rng.integers(0, universe, size=n))
    return v.astype(np.uint64)


def test_bitio_roundtrip(rng):
    bb = BitBuilder()
    vals, widths = [], []
    r = np.random.default_rng(0)
    for _ in range(200):
        w = int(r.integers(1, 57))
        v = int(r.integers(0, 1 << w))
        bb.append_bits(v, w)
        vals.append(v)
        widths.append(w)
    words = bb.words()
    pos = 0
    for v, w in zip(vals, widths):
        assert bitio.read_bits_scalar(words, pos, w) == v
        pos += w


def test_gamma_delta_roundtrip():
    bb = BitBuilder()
    vals = [0, 1, 2, 5, 100, 10**6, 2**40]
    for v in vals:
        ef.write_gamma(bb, v)
        ef.write_delta(bb, v)
    r = bitio.BitReader(bb.words(), 0)
    for v in vals:
        assert ef.read_gamma(r) == v
        assert ef.read_delta(r) == v


SEQS = {
    "ef": ef.compact_elias_fano,
    "rb": ef.compact_ranked_bitvector,
    "indexed": ef.indexed_sequence,
}


@pytest.mark.parametrize("name", sorted(SEQS))
@pytest.mark.parametrize("density", [1.1, 2.0, 10.0, 100.0])
def test_monotone_sequences(rng, name, density):
    seq = SEQS[name]
    n = 500
    universe = max(int(n * density), n + 1)
    v = random_sequence(np.random.default_rng(n), universe, n)
    bb = BitBuilder()
    bb.append_bits(3, 2)  # misalign start
    off = bb.size
    seq.write(bb, v, universe, n, ef.PARAMS)
    assert bb.size - off == seq.bitsize(ef.PARAMS, universe, n)
    got = seq.decode_all(bb.words(), off, universe, n, ef.PARAMS)
    np.testing.assert_array_equal(got, v)


def test_all_ones_dispatch():
    n = 64
    v = np.arange(n, dtype=np.uint64)
    bb = BitBuilder()
    ef.indexed_sequence.write(bb, v, n, n, ef.PARAMS)
    assert bb.size == 0  # implicit all-ones costs zero bits
    got = ef.indexed_sequence.decode_all(bb.words(), 0, n, n, ef.PARAMS)
    np.testing.assert_array_equal(got, v)


@pytest.mark.parametrize("density", [1.05, 3.0, 50.0])
def test_strict_and_positive(rng, density):
    n = 400
    universe = max(int(n * density), n + 1)
    v = random_sequence(np.random.default_rng(7), universe, n)
    bb = BitBuilder()
    ef.strict_sequence.write(bb, v, universe, n, ef.PARAMS)
    got = ef.strict_sequence.decode_all(bb.words(), 0, universe, n, ef.PARAMS)
    np.testing.assert_array_equal(got, v)

    pos_vals = np.random.default_rng(8).integers(1, 50, n).astype(np.uint64)
    ps = ef.positive_sequence(ef.strict_sequence)
    bb2 = BitBuilder()
    universe2 = int(pos_vals.sum()) + 1
    ps.write(bb2, pos_vals, universe2, n, ef.PARAMS)
    got2 = ps.decode_all(bb2.words(), 0, universe2, n, ef.PARAMS)
    np.testing.assert_array_equal(got2, pos_vals)


@pytest.mark.parametrize("uniform", [False, True])
@pytest.mark.parametrize("n", [1, 2, 100, 1000])
def test_partitioned_sequences(rng, uniform, n):
    r = np.random.default_rng(n + uniform)
    universe = max(4 * n, n + 2)
    v = random_sequence(r, universe, n)
    seq = (
        ef.uniform_partitioned_sequence()
        if uniform
        else ef.partitioned_sequence()
    )
    bb = BitBuilder()
    seq.write(bb, v, universe, n, ef.PARAMS)
    got = seq.decode_all(bb.words(), 0, universe, n, ef.PARAMS)
    np.testing.assert_array_equal(got, v)


def test_partitioned_tight_universe():
    # last value == universe-1 triggers the tight-universe delta(0) path
    v = np.asarray([0, 5, 9], dtype=np.uint64)
    seq = ef.partitioned_sequence()
    bb = BitBuilder()
    seq.write(bb, v, 10, 3, ef.PARAMS)
    got = seq.decode_all(bb.words(), 0, 10, 3, ef.PARAMS)
    np.testing.assert_array_equal(got, v)


def test_optimal_partition_beats_single_block():
    # clustered values: partitioning must reduce cost vs one block
    r = np.random.default_rng(3)
    a = np.sort(r.choice(1000, 300, replace=False))
    b = np.sort(r.choice(1000, 300, replace=False)) + 1_000_000
    v = np.concatenate([a, b]).astype(np.uint64)
    cost = lambda u, m: ef.indexed_sequence.bitsize(ef.PARAMS, u, m) + 64
    parts = ef.optimal_partition(v, 1_001_000, cost, 0.03, 0.3)
    total = 0
    cur = 0
    base = int(v[0])
    for e in parts:
        part = v[cur:e]
        total += cost(int(part[-1]) - base + 1, e - cur)
        base = int(part[-1]) + 1
        cur = e
    assert total < cost(1_001_000, 600)
    assert parts[-1] == 600


@pytest.mark.parametrize("kind", ["ef", "single", "uniform", "opt"])
def test_freq_index_roundtrip(tmp_path, kind):
    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(60, 8000, seed=13, avg_len=60)
    collection.write_freq_collection(base, docs, freqs, 8000)
    idx = freq_index.build_freq_index(base, kind)
    freq_index.verify_freq_index(idx, base)
    stats = idx.size_stats()
    assert stats["postings"] == sum(len(d) for d in docs)
    assert 0 < stats["docs_bpi"] < 64
    # on-disk round trip (test_freq_index.cpp:43-66 discipline)
    p = str(tmp_path / f"idx_{kind}")
    idx.save(p)
    idx2 = freq_index.FreqIndexEF.load(p)
    freq_index.verify_freq_index(idx2, base)


def test_pef_beats_ef_on_clustered_docs(tmp_path):
    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(80, 50000, seed=17, avg_len=200, cluster=0.8)
    collection.write_freq_collection(base, docs, freqs, 50000)
    bpis = {}
    for kind in ("ef", "opt"):
        idx = freq_index.build_freq_index(base, kind)
        bpis[kind] = idx.size_stats()["docs_bpi"]
    assert bpis["opt"] <= bpis["ef"] * 1.05


def test_ef_device_decode_matches_host():
    """Gather-free device EF decode (codecs/ef_device.py) vs the host
    decode_all, batched across lists of mixed shapes/offsets."""
    from dint_tpu.codecs import ef_device

    rng = np.random.default_rng(55)
    bb = BitBuilder()
    specs = []
    wants = []
    bb.append_bits(int(rng.integers(0, 2**20)), 37)  # misalign the base
    for (universe, n) in [
        (1, 1), (100, 5), (100, 100), (1 << 20, 700), (1 << 31, 900),
        (5000, 64), ((1 << 32) - 1, 257), (263, 200),
    ]:
        vals = np.sort(
            rng.choice(universe, size=min(n, universe), replace=False)
        ).astype(np.uint64)
        n = vals.shape[0]
        off = bb.size
        ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
        specs.append((off, universe, n))
        wants.append(vals)
    words = bb.words()
    got = ef_device.decode_lists(words, specs, ef.PARAMS)
    for g, want, (off, universe, n) in zip(got, wants, specs):
        host = ef.compact_elias_fano.decode_all(words, off, universe, n, ef.PARAMS)
        np.testing.assert_array_equal(host, want)
        np.testing.assert_array_equal(g, want, err_msg=f"u={universe} n={n}")


def test_ef_term_decoder_device_parity(tmp_path):
    """EFTermDecoder with the device-EF engine forced on (CPU backend:
    same XLA graph) matches the host per-list decode exactly."""
    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(40, 6000, seed=29, avg_len=80)
    collection.write_freq_collection(base, docs, freqs, 6000)
    idx = freq_index.build_freq_index(base, "ef")
    dev = freq_index.EFTermDecoder(idx, device_ef=True)
    host = freq_index.EFTermDecoder(idx, device_ef=False)
    terms = [t for t in range(len(docs)) if len(docs[t])][:25]
    got = dev.decode_docids(terms)
    want = host.decode_docids(terms)
    for t in terms:
        np.testing.assert_array_equal(got[t], want[t], err_msg=f"term {t}")
        np.testing.assert_array_equal(got[t], docs[t])


def test_ef_write_exact_sampling_multiples():
    """n an exact multiple of 2^log_sampling1 (and zero counts hitting
    2^log_sampling0 multiples) must write like the reference: sample
    slots whose index equals n (or the total zero count) stay zero
    (compact_elias_fano.hpp:91-99,120-126)."""
    rng = np.random.default_rng(77)
    ls1 = ef.PARAMS.ef_log_sampling1
    n = 1 << (ls1 + 1)  # exact multiple
    universe = n * 4
    vals = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
    bb = BitBuilder()
    ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
    got = ef.compact_elias_fano.decode_all(bb.words(), 0, universe, n, ef.PARAMS)
    np.testing.assert_array_equal(got, vals)


def test_rb_write_exact_sampling_multiple():
    """Ranked bitvector with n an exact multiple of 2^rb_log_sampling1:
    the reference's write loop runs i < n, so the pointer slot whose
    index equals n is allocated but never written
    (compact_ranked_bitvector.hpp:101-106).  The batch writer used to
    index v[n] and crash (found by the PEF ladder test's dense-cluster
    list)."""
    rng = np.random.default_rng(99)
    p = ef.PARAMS
    n = 1 << p.rb_log_sampling1  # exact multiple -> 1 unwritten slot
    universe = n * 2
    vals = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
    bb = BitBuilder()
    ef.compact_ranked_bitvector.write(bb, vals, universe, n, p)
    got = ef.compact_ranked_bitvector.decode_all(
        bb.words(), 0, universe, n, p
    )
    np.testing.assert_array_equal(got, vals)
    # enumerator still walks it
    from dint_tpu.codecs import ef_enum

    e = ef_enum.RBEnumerator(bb.words(), 0, universe, n, p)
    for k in (0, 1, n // 2, n - 1):
        assert e.move(k) == vals[k], k


def test_native_opt_partition_matches_python_dp():
    """The native PEF partitioning DP (native/ef_decode.cpp
    opt_partition) must produce EXACTLY the python oracle's endpoints
    (same double arithmetic, same window sweep) for both base-cost
    kinds, so streams stay byte-identical whichever path runs."""
    from dint_tpu.utils import bitnative

    if bitnative.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(31)
    p = ef.PARAMS
    for kind, base in (("indexed", ef.indexed_sequence),
                       ("strict", ef.strict_sequence)):
        for trial in range(12):
            n = int(rng.integers(1, 6000))
            universe = n + int(rng.integers(1, 500000))
            vals = np.sort(
                rng.choice(universe, size=n, replace=False)
            ).astype(np.uint64)
            if kind == "strict":
                universe = int(vals[-1]) + 1
            cost = lambda u, m: base.bitsize(p, u, m) + ef.CONF.fix_cost
            want = ef.optimal_partition(
                vals, universe, cost, ef.CONF.eps1, ef.CONF.eps2
            )
            got = bitnative.opt_partition(
                vals, universe, p, ef.CONF.eps1, ef.CONF.eps2,
                ef.CONF.fix_cost, kind == "strict",
            )
            assert got == want, (kind, trial, n, got[:5], want[:5])
    # dense cluster (all-ones partitions) and tiny-n edges
    for n in (1, 2, 511, 512):
        vals = (100 + np.arange(n)).astype(np.uint64)
        universe = int(vals[-1]) + 1
        cost = lambda u, m: ef.indexed_sequence.bitsize(p, u, m) + ef.CONF.fix_cost
        want = ef.optimal_partition(vals, universe, cost,
                                    ef.CONF.eps1, ef.CONF.eps2)
        got = bitnative.opt_partition(vals, universe, p, ef.CONF.eps1,
                                      ef.CONF.eps2, ef.CONF.fix_cost, False)
        assert got == want, n


def test_ef_zero_pointer_slots_match_reference_loop():
    """0-pointer slot contents must equal the reference writer's
    set_ptr0s output byte-for-byte: the stored value is the position of
    the zero with 0-based rank ptr0<<log_sampling0, i.e.
    (ptr0<<log0) + rank_end (compact_elias_fano.hpp:85-99).  Emulates
    the reference loop and diffs every slot (regression for an
    off-by-one where slots held the position of the previous zero)."""
    rng = np.random.default_rng(123)
    p = ef.PARAMS
    log0 = p.ef_log_sampling0
    checked = 0
    for _ in range(40):
        n = int(rng.integers(1, 2500))
        universe = n + int(rng.integers(1, 150000))
        vals = np.sort(
            rng.choice(universe, size=n, replace=False)
        ).astype(np.uint64)
        of = ef.ef_offsets(0, universe, n, p)
        # emulate the reference write loop's set_ptr0s calls
        slots = {}

        def set_ptr0s(begin, end, rank_end):
            begin_zeros = begin - rank_end
            end_zeros = end - rank_end
            ptr0 = -(-begin_zeros // (1 << log0))
            while (ptr0 << log0) < end_zeros:
                if ptr0:
                    slots[ptr0 - 1] = (ptr0 << log0) + rank_end
                ptr0 += 1

        last_high = 0
        for i, v in enumerate(vals.tolist()):
            high = (v >> of.lower_bits) + i + 1
            set_ptr0s(last_high + 1, high, i)
            last_high = high
        set_ptr0s(last_high + 1, of.higher_bits_length, n)

        bb = BitBuilder()
        ef.compact_elias_fano.write(bb, vals, universe, n, p)
        words = bb.words()
        for sl in range(of.pointers0):
            pos = np.array(
                [of.pointers0_offset + sl * of.pointer_size], dtype=np.uint64
            )
            got = int(bitio.read_fields(words, pos, of.pointer_size)[0])
            assert got == slots.get(sl, 0), (n, universe, sl, got, slots.get(sl))
        checked += of.pointers0
    assert checked > 0


def _random_monotone(rng, universe, n, strict=False):
    if strict:
        vals = np.sort(rng.choice(universe, size=n, replace=False))
    else:
        vals = np.sort(rng.integers(0, universe, size=n))
    return vals.astype(np.uint64)


@pytest.mark.parametrize("density", [0.01, 0.2, 0.9])
def test_ef_enumerator_move_next_next_geq(density):
    """The reference's generic sequence exercisers
    (test_generic_sequence.hpp:28-164) applied to the EF enumerator:
    full enumeration via next(), random move()s, and randomized
    next_geq probes inside gaps / at members / beyond the universe —
    all checked against the decode_all oracle."""
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(2, 3000))
        universe = max(int(n / density), n + 1)
        vals = _random_monotone(rng, universe, n, strict=True)
        bb = BitBuilder()
        ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
        words = bb.words()
        e = ef_enum.EFEnumerator(words, 0, universe, n)

        # full forward enumeration
        got = [e.move(0)] + [e.next() for _ in range(n - 1)]
        np.testing.assert_array_equal(np.asarray(got, np.uint64), vals)
        assert e.next() == universe and e.position() == n

        # random access
        for k in rng.integers(0, n, 30):
            e2 = ef_enum.EFEnumerator(words, 0, universe, n)
            assert e2.move(int(k)) == vals[k], k
        # forward moves on one enumerator
        e3 = ef_enum.EFEnumerator(words, 0, universe, n)
        ks = np.sort(rng.integers(0, n, 20))
        for k in ks:
            assert e3.move(int(k)) == vals[k]

        # next_geq probes
        probes = np.concatenate([
            rng.integers(0, universe + 2, 40).astype(np.int64),
            vals[rng.integers(0, n, 10)].astype(np.int64),
        ])
        for lb in probes:
            e4 = ef_enum.EFEnumerator(words, 0, universe, n)
            got_v = e4.next_geq(int(lb))
            tail = vals[vals >= lb]
            if len(tail):
                assert got_v == tail[0], (lb, got_v, tail[0])
                assert e4.position() == int(np.searchsorted(vals, lb))
            else:
                assert got_v == universe and e4.position() == n
        # monotone next_geq chain on one enumerator
        e5 = ef_enum.EFEnumerator(words, 0, universe, n)
        for lb in np.sort(probes):
            got_v = e5.next_geq(int(lb))
            tail = vals[vals >= lb]
            want = tail[0] if len(tail) else universe
            assert got_v == want, (lb, got_v, want)


def test_rb_and_indexed_and_strict_enumerators():
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(11)
    # ranked bitvector: dense sequence
    for trial in range(4):
        n = int(rng.integers(50, 2000))
        universe = int(n * rng.uniform(1.05, 1.5))
        vals = _random_monotone(rng, universe, n, strict=True)
        bb = BitBuilder()
        ef.compact_ranked_bitvector.write(bb, vals, universe, n, ef.PARAMS)
        words = bb.words()
        e = ef_enum.RBEnumerator(words, 0, universe, n)
        got = [e.move(0)] + [e.next() for _ in range(n - 1)]
        np.testing.assert_array_equal(np.asarray(got, np.uint64), vals)
        for lb in rng.integers(0, universe + 2, 30):
            e2 = ef_enum.RBEnumerator(words, 0, universe, n)
            tail = vals[vals >= lb]
            want = tail[0] if len(tail) else universe
            assert e2.next_geq(int(lb)) == want, lb

    # indexed dispatch across densities
    for density in (0.02, 0.5, 1.0):
        n = 700
        universe = max(int(n / density), n)
        vals = (
            np.arange(n, dtype=np.uint64)
            if density == 1.0
            else _random_monotone(rng, universe, n, strict=True)
        )
        bb = BitBuilder()
        ef.indexed_sequence.write(bb, vals, universe, n, ef.PARAMS)
        words = bb.words()
        e = ef_enum.indexed_enumerator(words, 0, universe, n)
        got = [e.move(0)] + [e.next() for _ in range(n - 1)]
        np.testing.assert_array_equal(np.asarray(got, np.uint64), vals)
        for lb in rng.integers(0, universe + 2, 25):
            e2 = ef_enum.indexed_enumerator(words, 0, universe, n)
            tail = vals[vals >= lb]
            want = tail[0] if len(tail) else universe
            assert e2.next_geq(int(lb)) == want, (density, lb)

    # strict sequence move() (the freqs access pattern)
    for trial in range(4):
        n = int(rng.integers(10, 1500))
        universe = n + int(rng.integers(1, 50000))
        vals = _random_monotone(rng, universe, n, strict=True)
        bb = BitBuilder()
        ef.strict_sequence.write(bb, vals, universe, n, ef.PARAMS)
        words = bb.words()
        e = ef_enum.StrictEnumerator(words, 0, universe, n)
        for k in rng.integers(0, n, 40):
            assert e.move(int(k)) == vals[k], k


@pytest.mark.parametrize("kind", ["ef", "single", "uniform", "opt"])
def test_wand_on_ef_indexes_with_skipping(tmp_path, kind):
    """WAND/maxscore over the EF-family indexes use the pointer-skipping
    enumerators (EFListCursor): parity with ranked_or; the move counter
    stays far below total postings on a skewed query."""
    from dint_tpu.query import ranked

    base = str(tmp_path / "c")
    rng = np.random.default_rng(5)
    nd = 200_000
    big = np.sort(rng.choice(nd, 60_000, replace=False)).astype(np.uint32)
    rare = np.sort(rng.choice(nd, 50, replace=False)).astype(np.uint32)
    docs, freqs_l = synth.make_collection(25, nd, seed=13, avg_len=100)
    docs = list(docs) + [big, rare]
    freqs_l = list(freqs_l) + [
        np.ones(len(big), np.uint32),
        rng.integers(1, 6, len(rare)).astype(np.uint32),
    ]
    collection.write_freq_collection(base, docs, freqs_l, nd)
    collection.write_sizes_file(
        base, synth.doc_sizes_from_lists(docs, freqs_l, nd)
    )
    idx = freq_index.build_freq_index(base, kind)
    wd = ranked.build_wand_data(base)
    dec = freq_index.EFTermDecoder(idx)
    nonempty = [t for t in range(len(docs)) if len(docs[t])]
    for _ in range(12):
        q = list(rng.choice(nonempty, size=int(rng.integers(1, 4)),
                            replace=False))
        want = ranked.ranked_or(idx, dec, wd, q, k=10)
        got_w = ranked.wand(idx, dec, wd, q, k=10)
        got_m = ranked.maxscore(idx, dec, wd, q, k=10)
        assert got_w.shape == want.shape
        assert np.allclose(got_w, want, rtol=1e-4), (kind, q)
        assert np.allclose(got_m, want, rtol=1e-4), (kind, q)
    # pruning stress: rare AND huge — enumerator moves << postings
    dec._lazy_cache = None
    want = ranked.ranked_or(idx, dec, wd, [25, 26], k=10)
    got = ranked.wand(idx, dec, wd, [25, 26], k=10)
    assert np.allclose(got, want, rtol=1e-4)
    c = dec.lazy_cache
    total = len(big) + len(rare)
    assert c.postings_scored < total * 0.02, (c.postings_scored, total)
    assert c.moves < total * 0.05, (c.moves, total)


# ---------------------------------------------------------------------------
# prev_value / next_reader: the reference's property probes
# (test_generic_sequence.hpp:28-88) applied to every enumerator kind
# ---------------------------------------------------------------------------


def _prev_value_sweep(make_enum, vals, universe, n):
    """The reference's test_move_next prev_value probes: random-access
    sweep, full next() walk, and the post-exhaustion check."""
    # random access + prev_value at every probed i
    e = make_enum()
    rng = np.random.default_rng(5)
    idxs = np.concatenate([[0, n - 1], rng.integers(0, n, 25)])
    for i in np.sort(idxs):
        i = int(i)
        assert e.move(i) == vals[i], i
        want_prev = 0 if i == 0 else int(vals[i - 1])
        assert e.prev_value() == want_prev, (i, e.prev_value(), want_prev)
    e.move(n)
    assert e.prev_value() == vals[-1]
    # full forward walk via next()
    e = make_enum()
    v = e.move(0)
    for i in range(n):
        assert v == vals[i], i
        want_prev = 0 if i == 0 else int(vals[i - 1])
        assert e.prev_value() == want_prev, (i, e.prev_value(), want_prev)
        v = e.next()
    assert v == universe
    assert e.prev_value() == vals[-1]


@pytest.mark.parametrize("density", [0.01, 0.3, 0.95])
def test_prev_value_ef_and_rb(density):
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(21)
    n = 900
    universe = max(int(n / density), n + 1)
    vals = _random_monotone(rng, universe, n, strict=True)
    bb = BitBuilder()
    ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
    w = bb.words()
    _prev_value_sweep(
        lambda: ef_enum.EFEnumerator(w, 0, universe, n), vals, universe, n)
    bb = BitBuilder()
    ef.compact_ranked_bitvector.write(bb, vals, universe, n, ef.PARAMS)
    w_rb = bb.words()
    _prev_value_sweep(
        lambda: ef_enum.RBEnumerator(w_rb, 0, universe, n), vals, universe, n)
    # prev_value after a cold next_geq (no prior sequential read): the
    # enumerator position comes entirely from the skip, exercising the
    # _q >= 0 guard (the reference harness probes this state too,
    # test_generic_sequence.hpp:28-88)
    targets = [0, 1, int(vals[0]), int(vals[n // 2]), int(vals[-1]),
               int(vals[-1]) + 1]
    targets += [int(x) for x in rng.integers(0, universe, 12)]
    for words, make in ((w, ef_enum.EFEnumerator),
                        (w_rb, ef_enum.RBEnumerator)):
        for lb in targets:
            e = make(words, 0, universe, n)
            got = e.next_geq(lb)
            pos = int(np.searchsorted(vals, lb, side="left"))
            if pos == n:
                assert got == universe, (make.__name__, lb)
                assert e.prev_value() == int(vals[-1])
            else:
                assert got == int(vals[pos]), (make.__name__, lb)
                want_prev = 0 if pos == 0 else int(vals[pos - 1])
                assert e.prev_value() == want_prev, (make.__name__, lb, pos)


def test_prev_value_indexed_strict_allones():
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(22)
    # indexed dispatch (ef / rb / all-ones arms)
    for density in (0.05, 0.6, 1.0):
        n = 500
        universe = max(int(n / density), n)
        vals = (np.arange(n, dtype=np.uint64) if density == 1.0
                else _random_monotone(rng, universe, n, strict=True))
        bb = BitBuilder()
        ef.indexed_sequence.write(bb, vals, universe, n, ef.PARAMS)
        w = bb.words()
        _prev_value_sweep(
            lambda: ef_enum.indexed_enumerator(w, 0, universe, n),
            vals, universe, n)
    # strict sequence (the freqs shape; strict-EF arm adds the +index)
    for trial in range(3):
        n = int(rng.integers(20, 800))
        universe = n + int(rng.integers(1, 30000))
        vals = _random_monotone(rng, universe, n, strict=True)
        bb = BitBuilder()
        ef.strict_sequence.write(bb, vals, universe, n, ef.PARAMS)
        w = bb.words()
        _prev_value_sweep(
            lambda: ef_enum.StrictEnumerator(w, 0, universe, n),
            vals, universe, n)


@pytest.mark.parametrize("uniform", [False, True])
def test_prev_value_partitioned(uniform):
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(23)
    # clustered docs so the optimal-partition DP actually splits
    parts = []
    base_v = 0
    for _ in range(12):
        base_v += int(rng.integers(5_000, 40_000))
        run = int(rng.integers(100, 400))
        parts.append(base_v + np.sort(rng.choice(run * 2, run, replace=False)))
        base_v = int(parts[-1][-1])
    vals = np.concatenate(parts).astype(np.uint64)
    n = int(vals.shape[0])
    universe = int(vals[-1]) + int(rng.integers(1, 1000))
    seq = (ef.uniform_partitioned_sequence(ef.indexed_sequence)
           if uniform else ef.partitioned_sequence(ef.indexed_sequence))
    bb = BitBuilder()
    seq.write(bb, vals, universe, n, ef.PARAMS)
    w = bb.words()

    def make():
        return ef_enum.PartitionedEnumerator(
            w, 0, universe, n, base="indexed", uniform=uniform)

    _prev_value_sweep(make, vals, universe, n)
    e = make()
    assert e.partitions > 1  # the boundary cases below need >1 partition
    # prev_value straight after next_geq, including partition boundaries
    for lb in list(rng.integers(0, universe + 1, 20)) + [0, int(vals[-1]) + 1]:
        e = make()
        got = e.next_geq(int(lb))
        tail = vals[vals >= lb]
        if len(tail):
            assert got == tail[0]
            k = int(np.searchsorted(vals, lb))
            want_prev = 0 if k == 0 else int(vals[k - 1])
        else:
            assert got == universe
            want_prev = int(vals[-1])
        assert e.prev_value() == want_prev, (lb, e.prev_value(), want_prev)


def test_ef_next_reader_streams():
    from dint_tpu.codecs import ef_enum
    from dint_tpu.utils.bitio import BitBuilder

    rng = np.random.default_rng(24)
    for density in (0.02, 0.5):
        n = 1200
        universe = max(int(n / density), n + 1)
        vals = _random_monotone(rng, universe, n, strict=True)
        bb = BitBuilder()
        ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
        w = bb.words()
        e = ef_enum.EFEnumerator(w, 0, universe, n)
        e.move(7)
        saved = (e.position(), e.value())
        for start in (0, 1, 7, n // 2, n - 1, n):
            r = e.next_reader(start)
            got = [r() for _ in range(n - start + 2)]
            want = list(vals[start:]) + [universe, universe]
            assert got == [int(x) for x in want], (density, start)
        # the owning enumerator was never disturbed
        assert (e.position(), e.value()) == saved
        assert e.next() == vals[8]


# ---------------------------------------------------------------------------
# native word-parallel decode (native/ef_decode.cpp) vs the numpy oracle
# ---------------------------------------------------------------------------


def _numpy_only(fn, *args, **kw):
    """Run fn with the native EF library disabled (numpy oracle path)."""
    from dint_tpu.utils import bitnative

    saved = bitnative._lib, bitnative._lib_failed
    bitnative._lib, bitnative._lib_failed = None, True
    try:
        return fn(*args, **kw)
    finally:
        bitnative._lib, bitnative._lib_failed = saved


def test_native_ef_decode_matches_numpy_oracle():
    from dint_tpu.utils import bitnative

    if bitnative.get_lib() is None:
        pytest.skip("native EF library unavailable")
    rng = np.random.default_rng(77)
    cases = [
        (10_000, 100), (10_000, 5_000), (10_000, 9_999),
        (1 << 33, 3_000),  # >32-bit universe (wide low bits)
        (300, 1), (300, 2), (4096, 4096 - 1),
    ]
    for universe, n in cases:
        vals = np.sort(
            rng.choice(universe, size=n, replace=False).astype(np.uint64))
        bb = BitBuilder()
        ef.compact_elias_fano.write(bb, vals, universe, n, ef.PARAMS)
        w = bb.words()
        got = ef.compact_elias_fano.decode_all(w, 0, universe, n, ef.PARAMS)
        want = _numpy_only(
            ef.compact_elias_fano.decode_all, w, 0, universe, n, ef.PARAMS)
        assert np.array_equal(got, want), (universe, n)
        assert np.array_equal(got, vals)
        # ranked bitvector at the same density
        bb = BitBuilder()
        ef.compact_ranked_bitvector.write(bb, vals, universe, n, ef.PARAMS)
        w = bb.words()
        got = ef.compact_ranked_bitvector.decode_all(
            w, 0, universe, n, ef.PARAMS)
        assert np.array_equal(got, vals), ("rb", universe, n)


def test_native_pef_decode_matches_numpy_oracle():
    from dint_tpu.utils import bitnative

    if bitnative.get_lib() is None:
        pytest.skip("native EF library unavailable")
    rng = np.random.default_rng(78)
    for uniform in (False, True):
        for universe, n in [(40_000, 6_000), (2_000_000, 40_000),
                            (600, 599), (1 << 34, 2_000)]:
            docs = np.sort(
                rng.choice(universe, size=n, replace=False).astype(np.uint64))
            seq = (ef.uniform_partitioned_sequence(ef.indexed_sequence)
                   if uniform else ef.partitioned_sequence(ef.indexed_sequence))
            bb = BitBuilder()
            seq.write(bb, docs, universe, n, ef.PARAMS)
            w = bb.words()
            got = seq.decode_all(w, 0, universe, n, ef.PARAMS)
            want = _numpy_only(seq.decode_all, w, 0, universe, n, ef.PARAMS)
            assert np.array_equal(got, want), (uniform, universe, n)
            assert np.array_equal(got, docs)
        # strict base (the freq-list shape): cumulative sums
        freqs = rng.integers(1, 50, size=5_000).astype(np.uint64)
        csum = np.cumsum(freqs)
        universe = int(csum[-1]) + 1
        seq = (ef.uniform_partitioned_sequence(ef.strict_sequence)
               if uniform else ef.partitioned_sequence(ef.strict_sequence))
        bb = BitBuilder()
        seq.write(bb, csum, universe, csum.shape[0], ef.PARAMS)
        w = bb.words()
        got = seq.decode_all(w, 0, universe, csum.shape[0], ef.PARAMS)
        want = _numpy_only(
            seq.decode_all, w, 0, universe, csum.shape[0], ef.PARAMS)
        assert np.array_equal(got, want), ("strict", uniform)
        assert np.array_equal(got, csum)
