"""Native C++ statistics collector: bit-exact parity with the numpy
path, capped padded export, and store/load round-trips (sidecar +
reference-format scalar fallback)."""

import os

import numpy as np
import pytest

from dint_tpu.io import collection as coll_mod, synth
from dint_tpu.stats import block_stats, native_stats


@pytest.fixture(scope="module")
def small_collection(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("nstats") / "c")
    docs, freqs = synth.make_collection(120, 20000, seed=9)
    coll_mod.write_freq_collection(base, docs, freqs, 20000)
    return base


def _numpy_stats(coll, gaps, multi):
    os.environ["DINT_TPU_NATIVE_STATS"] = "0"
    native_stats._lib = None
    native_stats._lib_failed = False
    try:
        return block_stats.compute_stats(coll, gaps, multi)
    finally:
        del os.environ["DINT_TPU_NATIVE_STATS"]
        native_stats._lib_failed = False


@pytest.mark.parametrize("gaps", [True, False])
@pytest.mark.parametrize("multi", [False, True])
def test_native_matches_numpy(small_collection, gaps, multi):
    fname = small_collection + (".docs" if gaps else ".freqs")
    coll = coll_mod.BinaryCollection(fname)
    nat = block_stats.compute_stats(coll, gaps, multi)
    ref = _numpy_stats(coll, gaps, multi)
    assert nat.total_integers == ref.total_integers
    for a, b in zip(nat.contexts, ref.contexts):
        np.testing.assert_array_equal(a.lengths, b.lengths)
        np.testing.assert_array_equal(a.freqs, b.freqs)
        np.testing.assert_array_equal(a.data, b.data)


def test_padded_limit_caps_but_full_column_complete(small_collection):
    coll = coll_mod.BinaryCollection(small_collection + ".docs")
    full = block_stats.compute_stats(coll, True, False)
    cap = block_stats.compute_stats(coll, True, False, padded_limit=50)
    a, b = cap.contexts[0], full.contexts[0]
    k = min(50, b.lengths.shape[0])
    np.testing.assert_array_equal(a.lengths, b.lengths[:k])
    np.testing.assert_array_equal(a.data, b.data[:k])
    fl, ff, fv = a.full
    np.testing.assert_array_equal(fl, b.lengths)
    np.testing.assert_array_equal(ff, b.freqs)
    assert fv.shape[0] == int(b.lengths.astype(np.int64).sum())


@pytest.mark.parametrize("multi", [False, True])
def test_store_load_roundtrip_sidecar_and_scalar(
    small_collection, tmp_path, multi
):
    coll = coll_mod.BinaryCollection(small_collection + ".docs")
    st = block_stats.compute_stats(coll, True, multi)
    capped = block_stats.compute_stats(
        coll, True, multi, padded_limit=64
    )
    p1 = str(tmp_path / "full")
    p2 = str(tmp_path / "capped")
    block_stats.store_stats(st, p1)
    block_stats.store_stats(capped, p2)
    # the capped-padded stats must serialize identically (via .full)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    for use_sidecar in (True, False):
        if not use_sidecar:
            os.remove(p1 + ".side")
        got = block_stats.load_stats(p1, multi, cap_single=False)
        assert got.total_integers == st.total_integers
        for a, b in zip(got.contexts, st.contexts):
            np.testing.assert_array_equal(a.lengths, b.lengths)
            np.testing.assert_array_equal(
                np.asarray(a.freqs) & 0xFFFFFFFF,
                np.asarray(b.freqs) & 0xFFFFFFFF,
            )
            np.testing.assert_array_equal(a.data, b.data)


def test_collection_gap_arrays_matches_per_list(small_collection):
    from dint_tpu.utils import gaps as gap_mod

    for suffix, gaps in ((".docs", True), (".freqs", False)):
        coll = coll_mod.BinaryCollection(small_collection + suffix)
        got = native_stats.collection_gap_arrays(coll, gaps)
        if got is None:
            pytest.skip("native library unavailable")
        flat, offs = got
        want = []
        for i in range(1 if gaps else 0, len(coll)):
            seq = coll.sequence(i)
            if seq.shape[0] == 0:
                continue
            want.append(
                gap_mod.docs_to_gaps(seq) if gaps else gap_mod.freqs_to_gaps(seq)
            )
        np.testing.assert_array_equal(flat, np.concatenate(want))
