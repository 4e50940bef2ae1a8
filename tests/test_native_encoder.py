"""Native C++ encoder must be byte-identical to the numpy/oracle paths."""

import numpy as np
import pytest

from dint_tpu.codecs import dint, encode_batch, native
from tests.test_batch_encode_decode import setup  # noqa: F401  (fixture)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native encoder not buildable"
)


def test_native_single_matches_oracle(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    lists = [g for g in gap_lists if len(g) <= encode_batch.OPT_CHUNK][:30]
    streams, chunk_lens = encode_batch.encode_single_lists(ds, lists)
    for g, got in zip(lists, streams):
        assert got == dint.encode_opt_single(lt, g), f"n={len(g)}"


def test_native_multi_matches_oracle(setup):  # noqa: F811
    gap_lists, _, dm = setup
    lt16, lt8 = dm.lookup_tables()
    lists = gap_lists[:15]
    streams, block_lens = encode_batch.encode_multi_lists(dm, lists)
    for g, got, bl in zip(lists, streams, block_lens):
        assert got == dint.encode_multi_opt(lt16, lt8, g)
        assert len(bl) == (len(g) + 255) // 256


def test_native_rectangular_roundtrip(setup):  # noqa: F811
    gap_lists, _, _ = setup
    from dint_tpu.dictionary.builder import build_dictionary
    from dint_tpu.stats import block_stats, collectors

    total = sum(len(g) for g in gap_lists)
    per_size = collectors.collect_single(gap_lists)
    ctx = block_stats._filter_sort(per_size, total)
    stats = block_stats.BlockStats(total, [ctx])
    dr = build_dictionary(stats, "rectangular")
    streams, _ = encode_batch.encode_single_lists(dr, gap_lists[:10])
    view = dr.decode_view()
    for g, buf in zip(gap_lists[:10], streams):
        out = np.zeros(len(g), np.uint32)
        end = dint.decode_single(view, buf, 0, len(g), out)
        assert end == len(buf)
        np.testing.assert_array_equal(out, g)


def test_threaded_encode_byte_identical(tmp_path, monkeypatch):
    """DS2I_THREADS worker-pool encode (the semiasync_queue analogue:
    prepare in parallel, commit in order) must be byte-identical to the
    serial path for both modes."""
    import numpy as np

    from dint_tpu.codecs import native
    from dint_tpu.dictionary import builder as db
    from dint_tpu.io import collection, synth

    base = str(tmp_path / "c")
    docs, freqs = synth.make_collection(25, 6000, seed=9, avg_len=150)
    collection.write_freq_collection(base, docs, freqs, 6000)
    rng = np.random.default_rng(1)
    N = 200_000
    gaps = np.where(
        rng.random(N) < 0.5, 0, rng.integers(1, 500, N)
    ).astype(np.uint32)
    for kind, mode, chunk in (("single", 0, 4096), ("multi", 1, 256)):
        d = db.build_or_load_dict(
            base + ".docs", True, kind, "pack", str(tmp_path)
        )
        enc = native.native_encoder_for(d)
        if enc is None:
            return  # no native toolchain
        units = [gaps[i : i + chunk] for i in range(0, N, chunk)]
        monkeypatch.setenv("DS2I_THREADS", "1")
        ser = enc.encode_units(units, mode)
        monkeypatch.setenv("DS2I_THREADS", "5")
        par = native.native_encoder_for(d).encode_units(units, mode)
        assert ser == par, kind


def _cold_build_probe(_):
    import ctypes

    from dint_tpu.utils import nativebuild

    src = nativebuild.source_path("dint_encoder.cpp")
    so = nativebuild.ensure_so(src, "libdintenc.so", ["-ftls-model=initial-exec"])
    ctypes.CDLL(so)  # raises on a truncated/garbage object
    return so


def test_cold_concurrent_native_build(tmp_path):
    """N processes racing the first-use compile must all dlopen a whole
    .so (temp-file + rename + flock in utils/nativebuild.py); before
    that fix a worker could CDLL a half-written file."""
    import multiprocessing as mp
    import os

    from dint_tpu.utils import nativebuild

    src = nativebuild.source_path("dint_encoder.cpp")
    so = os.path.join(os.path.dirname(src), "libdintenc.so")
    if os.path.exists(so):
        os.unlink(so)
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        paths = pool.map(_cold_build_probe, range(4))
    assert all(p == so for p in paths)
