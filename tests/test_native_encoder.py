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
