"""Round-trip tests for collection I/O, vbyte, gaps and interpolative.

Mirrors the reference's property-test style (test/test_generic_sequence.hpp
and test_block_codecs.cpp): random values over magnitudes 2^1..2^24 and
edge sizes {1, 16, 255, 256}, with both known and unknown sums.
"""

import numpy as np
import pytest

from dint_tpu.codecs import interpolative, vbyte
from dint_tpu.io import collection, synth
from dint_tpu.utils import gaps


def test_collection_roundtrip(tmp_path, rng):
    doc_lists, freq_lists = synth.make_collection(50, 2000, seed=7)
    base = str(tmp_path / "coll")
    collection.write_freq_collection(base, doc_lists, freq_lists, 2000)
    view = collection.open_freq_collection(base)
    assert view.num_docs == 2000
    assert len(view) == 50
    got = list(view)
    for (d, f), dref, fref in zip(got, doc_lists, freq_lists):
        np.testing.assert_array_equal(d, dref)
        np.testing.assert_array_equal(f, fref)


def test_docs_lists_valid(rng):
    doc_lists, freq_lists = synth.make_collection(200, 5000, seed=3)
    for d, f in zip(doc_lists, freq_lists):
        assert d.shape == f.shape
        assert (np.diff(d.astype(np.int64)) > 0).all()
        assert int(d[-1]) < 5000
        assert (f >= 1).all()


def test_vbyte_roundtrip(rng):
    vals = np.concatenate(
        [
            rng.integers(0, 1 << m, size=20, dtype=np.uint64)
            for m in (7, 8, 14, 21, 28, 32)
        ]
    ).astype(np.uint32)
    buf = vbyte.encode(vals)
    out, pos = vbyte.decode(buf, 0, len(vals))
    assert pos == len(buf)
    np.testing.assert_array_equal(out, vals)
    for v in [0, 1, 127, 128, 16383, 16384, (1 << 32) - 1]:
        b = vbyte.encode_single(v)
        assert len(b) == vbyte.encoded_size(v)
        got, p = vbyte.decode_single(b, 0)
        assert got == v and p == len(b)


def test_gap_transforms(rng):
    docs = np.unique(rng.integers(0, 10000, 500)).astype(np.uint32)
    g = gaps.docs_to_gaps(docs)
    np.testing.assert_array_equal(gaps.gaps_to_docs(g), docs)
    freqs = rng.integers(1, 100, 300).astype(np.uint32)
    fg = gaps.freqs_to_gaps(freqs)
    np.testing.assert_array_equal(gaps.gaps_to_freqs(fg), freqs)


@pytest.mark.parametrize("n", [1, 2, 3, 16, 255, 256])
@pytest.mark.parametrize("mag", [1, 4, 10, 24])
def test_interpolative_roundtrip_known_sum(rng, n, mag):
    vals = rng.integers(0, 1 << mag, size=n).astype(np.uint32)
    s = int(vals.astype(np.int64).sum())
    buf = interpolative.encode_block(vals, s)
    out, pos = interpolative.decode_block(buf, 0, n, s)
    np.testing.assert_array_equal(out, vals)
    assert pos == len(buf)


@pytest.mark.parametrize("n", [1, 16, 255])
def test_interpolative_roundtrip_unknown_sum(rng, n):
    vals = rng.integers(0, 1000, size=n).astype(np.uint32)
    buf = interpolative.encode_block(vals, interpolative.UNKNOWN_SUM)
    out, pos = interpolative.decode_block(buf, 0, n, interpolative.UNKNOWN_SUM)
    np.testing.assert_array_equal(out, vals)
    assert pos == len(buf)


def test_interpolative_all_zero():
    vals = np.zeros(100, dtype=np.uint32)
    buf = interpolative.encode_block(vals, 0)
    assert len(buf) == 0  # zero-universe blocks cost zero bits
    out, pos = interpolative.decode_block(buf, 0, 100, 0)
    np.testing.assert_array_equal(out, vals)


def test_interpolative_size_matches_dfs_reference_bitcount(rng):
    # The BFS layout must cost exactly the same bits as the reference's
    # DFS layout (same minimal binary codes, reordered).
    for trial in range(20):
        n = int(rng.integers(2, 256))
        vals = rng.integers(0, 1 << int(rng.integers(1, 20)), size=n)
        psums = np.cumsum(vals.astype(np.int64))
        s = int(psums[-1])
        bits = interpolative.encoded_bits(psums[: n - 1], 0, s)
        buf = interpolative.encode_block(vals, s)
        assert len(buf) == (bits + 7) // 8


def test_synth_exact_target_postings(rng):
    from dint_tpu.io import synth

    docs, freqs = synth.make_collection(
        500, 2000, seed=3, target_postings=30_000
    )
    total = sum(len(d) for d in docs)
    assert total == 30_000
    assert all(1 <= len(d) <= 2000 for d in docs)
    assert all(len(d) == len(f) for d, f in zip(docs, freqs))
    # realistic spread, not a singleton collapse
    import numpy as np

    lens = np.array([len(d) for d in docs])
    assert (lens == 1).mean() < 0.5
    assert lens.max() > 100


def test_interpolative_vectorized_matches_scalar(rng):
    from dint_tpu.codecs import interpolative as ic

    for trial in range(40):
        n = int(rng.integers(1, 300))
        hi = int(rng.integers(n, 1 << int(rng.integers(10, 32))) + n)
        vals = np.sort(rng.integers(0, hi + 1, n)).astype(np.int64)
        buf = ic.encode_prefix_sums(vals, 0, hi)
        pad = bytes(buf) + b"\x7f" * 11  # trailing garbage must not leak
        got, used = ic._decode_prefix_sums_level(
            np.frombuffer(pad, np.uint8), 0, n, 0, hi
        )
        want, used2 = ic.decode_prefix_sums(np.frombuffer(pad, np.uint8), 0, n, 0, hi)
        np.testing.assert_array_equal(got, want)
        assert used == used2 == len(buf)


def test_interpolative_batch_matches_scalar(rng):
    from dint_tpu.codecs import interpolative as ic

    blocks, specs, stream = [], [], bytearray()
    for t in range(200):
        n = int(rng.integers(1, 256))
        vals = rng.integers(0, 1 << int(rng.integers(2, 20)), n).astype(np.uint32)
        known = bool(rng.integers(0, 2))
        sv = int(vals.sum()) if known else ic.UNKNOWN_SUM
        enc = ic.encode_block(vals, sv)
        specs.append((len(stream), n, sv))
        stream += enc
        blocks.append(vals)
    buf = np.frombuffer(bytes(stream), np.uint8)
    got = ic.decode_blocks_batch(buf, specs)
    for (pos, n, sv), vals, g in zip(specs, blocks, got):
        want, _ = ic.decode_block(buf, pos, n, sv)
        np.testing.assert_array_equal(want, vals)
        np.testing.assert_array_equal(g, vals)


def test_progress_logger(capsys):
    from dint_tpu.utils.progress import ProgressLogger

    p = ProgressLogger(10, "x", every_s=0.0)
    for _ in range(10):
        p.add()
    p.done()
    err = capsys.readouterr().err
    assert "10/10" in err and "100.0%" in err
    p2 = ProgressLogger(None, "y", every_s=0.0)
    p2.add(3)
    assert "y: 3" in capsys.readouterr().err


def test_vbyte_vectorized_matches_scalar():
    import numpy as np

    from dint_tpu.codecs import vbyte

    rng = np.random.default_rng(5)
    for mag in (3, 10, 20, 31):
        for n in (1, 7, 8, 100, 5000):
            v = rng.integers(0, 1 << mag, n).astype(np.uint32)
            buf = np.frombuffer(b"\xee" * 2 + vbyte.encode(v) + b"\x91" * 5,
                                np.uint8)
            got, end = vbyte.decode(buf, 2, n)
            want, wend = vbyte._decode_scalar(buf, 2, n)
            np.testing.assert_array_equal(got, want, err_msg=f"{mag}/{n}")
            assert end == wend
