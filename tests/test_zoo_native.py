"""Native zoo decoders (native/zoo_decode.cpp) vs the numpy oracles.

The numpy vectorized decoders in codecs/blocks.py (and the scalar
walks behind them) are the cross-checked oracles; every native decode
must match them value-for-value AND consume the same bytes across
tiny / unaligned / partial-group / big-value / multi-chunk shapes.
"""

import numpy as np
import pytest

from dint_tpu.codecs import blocks, zoonative
from dint_tpu.codecs import qmx as qmx_wire
from dint_tpu.index import vroom_zoo

pytestmark = pytest.mark.skipif(
    zoonative.get_lib() is None, reason="native zoo library unavailable"
)

NUMPY_DECODERS = {
    "vbyte": lambda buf, pos, n: blocks.vbyte.decode(buf, pos, n),
    "maskedvbyte": lambda buf, pos, n: blocks._maskedvbyte_decode_numpy(
        buf, pos, n, blocks.UNKNOWN),
    "streamvbyte": lambda buf, pos, n: blocks._streamvbyte_decode_numpy(
        buf, pos, n, blocks.UNKNOWN),
    "varintgb": lambda buf, pos, n: blocks._varintgb_decode_numpy(
        buf, pos, n, blocks.UNKNOWN),
    "simple16": lambda buf, pos, n: blocks._simple16_decode_numpy(
        buf, pos, n, blocks.UNKNOWN),
}
NATIVE_FN = {
    "vbyte": "zoo_vbyte",
    "maskedvbyte": "zoo_maskedvbyte",
    "streamvbyte": "zoo_streamvbyte",
    "varintgb": "zoo_varintgb",
    "simple16": "zoo_simple16",
}


def _values(rng, n, big=True):
    v = rng.integers(0, 1 << 10, size=n).astype(np.uint32)
    if big and n >= 4:
        # hit every byte-length class including 5-byte vbyte tails
        v[rng.integers(0, n, max(1, n // 8))] = rng.integers(
            1 << 14, 1 << 27, max(1, n // 8)).astype(np.uint32)
        v[rng.integers(0, n, max(1, n // 16))] = rng.integers(
            1 << 28, 1 << 32, max(1, n // 16), dtype=np.uint64
        ).astype(np.uint32)
        v[0] = 0
        v[n // 2] = 0xFFFFFFFF
    return v


@pytest.mark.parametrize("codec", sorted(NUMPY_DECODERS))
def test_native_matches_numpy_oracle(codec):
    rng = np.random.default_rng(41)
    enc = blocks.CODECS[codec][0]
    for n in (1, 2, 3, 4, 5, 7, 8, 31, 32, 33, 100, 257, 4096):
        big = not (codec == "simple16")  # simple16 caps at 2^28
        v = _values(rng, n, big=big)
        if codec == "simple16":
            v = np.minimum(v, (1 << 28) - 1)
        payload = enc(v, blocks.UNKNOWN)
        # offset the payload inside a larger buffer (pos != 0)
        buf = b"\xAA" * 7 + payload + b"\x55" * 3
        got = zoonative.decode(NATIVE_FN[codec], buf, 7, n)
        assert got is not None, (codec, n)
        vals, endpos = got
        wvals, wend = NUMPY_DECODERS[codec](buf, 7, n)
        np.testing.assert_array_equal(vals, wvals, err_msg=f"{codec} n={n}")
        assert endpos == wend, (codec, n, endpos, wend)
        np.testing.assert_array_equal(vals, v)


def test_native_optpfor_matches_numpy():
    rng = np.random.default_rng(42)
    for trial in range(6):
        v = _values(rng, 256)
        if trial == 3:
            v[:] = 0  # b == 0 block
        if trial == 4:
            v[:] = 0xFFFFFFFF  # b == 32 block
        payload = blocks.optpfor_encode(v, blocks.UNKNOWN)
        buf = b"\xAA" * 5 + payload
        got = zoonative.decode("zoo_optpfor_block", buf, 5, 256)
        assert got is not None
        vals, endpos = got
        wvals, wend = blocks._optpfor_decode_numpy(buf, 5, 256, blocks.UNKNOWN)
        np.testing.assert_array_equal(vals, wvals, err_msg=str(trial))
        assert endpos == wend
        np.testing.assert_array_equal(vals, v)


def test_native_g8iu_matches_numpy():
    rng = np.random.default_rng(43)
    for n in (256, 512, 300):
        v = _values(rng, n)
        payload = blocks._varint_g8iu_encode_full(v)
        got = zoonative.decode("zoo_varintg8iu", payload, 0, n)
        assert got is not None
        vals, endpos = got
        wvals, wend = blocks._varint_g8iu_decode_numpy(
            payload, 0, n, blocks.UNKNOWN)
        np.testing.assert_array_equal(vals, wvals)
        assert endpos == wend
        np.testing.assert_array_equal(vals, v)


def test_native_qmx_matches_numpy():
    rng = np.random.default_rng(44)
    shapes = [
        _values(rng, 256), _values(rng, 4096),
        np.ones(1000, np.uint32),                 # width-0 runs
        np.zeros(600, np.uint32),                 # value 0 costs 1 bit
        rng.integers(0, 1 << 21, 2000).astype(np.uint32),  # 21-bit arm
        rng.integers(0, 1 << 12, 511).astype(np.uint32),   # 12-bit + tail
        _values(rng, 257), _values(rng, 300),
    ]
    for v in shapes:
        payload = qmx_wire.encode(v)
        n = v.shape[0]
        got = zoonative.qmx_decode(payload, n)
        assert got is not None
        want = qmx_wire._decode_payload_numpy(payload, n)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got, v)


def test_native_truncation_falls_back():
    """Truncated buffers must return None (→ numpy path), never OOB."""
    rng = np.random.default_rng(45)
    v = _values(rng, 500)
    for codec in sorted(NUMPY_DECODERS):
        vv = np.minimum(v, (1 << 28) - 1) if codec == "simple16" else v
        payload = blocks.CODECS[codec][0](vv, blocks.UNKNOWN)
        cut = payload[: len(payload) // 2]
        assert zoonative.decode(NATIVE_FN[codec], cut, 0, 500) is None, codec


def test_whole_list_native_path_exact():
    """decode_list_zoo's one-call native path (zoo_many) is exact across
    chunk boundaries, including the partial FIXED_BLOCK tail."""
    rng = np.random.default_rng(46)
    n = 50_000 + 123  # several OPT_CHUNKs + odd tail; 195 full 256-blocks
    gaps = _values(rng, n)
    # interpolative partial-block tails inherit the reference's u32 sum
    # contract: cap so any 256-value window sums below 2^32
    gaps = np.minimum(gaps, (1 << 23) - 1)
    for codec in ("vbyte", "maskedvbyte", "streamvbyte", "varintgb",
                  "simple16", "optpfor", "varintg8iu", "qmx"):
        g = gaps
        payload, _ = vroom_zoo.encode_list_zoo(codec, g)
        arena = np.frombuffer(payload, dtype=np.uint8)
        got = vroom_zoo.decode_list_zoo(codec, arena, 0, n)
        np.testing.assert_array_equal(got, g, err_msg=codec)


def test_native_interpolative_whole_list_exact():
    """Native interpolative (zoo_many codec 7): values AND consumed
    bytes identical to the python block walk, across chunk boundaries,
    partial tails, single-value lists, and big values; truncated
    buffers fail cleanly (→ python fallback), never over-read."""
    rng = np.random.default_rng(47)
    for n in (1, 2, 255, 256, 257, 5000 + 77):
        gaps = np.minimum(_values(rng, n), (1 << 23) - 1)
        payload, _ = vroom_zoo.encode_list_zoo("interpolative", gaps)
        arena = np.frombuffer(payload, dtype=np.uint8)
        r = zoonative.decode_chunked("interpolative", arena, 0, n, 256)
        assert r is not None
        np.testing.assert_array_equal(r[0], gaps)
        # consumed-byte parity with the python decoder
        dec = blocks.CODECS["interpolative"][1]
        pos = 0
        for p in range(0, n, 256):
            vals, pos = dec(arena, pos, min(256, n - p), blocks.UNKNOWN)
        assert pos == r[1], (n, pos, r[1])
        # the production whole-list path rides it and stays exact
        got = vroom_zoo.decode_list_zoo("interpolative", arena, 0, n)
        np.testing.assert_array_equal(got, gaps)
    # truncation: every cut length either fails cleanly or is unreached
    gaps = np.minimum(_values(rng, 700), (1 << 23) - 1)
    payload, _ = vroom_zoo.encode_list_zoo("interpolative", gaps)
    for cut in (0, 1, 3, len(payload) // 2, len(payload) - 1):
        arena = np.frombuffer(payload[:cut], dtype=np.uint8)
        assert zoonative.decode_chunked(
            "interpolative", arena, 0, 700, 256) is None
