"""Binary interpolative coding, level-ordered for TPU decode.

The reference (interpolative_coding.hpp:40-70,109-146; block_codecs.hpp
``interpolative_block``) codes the midpoint of a prefix-sum array with a
centered minimal binary code, then recurses left/right (DFS order).  The
DFS bit layout forces a sequential bit-walk at decode time.

We emit EXACTLY the same minimal binary codes — so the encoded size in
bits is identical to the reference, preserving bpi parity — but order
them breadth-first, and within each tree level split the stream into a
fixed-width plane (the b-bit parts) followed by an extra-bit plane (the
conditional (b+1)-th bits).  All code widths at level d are computable
from values decoded at levels < d, so decoding is ceil(log2(n)) rounds
of fully-vectorized gathers + prefix sums — the TPU-native shape.

Minimal binary code of x in [0, u): b = floor(log2(u)), m = 2^(b+1) - u.
x < m  -> b bits holding x.
x >= m -> b+1 bits holding x+m (split: high b bits in the fixed plane,
          low bit in the extra plane).  Decode: v = b fixed bits; if
          v >= m then v = 2v + extra - m.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import BLOCK_SIZE
from . import vbyte

UNKNOWN_SUM = 0xFFFFFFFF


class BitWriter:
    """Little-endian bit accumulator (bit k of the stream = bit k%8 of byte k//8)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, bits: int, length: int) -> None:
        if length == 0:
            return
        assert 0 <= bits < (1 << length)
        self.acc |= bits << self.nbits
        self.nbits += length

    def to_bytes(self) -> bytes:
        nbytes = (self.nbits + 7) // 8
        return self.acc.to_bytes(nbytes, "little") if nbytes else b""


class BitReader:
    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.base = pos
        self.bitpos = 0

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        start = self.bitpos
        self.bitpos += length
        first = self.base + start // 8
        last = self.base + (start + length - 1) // 8
        word = int.from_bytes(bytes(self.buf[first : last + 1]), "little")
        return (word >> (start % 8)) & ((1 << length) - 1)

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) // 8


def _floor_log2(u: int) -> int:
    return u.bit_length() - 1


def level_nodes(n: int) -> List[List[Tuple[int, int]]]:
    """BFS levels of (start, end) half-open subranges for an n-value tree.

    Purely structural: depends on n only.  Node (s, e) codes index
    s + (e-s)//2 and spawns children (s, mid) and (mid+1, e).
    """
    levels: List[List[Tuple[int, int]]] = []
    cur = [(0, n)] if n > 0 else []
    while cur:
        levels.append(cur)
        nxt: List[Tuple[int, int]] = []
        for s, e in cur:
            h = (e - s) // 2
            mid = s + h
            if mid - s > 0:
                nxt.append((s, mid))
            if e - (mid + 1) > 0:
                nxt.append((mid + 1, e))
        cur = nxt
    return levels


def encode_prefix_sums(vals: np.ndarray, low0: int, high0: int) -> bytes:
    """Encode the n strictly-nondecreasing values with bounds [low0, high0]."""
    n = int(vals.shape[0])
    if n == 0:
        return b""
    vals = np.asarray(vals, dtype=np.int64)
    bw = BitWriter()
    # Per-node decode bounds, computed alongside the traversal.
    lows = {(0, n): low0}
    highs = {(0, n): high0}
    for level in level_nodes(n):
        fixed = BitWriter()
        extra = BitWriter()
        for s, e in level:
            h = (e - s) // 2
            mid = s + h
            low, high = lows[(s, e)], highs[(s, e)]
            val = int(vals[mid])
            assert low <= val <= high, (low, val, high)
            u = high - low + 1
            x = val - low
            b = _floor_log2(u)
            m = (1 << (b + 1)) - u
            if x < m:
                fixed.write(x, b)
            else:
                y = x + m
                fixed.write(y >> 1, b)
                extra.write(y & 1, 1)
            if mid - s > 0:
                lows[(s, mid)] = low
                highs[(s, mid)] = val
            if e - (mid + 1) > 0:
                lows[(mid + 1, e)] = val
                highs[(mid + 1, e)] = high
        bw.write(fixed.acc, fixed.nbits)
        bw.write(extra.acc, extra.nbits)
    return bw.to_bytes()


def decode_prefix_sums(buf, pos: int, n: int, low0: int, high0: int):
    """Inverse of encode_prefix_sums; returns (values, bytes_consumed)."""
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out, 0
    br = BitReader(buf, pos)
    lows = {(0, n): low0}
    highs = {(0, n): high0}
    for level in level_nodes(n):
        meta = []
        for s, e in level:
            h = (e - s) // 2
            mid = s + h
            low, high = lows[(s, e)], highs[(s, e)]
            u = high - low + 1
            b = _floor_log2(u)
            m = (1 << (b + 1)) - u
            meta.append((s, e, mid, low, high, b, m))
        partial = []
        for s, e, mid, low, high, b, m in meta:
            partial.append(br.read(b))
        for (s, e, mid, low, high, b, m), v in zip(meta, partial):
            if v >= m:
                v = (v << 1) + br.read(1) - m
            val = low + v
            out[mid] = val
            if mid - s > 0:
                lows[(s, mid)] = low
                highs[(s, mid)] = val
            if e - (mid + 1) > 0:
                lows[(mid + 1, e)] = val
                highs[(mid + 1, e)] = high
    return out, br.bytes_consumed()


def encoded_bits(vals: np.ndarray, low0: int, high0: int) -> int:
    """Exact bit count (same as the reference DFS coder would produce)."""
    n = int(vals.shape[0])
    total = 0
    if n == 0:
        return 0
    vals = np.asarray(vals, dtype=np.int64)
    stack = [(0, n, low0, high0)]
    while stack:
        s, e, low, high = stack.pop()
        h = (e - s) // 2
        mid = s + h
        val = int(vals[mid])
        u = high - low + 1
        b = _floor_log2(u)
        m = (1 << (b + 1)) - u
        total += b + (0 if (val - low) < m else 1)
        if mid - s > 0:
            stack.append((s, mid, low, val))
        if e - (mid + 1) > 0:
            stack.append((mid + 1, e, val, high))
    return total


def encode_block(values: np.ndarray, sum_of_values: int) -> bytes:
    """interpolative_block::encode semantics (block_codecs.hpp:104-129).

    ``values`` are the raw (gap) values of a partial block; they are
    prefix-summed, the final sum is implied by ``sum_of_values`` (or
    vbyte-prefixed when unknown), and the first n-1 prefix sums are
    interpolative-coded in [0, sum].
    """
    values = np.asarray(values, dtype=np.int64)
    n = int(values.shape[0])
    assert 0 < n <= BLOCK_SIZE
    psums = np.cumsum(values)
    out = bytearray()
    if sum_of_values == UNKNOWN_SUM:
        sum_of_values = int(psums[-1])
        out += vbyte.encode_single(sum_of_values)
    out += encode_prefix_sums(psums[: n - 1], 0, int(sum_of_values))
    return bytes(out)


def decode_block(buf, pos: int, n: int, sum_of_values: int):
    """Returns (values, new_pos)."""
    start = pos
    if sum_of_values == UNKNOWN_SUM:
        sum_of_values, pos = vbyte.decode_single(buf, pos)
    psums, consumed = decode_prefix_sums(buf, pos, n - 1, 0, int(sum_of_values))
    pos += consumed
    full = np.empty(n, dtype=np.int64)
    full[: n - 1] = psums
    full[n - 1] = sum_of_values
    vals = np.empty(n, dtype=np.int64)
    vals[0] = full[0]
    vals[1:] = full[1:] - full[:-1]
    return vals.astype(np.uint32), pos
