"""Tight variable-byte codec.

Byte-compatible with the reference's ``TightVariableByte``
(block_codecs.hpp:20-102): little-endian 7-bit groups, the HIGH bit set
marks the LAST byte of a value (note: inverted vs. the common
continuation-bit convention).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def encode_single(val: int) -> bytes:
    out = bytearray()
    v = int(val) & 0xFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v == 0:
            out.append(b | 0x80)
            return bytes(out)
        out.append(b)


def encode(values: np.ndarray) -> bytes:
    out = bytearray()
    for v in np.asarray(values, dtype=np.uint64):
        out += encode_single(int(v))
    return bytes(out)


def decode(buf, pos: int, n: int) -> Tuple[np.ndarray, int]:
    """Decode n values starting at byte offset pos; returns (values, new_pos)."""
    vals = np.empty(n, dtype=np.uint32)
    for i in range(n):
        v = 0
        shift = 0
        while True:
            c = int(buf[pos])  # buf may be a numpy u8 array
            pos += 1
            v += (c & 0x7F) << shift
            if c & 0x80:
                break
            shift += 7
        vals[i] = v & 0xFFFFFFFF
    return vals, pos


def decode_single(buf, pos: int) -> Tuple[int, int]:
    vals, pos = decode(buf, pos, 1)
    return int(vals[0]), pos


def encoded_size(val: int) -> int:
    v = int(val)
    n = 1
    while v >= 1 << 7:
        v >>= 7
        n += 1
    return n
