"""QMX: the ORIGINAL wire format (qmx.hpp), bit-true.

Re-implemented from the reference's behavior (include/ds2i/qmx.hpp —
Trotman's "QMX: Quantities, Multipliers, eXtractors") and
cross-validated byte-for-byte against the reference codec compiled from
the read-only checkout (tests/test_ref_parity.py::test_qmx_*).

Format summary (all little-endian):

* Every value is assigned a QMX width in {0,1,2,3,4,5,6,7,8,9,10,12,
  16,21,32} bits — width 0 means the value IS 1 (runs of ones are
  free); value 0 costs 1 bit.
* Widths are quantized to aligned groups of 4 (group max), then a
  greedy promotion pass forces each full "instance" worth of values
  (256,128,64,40,32,24,20,36,16,28,12,20,8,12,4 values for the widths
  above, in order) to share one width, promoting a head group to the
  next width whenever a later group in the window needs more bits;
  short tails near the end of the input are promoted straight to
  8/16/32-bit byte forms.
* Values are then RLE'd into runs of equal width.  Each run is a
  sequence of instances; each batch of <= 16 instances gets one
  selector byte (width_type << 4) | (~(batch-1) & 0xF).
* Striped widths (everything except 0/8/16/32) pack an instance as 4
  interleaved lane bitstreams: value v of the instance occupies bits
  [(v//4)*w, (v//4)*w + w) of lane (v & 3), lanes being 32-bit words
  of one 128-bit word (widths 7/9/12/21 continue into a second 128-bit
  word, i.e. 64-bit lanes).  Widths 8/16/32 are plain byte/short/word
  streams clamped at the run's true value count; width 0 emits
  nothing.
* Selector bytes are appended REVERSED after the payload; the decoder
  walks them backwards from the end of the buffer.

The whole-list wrapper (vroom codecs.hpp:333-361) and the 256-block
wrapper (block_codecs.hpp:320-355) both frame the payload as
TightVariableByte(len) + payload; n == 1 lists are a bare vbyte.
"""

from __future__ import annotations

import numpy as np

# width -> (type nibble, values per instance, 128-bit words per instance)
WIDTHS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 21, 32)
_TYPE = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7,
         8: 8, 9: 9, 10: 10, 12: 11, 16: 12, 21: 13, 32: 14}
_INTS = {0: 256, 1: 128, 2: 64, 3: 40, 4: 32, 5: 24, 6: 20, 7: 36,
         8: 16, 9: 28, 10: 12, 12: 20, 16: 8, 21: 12, 32: 4}
_TYPE_TO_WIDTH = {t: w for w, t in _TYPE.items()}
_NEXT = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 7, 7: 8, 8: 9, 9: 10,
         10: 12, 12: 16, 16: 21, 21: 32, 32: 64}
_DOUBLE = {7, 9, 12, 21}  # two 128-bit words per instance

# Lane bit offset of row k (values 4k..4k+3 of an instance).  Mostly
# k*w, but the reference's 12- and 21-bit packers place the row after
# the word-straddling one at (32 - straddle_start) instead of at the
# straddle's end, leaving unused gap bits (4 for w=12 at lane bits
# 36-39, 1 for w=21 at lane bit 42) — part of the wire format.
_ROW_SHIFTS = {w: tuple(k * w for k in range(_INTS[w] // 4)) for w in WIDTHS
               if w not in (0, 8, 16, 32)}
_ROW_SHIFTS[12] = (0, 12, 24, 40, 52)
_ROW_SHIFTS[21] = (0, 21, 43)

# bits_needed_for thresholds: value <= _THRESH[i] -> width _WBITS[i]
# (value == 1 is special-cased to width 0)
_THRESH = np.array(
    [1, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 4095, 65535, 0x1FFFFF],
    dtype=np.int64,
)
_WBITS = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 16, 21, 32],
                  dtype=np.uint8)


def _widths_of(v: np.ndarray) -> np.ndarray:
    w = _WBITS[np.searchsorted(_THRESH, v.astype(np.int64), side="left")]
    w[v == 1] = 0
    return w


def _quantize_and_promote(w: np.ndarray, n: int) -> np.ndarray:
    """The reference's length-processing passes over len_buf.

    Returns the per-position widths after 4-group quantization, the
    short-tail byte-form rules, and the greedy instance promotion —
    every position's final width, so runs can be RLE'd directly.
    """
    # pad with zero-widths (the reference's WASTAGE region)
    ln = np.zeros(n + 512, dtype=np.uint8)
    ln[:n] = w
    # 4-aligned group max over [0, n+4)
    gl = n + 4 - (n + 4) % 4
    g = ln[:gl].reshape(-1, 4).max(axis=1)
    ln[:gl] = np.repeat(g, 4)

    p = 0
    while p < n:
        remaining = n - p
        if remaining < 4:
            largest = int(ln[p : p + 8].max())
            if largest <= 8:
                ln[p : p + 8] = 8
            elif largest <= 16:
                ln[p : p + 8] = 16
            elif largest <= 32:
                ln[p : p + 8] = 32
        elif remaining < 8:
            largest = int(ln[p : p + 8].max())
            if largest <= 8:
                ln[p : p + 8] = 8
            # (the reference's 16-bit arm is unreachable: its condition
            # repeats `largest <= 8` — mirrored by doing nothing here)
        elif remaining < 16:
            largest = int(ln[p : p + 16].max())
            if largest <= 8:
                ln[p : p + 16] = 8

        s = int(ln[p])
        ints = _INTS[s]
        # promote the head 4-group if any group in the instance window
        # needs more bits; otherwise claim the whole instance at s
        if s == 32:
            ln[p : p + 4] = 32
            p += 4
            continue
        window = ln[p : p + ints : 4]
        if (window > s).any():
            ln[p : p + 4] = _NEXT[s]
            continue  # re-examine at the promoted width
        ln[p : p + ints] = s
        p += ints
    return ln[:n]


def _pack_striped(vals: np.ndarray, w: int) -> bytes:
    """Pack instances of a striped width (everything but 0/8/16/32).

    vals length is a multiple of _INTS[w] (zero-padded by the caller).
    Lane layout: value v -> 64-bit lane (v & 3), bit offset (v//4)*w.
    """
    ints = _INTS[w]
    m = vals.reshape(-1, ints).astype(np.uint64)
    per_lane = ints // 4
    shifts = _ROW_SHIFTS[w]
    lanes = np.zeros((m.shape[0], 4), dtype=np.uint64)
    for k in range(per_lane):
        lanes |= m[:, 4 * k : 4 * k + 4] << np.uint64(shifts[k])
    if w in _DOUBLE:
        # two 128-bit words: lane low 32 bits first, then high 32
        out = np.empty((m.shape[0], 8), dtype="<u4")
        out[:, :4] = (lanes & np.uint64(0xFFFFFFFF)).astype("<u4")
        out[:, 4:] = (lanes >> np.uint64(32)).astype("<u4")
    else:
        out = (lanes & np.uint64(0xFFFFFFFF)).astype("<u4")
    return out.tobytes()


def encode(values, sum_of_values=None) -> bytes:
    """QMX-encode values (qmx.hpp codec::encode, byte-identical)."""
    v = np.ascontiguousarray(values, dtype="<u4")
    n = int(v.shape[0])
    if n == 0:
        return b""
    ln = _quantize_and_promote(_widths_of(v), n)

    payload = bytearray()
    keys = bytearray()

    # RLE over equal widths
    bounds = np.flatnonzero(np.diff(ln.astype(np.int16))) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [n]])
    for st, en in zip(starts, ends):
        wbits = int(ln[st])
        ints = _INTS[wbits]
        raw = int(en - st)
        count = -(-raw // ints)  # instances
        tpe = _TYPE[wbits]
        # selector bytes, one per batch of <= 16 instances
        c = count
        while c > 0:
            batch = min(16, c)
            keys.append((tpe << 4) | (~(batch - 1) & 0x0F))
            c -= batch
        if wbits == 0:
            continue
        if wbits in (8, 16, 32):
            # plain byte/short/word stream clamped at raw values
            dt = {8: "<u1", 16: "<u2", 32: "<u4"}[wbits]
            payload += v[st:en].astype(dt).tobytes()
        else:
            vals = v[st:en]
            if raw != count * ints:
                vals = np.concatenate(
                    [vals, np.zeros(count * ints - raw, "<u4")]
                )
            payload += _pack_striped(vals, wbits)

    return bytes(payload) + bytes(reversed(keys))


def _unpack_striped(words: np.ndarray, w: int, count: int) -> np.ndarray:
    """Inverse of _pack_striped: words is (count, 4 or 8) u32."""
    ints = _INTS[w]
    per_lane = ints // 4
    if w in _DOUBLE:
        lanes = words[:, :4].astype(np.uint64) | (
            words[:, 4:].astype(np.uint64) << np.uint64(32)
        )
    else:
        lanes = words.astype(np.uint64)
    out = np.empty((count, ints), dtype=np.uint32)
    mask = np.uint64((1 << w) - 1)
    for k, sh in enumerate(_ROW_SHIFTS[w]):
        out[:, 4 * k : 4 * k + 4] = (
            (lanes >> np.uint64(sh)) & mask
        ).astype(np.uint32)
    return out.reshape(-1)


def decode_payload(payload, n: int) -> np.ndarray:
    """Decode a full QMX payload (qmx.hpp codec::decode semantics).

    Selector bytes are walked backwards from the end; each emits
    batch * ints(width) values (the byte/short/word forms clamp at the
    remaining output count, mirroring the encoder's clamped writes).
    """
    data = np.frombuffer(bytes(payload), dtype=np.uint8)
    # slack: one selector byte can command 16 instances x 256 values
    out = np.empty(n + 16 * 256 + 64, dtype=np.uint32)
    filled = 0
    p = 0  # payload read position
    k = data.shape[0] - 1  # selector read position (backwards)
    while p <= k and filled < n:
        key = int(data[k])
        k -= 1
        tpe = key >> 4
        low = key & 0x0F
        batch = 16 - low if low else 16
        w = _TYPE_TO_WIDTH[tpe]
        ints = _INTS[w]
        if w == 0:
            out[filled : filled + batch * 256] = 1
            filled += batch * 256
        elif w in (8, 16, 32):
            dt = {8: "<u1", 16: "<u2", 32: "<u4"}[w]
            nb = w // 8
            # clamped: the encoder wrote min(batch*ints, remaining)
            take = min(batch * ints, n - filled)
            nbytes = take * nb
            vals = np.frombuffer(
                data[p : p + nbytes].tobytes(), dtype=dt
            ).astype(np.uint32)
            out[filled : filled + take] = vals
            filled += take
            p += nbytes
        else:
            words_per = 8 if w in _DOUBLE else 4
            nbytes = batch * words_per * 4
            words = np.frombuffer(
                data[p : p + nbytes].tobytes(), dtype="<u4"
            ).reshape(batch, words_per)
            vals = _unpack_striped(words, w, batch)
            out[filled : filled + batch * ints] = vals
            filled += batch * ints
            p += nbytes
    return out[:n].copy()
