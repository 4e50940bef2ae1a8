"""Device bit-unpack engine for the fixed-width zoo codecs.

optpfor and qmx payloads are width-selected bit-packed groups — on the
reference CPU they decode through unrolled SSE jump tables
(qmx_codec.hpp decode; FastPFor's OPTPFor).  The TPU-native design is
gather-free and dense:

* at LOAD time a planner walks the stream once and groups every full
  block by its bit width b.  A width class's payloads are a dense
  (N, bytes_per_block) u8 array — block payload sizes are exact
  multiples (256 values x b bits = 32b bytes; qmx: 16 x w = 2w bytes),
  so the class array has zero padding waste;
* at DECODE time each class runs one fused XLA op: bytes -> bits
  (broadcast shift), reshape to (N, values, b), weighted lane sum —
  pure VPU work with static shapes, no dynamic gathers;
* optpfor exceptions fold into the host-unpacked values at image
  compile time; blocks re-group by the smallest no-straddle ladder
  width holding the folded values, so the hot path carries no
  exception side-stream at all;
* partial tail blocks (interpolative) decode on the host each run.

Outputs are class-major (like the DINT serving image is row-major);
the plan keeps the block -> stream-order mapping for verification.
Timed runs chain inside one jit per class with a value-cancelling salt
(the runtime memoizes identical executions and completes work lazily —
see decode_local.decode_chain).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..codecs import blocks as blocks_mod
from ..codecs import interpolative, vbyte
from ..config import BLOCK_SIZE



@dataclass
class WidthClass:
    b: int
    payload: np.ndarray  # (N, bytes_per_block) u8
    out_base: np.ndarray  # (N,) i64 global output offset of each block
    size: np.ndarray  # (N,) i64 ints in each block (== values_per_block)
    # optpfor exceptions: blocks carrying exceptions are ordered FIRST
    # in the class, aligned with exc_dense rows (exc_dense (E, vpb)
    # u32, values pre-shifted by << b); the engine folds them into the
    # host-unpacked values at image-compile time — no exception work
    # on the hot path.
    exc_dense: np.ndarray = None
    # ladder plans only (keyword-only in spirit — keep LAST so the
    # positional constructions above stay stable): per-block u32
    # subtracted at plan time and broadcast-added back on device
    # (monotone streams — PEF docids — pack at the width of the
    # block's SPAN, not its absolute values)
    val_base: np.ndarray = None
    # ladder plans via the fused native builder
    # (native_host.decode_units_to_ladder): the class arrives ALREADY
    # bit-packed and lane-major ((W, M, 128) u32) — the engine ships
    # it as-is instead of running _pack_w + _lane_major (which cost
    # ~90 s of the 908M cold start in numpy).  payload is empty then.
    prepacked: np.ndarray = None


@dataclass
class UnpackPlan:
    codec: str  # 'optpfor' | 'qmx'
    values_per_block: int
    classes: List[WidthClass]
    # host-decoded partial tails: (global output offset, values)
    partials: List[Tuple[int, np.ndarray]]
    total_ints: int

    def plan_bytes(self) -> int:
        t = 0
        for c in self.classes:
            t += c.payload.nbytes + c.out_base.nbytes
            if c.exc_dense is not None:
                t += c.exc_dense.nbytes
            if c.prepacked is not None:
                t += c.prepacked.nbytes
        return t


def plan_optpfor(arena: np.ndarray, meta) -> UnpackPlan:
    """Walk an optpfor vroom stream (256-chunked lists, interpolative
    partial tails — index/vroom_zoo.py layout) into width classes."""
    per: Dict[int, list] = {}
    partials: List[Tuple[int, np.ndarray]] = []
    out_off = 0
    for i in range(meta.num_lists):
        n = int(meta.n[i])
        pos = int(meta.payload_off[i])
        for p in range(0, n, BLOCK_SIZE):
            size = min(BLOCK_SIZE, n - p)
            if size < BLOCK_SIZE:
                vals, pos = interpolative.decode_block(
                    arena, pos, size, blocks_mod.UNKNOWN
                )
                partials.append((out_off, vals.astype(np.uint32)))
            else:
                b = int(arena[pos])
                ne = int(arena[pos + 1]) | (int(arena[pos + 2]) << 8)
                q = pos + 3
                pay = arena[q : q + 32 * b]
                q += 32 * b
                epos = np.asarray(arena[q : q + ne], dtype=np.int64)
                q += ne
                highs = np.zeros(ne, np.int64)
                for e in range(ne):
                    hi, q = vbyte.decode_single(arena, q)
                    highs[e] = hi
                ent = per.setdefault(b, [])
                ent.append((pay, out_off, epos, highs))
                pos = q
            out_off += size
    classes = []
    for b, items in sorted(per.items()):
        # exception-bearing blocks first (dense slice-add, no scatter)
        items = sorted(items, key=lambda x: len(x[2]) == 0)
        pay = np.stack([x[0] for x in items]) if b else np.zeros(
            (len(items), 0), np.uint8
        )
        bases = np.asarray([x[1] for x in items], np.int64)
        E = sum(1 for x in items if len(x[2]))
        exc_dense = np.zeros((E, BLOCK_SIZE), np.uint32)
        for r in range(E):
            _, _, ep, hi = items[r]
            exc_dense[r, ep] = (hi << b).astype(np.uint64) & 0xFFFFFFFF
        classes.append(
            WidthClass(
                b, pay, bases,
                np.full(len(items), BLOCK_SIZE, np.int64),
                exc_dense,
            )
        )
    total = int(np.asarray(meta.n, np.int64).sum())
    return UnpackPlan("optpfor", BLOCK_SIZE, classes, partials, total)


def plan_qmx(arena: np.ndarray, meta) -> UnpackPlan:
    """Walk a qmx vroom stream (the ORIGINAL wire format, codecs/qmx.py:
    per list vbyte(len) + payload with reversed selector bytes at the
    end) into per-width instance classes.

    Every full instance of a striped width becomes one class row: its
    payload is 4 (or 8) u32 lane words and the device decode is a pure
    static shift/mask per (width, row) — no gathers, no bit walking.
    Byte/short/word widths (8/16/32) are fixed 16-byte rows; width 0
    emits runs of ONES generated on device.  Only a list's clamped
    final byte-form instance and n==1 bare-vbyte lists decode on the
    host (partials)."""
    from ..codecs import qmx as qmx_wire

    per: Dict[int, list] = {}
    partials: List[Tuple[int, np.ndarray]] = []
    out_off = 0
    for i in range(meta.num_lists):
        n = int(meta.n[i])
        pos = int(meta.payload_off[i])
        if n == 1:
            val, _ = vbyte.decode_single(arena, pos)
            partials.append((out_off, np.asarray([val], np.uint32)))
            out_off += 1
            continue
        ln, pos = vbyte.decode_single(arena, pos)
        payload = np.asarray(arena[pos : pos + ln], dtype=np.uint8)
        # selector bytes sit reversed at the payload end; walk them
        # backwards, carving instances off the forward payload
        p = 0
        k = ln - 1
        emitted = 0
        while p <= k and emitted < n:
            key = int(payload[k])
            k -= 1
            tpe = key >> 4
            low = key & 0x0F
            batch = 16 - low if low else 16
            w = qmx_wire._TYPE_TO_WIDTH[tpe]
            ints = qmx_wire._INTS[w]
            for _ in range(batch):
                take = min(ints, n - emitted)
                if take <= 0:
                    break
                if w == 0:
                    per.setdefault(0, []).append((None, out_off + emitted,
                                                  take))
                elif w in (8, 16, 32):
                    nb = w // 8
                    if take < ints:  # clamped final instance: host
                        vals = np.frombuffer(
                            payload[p : p + take * nb].tobytes(),
                            dtype={8: "<u1", 16: "<u2", 32: "<u4"}[w],
                        ).astype(np.uint32)
                        partials.append((out_off + emitted, vals))
                    else:
                        per.setdefault(w, []).append(
                            (payload[p : p + 16], out_off + emitted, take)
                        )
                    p += take * nb
                else:
                    nb = 32 if w in qmx_wire._DOUBLE else 16
                    per.setdefault(w, []).append(
                        (payload[p : p + nb], out_off + emitted, take)
                    )
                    p += nb
                emitted += take
        out_off += n
    classes = []
    for w, items in sorted(per.items()):
        if w == 0:
            pay = np.zeros((len(items), 0), np.uint8)
        else:
            pay = np.stack([x[0] for x in items])
        c = WidthClass(
            w,
            pay,
            np.asarray([x[1] for x in items], np.int64),
            np.asarray([x[2] for x in items], np.int64),
        )
        c.qmx = True
        classes.append(c)
    total = int(np.asarray(meta.n, np.int64).sum())
    return UnpackPlan("qmx", BLOCK_SIZE, classes, partials, total)


def plan_ladder(codec: str, arena: np.ndarray, meta) -> UnpackPlan:
    """Codec-independent serving image: the optpfor folded path
    generalized to any zoo codec.

    The wire format's job ends at load — the planner host-decodes the
    stream ONCE (the native whole-list decoders, codecs/zoonative.py,
    0.5-1.1 G ints/s), chunks the flat value stream into 256-value
    blocks, and groups blocks by the smallest no-straddle ladder width
    holding each block's values.  The device then decodes the same
    canonical image regardless of wire codec: one broadcast shift/mask
    kernel per width class (_fns), ~0.4-0.7 device-B/int on gap
    streams.  This is DINT's serving-image philosophy (the reference's
    mmap-and-decode-in-place has no TPU analogue; compile at load,
    stream at speed-of-light) applied to the whole zoo; `device_bytes`
    on the engine reports the image size honestly next to the wire
    stream size.  The wire-structure engines (plan_qmx/plan_simple16/
    plan_byteclass) remain for A/B and for deployments that cannot
    afford the load-time decode."""
    from ..index import vroom_zoo

    pef = codec == "pef"
    parts = []
    for i in range(meta.num_lists):
        n = int(meta.n[i])
        if pef:
            # PEF lists decode to absolute DOCIDS (monotone); the
            # per-block base subtraction below packs them at the width
            # of each block's span instead of the universe
            parts.append(
                vroom_zoo.decode_list_pef(
                    arena, int(meta.payload_off[i]),
                    int(meta.payload_len[i]), n, int(meta.universe[i]),
                ).astype(np.uint32, copy=False)
            )
        else:
            parts.append(
                vroom_zoo.decode_list_zoo(
                    codec, arena, int(meta.payload_off[i]), n
                ).astype(np.uint32, copy=False)
            )
    flat = (np.concatenate(parts) if parts else np.zeros(0, np.uint32))
    return ladder_plan_from_values(flat, base_relative=pef)


def ladder_plan_from_values(flat: np.ndarray,
                            base_relative: bool = False) -> UnpackPlan:
    """Build the canonical ladder UnpackPlan from an already-decoded
    flat value stream (stream order).  base_relative=True subtracts
    each block's minimum and ships it as val_base (monotone docid
    streams); False packs absolute values (gap streams).

    The classify+pack+lane-transpose passes run NATIVE by default
    (query_host.cpp qh_ladder_from_values — the numpy passes cost
    seconds per full-stream sweep on this VM's fresh-page-fault
    profile and dominated the PEF cold start); DINT_TPU_NATIVE_LADDER=0
    keeps the numpy oracle, parity-gated by tests/test_ladder_native.py."""
    import os as _os

    flat = np.ascontiguousarray(flat, dtype=np.uint32)
    if _os.environ.get("DINT_TPU_NATIVE_LADDER", "1") == "1":
        try:
            from ..query import native_host

            r = native_host.ladder_from_values(
                flat, BLOCK_SIZE, base_relative)
        except Exception:  # noqa: BLE001 — toolchain-less hosts
            r = None
        if r is not None:
            classes, tail = r
            return ladder_plan_prepacked(
                classes, tail, int(flat.shape[0]))
    total = int(flat.shape[0])
    vpb = BLOCK_SIZE
    nb = total // vpb
    blocks = flat[: nb * vpb].reshape(nb, vpb)
    tail = flat[nb * vpb:]
    partials = [(nb * vpb, tail.copy())] if tail.size else []
    classes: List[WidthClass] = []
    if nb:
        base = (blocks.min(axis=1) if base_relative
                else np.zeros(nb, np.uint32)).astype(np.uint32)
        rel = blocks - base[:, None] if base_relative else blocks
        mx = rel.max(axis=1)
        w_need = np.ceil(
            np.log2(mx.astype(np.float64) + 1.0)
        ).astype(np.int64)
        w_need = np.maximum(w_need, 1)
        lw = np.asarray([_ladder_width(int(w)) for w in w_need])
        for w in sorted(set(lw.tolist())):
            rows = np.flatnonzero(lw == w)
            # payload carries the VALUES (u32) for ladder plans; the
            # engine packs them at width w into the device image
            classes.append(
                WidthClass(
                    int(w), rel[rows],
                    rows.astype(np.int64) * vpb,
                    np.full(rows.size, vpb, np.int64),
                    val_base=(base[rows] if base_relative else None),
                )
            )
    return UnpackPlan("ladder", vpb, classes, partials, total)


def ladder_plan_prepacked(classes, tail: np.ndarray,
                          total: int) -> UnpackPlan:
    """Wrap the fused native builder's output
    (native_host.decode_units_to_ladder) as a ladder UnpackPlan:
    `classes` is [(w, lane_major (W, M, 128) u32, out_base (N,) i64)],
    already bit-packed and lane-transposed — the engine uploads them
    as-is.  Semantically identical to ladder_plan_from_values over the
    same value stream (parity-gated by tests/test_ladder_native.py)."""
    vpb = BLOCK_SIZE
    wcs: List[WidthClass] = []
    for cls in classes:
        w, lane, out_base = cls[:3]
        vbase = cls[3] if len(cls) > 3 else None
        n = out_base.shape[0]
        wcs.append(
            WidthClass(
                int(w), np.zeros((n, 0), np.uint8), out_base,
                np.full(n, vpb, np.int64), prepacked=lane,
                val_base=vbase,
            )
        )
    nb = (total - int(tail.shape[0])) // vpb
    partials = [(nb * vpb, tail)] if tail.size else []
    return UnpackPlan("ladder", vpb, wcs, partials, total)


@functools.lru_cache(maxsize=None)
def _qmx_fns(w: int):
    """Device decode for one QMX width class: ONE broadcast kernel.

    Lane words live lane-major on device — lo (4, M, 128) u32 (plus hi
    (4, M, 128) for the 32-byte double-word widths), one class
    instance per VPU lane.  The unpack broadcasts the class's static
    per-row shift vector (codecs/qmx.py _ROW_SHIFTS, incl. the 12/21
    gap bits) over a new row axis: out (4, R, M, 128) — minor dim 128,
    no lane padding, ONE fused op per class.  (The previous
    one-1-D-column-per-value form paid ~4 us of launch overhead per
    value column — hundreds of kernels per run; geometry, not
    arithmetic, was the bottleneck.)  Value j of instance i sits at
    [j & 3, j >> 2, i // 128, i % 128]; byte-form widths 8/16/32 remap
    their 4 payload words as (word, sub) with j = word * R + sub, and
    width 0 generates ones."""
    import jax.numpy as jnp

    from ..codecs import qmx as qmx_wire

    if w == 0:
        def unpack(lo, hi, salt):
            del hi
            M = lo.shape[1]
            return jnp.ones((4, 64, M, 128), jnp.uint32) + salt

        return (unpack,)

    if w in (8, 16, 32):
        R = 4 // (w // 8)
        svec = np.arange(R, dtype=np.uint32) * np.uint32(w)
        mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)

        def unpack(lo, hi, salt):
            del hi
            s = jnp.asarray(svec)[None, :, None, None]
            return ((lo[:, None] >> s) & mask) + salt  # (4, R, M, 128)

        return (unpack,)

    shifts = np.asarray(qmx_wire._ROW_SHIFTS[w], np.int64)
    mask = np.uint32((1 << w) - 1)
    spill = (shifts < 32) & (shifts + w > 32)
    high_only = shifts >= 32
    s_lo = np.where(shifts < 32, shifts, 0).astype(np.uint32)
    s_sp = np.where(spill, 32 - shifts, 0).astype(np.uint32)
    s_hi = np.where(high_only, shifts - 32, 0).astype(np.uint32)

    def unpack(lo, hi, salt):
        a = jnp.asarray(s_lo)[None, :, None, None]
        v = lo[:, None] >> a
        if spill.any() or high_only.any():
            b_ = jnp.asarray(s_sp)[None, :, None, None]
            c_ = jnp.asarray(s_hi)[None, :, None, None]
            v = jnp.where(jnp.asarray(high_only)[None, :, None, None],
                          hi[:, None] >> c_, v)
            v = v | jnp.where(jnp.asarray(spill)[None, :, None, None],
                              hi[:, None] << b_, jnp.uint32(0))
        return (v & mask) + salt  # (4, R, M, 128)

    return (unpack,)


def plan_simple16(arena: np.ndarray, meta) -> "Simple16Plan":
    """Walk a simple16 vroom stream into MODE classes: every 28-bit
    payload word with selector m decodes as a fixed set of static
    shifts, so a mode class is just a dense u32 word array — no
    gathers, no bit chains, pure elementwise device work."""
    from ..codecs.blocks import _S16_MODES
    from ..codecs.encode_batch import OPT_CHUNK

    per: Dict[int, list] = {i: [] for i in range(len(_S16_MODES))}
    out_off = 0
    for i in range(meta.num_lists):
        n = int(meta.n[i])
        pos = int(meta.payload_off[i])
        # lists are OPT_CHUNK-chunked (vroom_zoo.encode_list_zoo): each
        # chunk is an independent simple16 stream, so `take` caps at
        # the CHUNK end, not the list end
        for c0 in range(0, max(n, 1), OPT_CHUNK):
            cend = min(c0 + OPT_CHUNK, n)
            done = c0
            while done < cend:
                w = (
                    int(arena[pos])
                    | (int(arena[pos + 1]) << 8)
                    | (int(arena[pos + 2]) << 16)
                    | (int(arena[pos + 3]) << 24)
                )
                pos += 4
                mode = w >> 28
                cnt, bits = _S16_MODES[mode]
                take = min(cnt, cend - done)
                per[mode].append((w, out_off + done, take))
                done += take
        out_off += n
    classes = []
    for mode, items in per.items():
        cnt, bits = _S16_MODES[mode]
        words = np.asarray([x[0] for x in items], np.uint32)
        bases = np.asarray([x[1] for x in items], np.int64)
        takes = np.asarray([x[2] for x in items], np.int64)
        classes.append((mode, cnt, bits, words, bases, takes))
    total = int(np.asarray(meta.n, np.int64).sum())
    return Simple16Plan(classes, total)


@dataclass
class Simple16Plan:
    classes: list  # (mode, cnt, bits, words u32, out_bases, takes)
    total_ints: int

    def plan_bytes(self) -> int:
        return sum(c[3].nbytes + c[4].nbytes for c in self.classes)


class Simple16Engine:
    """Device decode of a simple16 plan: per mode class ONE broadcast
    kernel over lane-aligned words.

    Geometry matters more than arithmetic here: every fused XLA op
    costs ~4 us of launch overhead on this stack, so the earlier
    one-1-D-column-per-field form paid sum(cnt)=73 kernel launches per
    run (~0.3 ms) for ~80 MB of traffic.  Words reshape on the host to
    (M, 128) — one class row per VPU lane — and the unpack is a single
    elementwise broadcast (M, 1, 128) >> (1, cnt, 1) producing
    (M, cnt, 128): minor dim 128 (no lane padding), one kernel per
    mode class, nine kernels per run.  Measured on the 16.7M-int bench
    stream: 34 -> 102 G ints/s at runs=200 (dispatch-inclusive), 332 G
    steady-state at runs=1000."""

    def __init__(self, plan: Simple16Plan):
        import jax.numpy as jnp

        self.plan = plan
        self._dev = []
        for mode, cnt, bits, words, _, _ in plan.classes:
            n = words.shape[0]
            if not n:
                continue
            M = (n + 127) // 128
            w2 = np.zeros((M, 128), np.uint32)
            w2.reshape(-1)[:n] = words
            self._dev.append(
                (mode, cnt, bits, n, jnp.asarray(w2.view(np.int32)))
            )

    def decode_classes(self):
        outs = {}
        for mode, cnt, bits, n, w in self._dev:
            fn = _s16_fns(cnt, bits)[0]
            out = np.asarray(fn(w, np.uint32(0)))  # (M, cnt, 128)
            # value j of word r lives at [r//128, j, r%128]
            outs[mode] = np.moveaxis(out, 1, 2).reshape(-1, cnt)[:n]
        return outs

    def timed_chain(self, runs: int) -> float:
        import jax
        import jax.numpy as jnp

        spec = tuple((cnt, bits) for _, cnt, bits, _, _ in self._dev)
        args = tuple(w for _, _, _, _, w in self._dev)

        @functools.partial(jax.jit, static_argnames=("runs",))
        def chain_all(args, *, runs: int):
            def body(salt, _):
                s = jnp.uint32(0)
                cnt_total = 0
                for (cnt, bits), w in zip(spec, args):
                    out = _s16_unpack(w, cnt, bits, salt)
                    # materialize + sampled reduce (see _w_fns chain)
                    out = jax.lax.optimization_barrier(out)
                    samp = out[:8]
                    s = s + samp.sum(dtype=jnp.uint32)
                    cnt_total += samp.size
                return s - salt * jnp.uint32(cnt_total) + salt + jnp.uint32(1), None

            final, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
            return final

        int(np.asarray(chain_all(args, runs=runs)))  # warmup
        t0 = time.perf_counter()
        int(np.asarray(chain_all(args, runs=runs)))
        return time.perf_counter() - t0

    def decode_all_ordered(self) -> np.ndarray:
        outs = self.decode_classes()
        res = np.zeros(self.plan.total_ints, np.uint32)
        for mode, cnt, bits, words, bases, takes in self.plan.classes:
            if not words.shape[0]:
                continue
            vals = outs[mode]  # (N, cnt)
            for r in range(words.shape[0]):
                o, t = int(bases[r]), int(takes[r])
                res[o : o + t] = vals[r, :t]
        return res


def _s16_unpack(words_i32, cnt: int, bits: int, salt):
    """(M, 128) i32 selector words -> (M, cnt, 128) u32 fields + salt:
    one broadcast shift/mask kernel for the whole mode class (the
    28-bit payload of mode (cnt, bits))."""
    import jax
    import jax.numpy as jnp

    uw = jax.lax.bitcast_convert_type(words_i32, jnp.uint32)
    shifts = (jnp.arange(cnt, dtype=jnp.uint32)
              * jnp.uint32(bits))[None, :, None]
    mask = jnp.uint32((1 << bits) - 1)
    return ((uw[:, None, :] >> shifts) & mask) + salt


@functools.lru_cache(maxsize=None)
def _s16_fns(cnt: int, bits: int):
    import jax

    def decode(words, salt):
        return _s16_unpack(words, cnt, bits, salt) - salt

    return (jax.jit(decode),)


@dataclass
class ByteClassPlan:
    """Byte-length-class plan for the byte-granular codecs.

    Every value of a streamvbyte / varintgb / maskedvbyte / vbyte
    stream occupies 1..5 whole bytes; at load the planner excises each
    value's bytes into the dense array of its LENGTH class, so the
    device decode is one fused shift/or per class — the same
    zero-gather architecture as the width classes.  group_bits is 8
    for plain byte codecs, 7 for the vbyte family (marker bits masked
    off)."""

    codec: str
    group_bits: int
    classes: list  # (length, bytes (N, length) u8, out_base (N,) i64)
    total_ints: int
    # host-decoded partial tails (varint_G8IU's interpolative blocks):
    # (global output offset, values)
    partials: list = field(default_factory=list)

    def plan_bytes(self) -> int:
        return sum(c[1].nbytes + c[2].nbytes for c in self.classes)


def _byteclass_from_slices(codec, group_bits, data, starts, lens, total,
                           out_index=None, partials=None):
    per = {}
    if out_index is None:
        out_index = np.arange(starts.shape[0], dtype=np.int64)
    for L in np.unique(lens):
        if L <= 0:
            continue
        sel = np.flatnonzero(lens == L)
        idx = starts[sel][:, None] + np.arange(int(L))[None, :]
        per[int(L)] = (data[idx], out_index[sel].astype(np.int64))
    classes = [(L, b, o) for L, (b, o) in sorted(per.items())]
    return ByteClassPlan(codec, group_bits, classes, total, partials or [])


def plan_byteclass(codec: str, arena: np.ndarray, meta) -> ByteClassPlan:
    """Walk a byte-codec vroom stream into length classes.  Value
    positions come from the formats' own structure (ctrl codes /
    key bytes / marker bits), vectorized with the host decoders'
    machinery."""
    from ..codecs import blocks as blocks_mod

    offs = meta.payload_off.astype(np.int64)
    lens_pl = meta.payload_len.astype(np.int64)
    ns = meta.n.astype(np.int64)
    total = int(ns.sum())
    all_starts = np.zeros(total, np.int64)  # global value byte starts
    all_lens = np.zeros(total, np.int64)
    # flat excised payload (values are contiguous within each list's
    # payload; headers between lists are skipped via the excision)
    flat = np.concatenate(
        [arena[offs[i] : offs[i] + lens_pl[i]] for i in range(meta.num_lists)]
    ) if meta.num_lists else np.zeros(0, np.uint8)
    flat = np.concatenate([flat, np.zeros(8, np.uint8)])
    pl_base = np.concatenate([[0], np.cumsum(lens_pl)[:-1]])
    vbase = np.concatenate([[0], np.cumsum(ns)[:-1]])

    if codec in ("vbyte", "maskedvbyte"):
        # self-delimiting: marker bits give every boundary in one scan
        marked = (
            (flat & 0x80) != 0 if codec == "vbyte" else (flat & 0x80) == 0
        )
        term = np.flatnonzero(marked)[:total]
        ends = term.astype(np.int64)
        starts = np.concatenate([[0], ends[:-1] + 1])
        all_starts = starts
        all_lens = ends - starts + 1
        group_bits = 7
    elif codec == "streamvbyte":
        group_bits = 8
        for i in range(meta.num_lists):
            n = int(ns[i])
            if n == 0:
                continue
            p = pl_base[i]
            # ctrl block then data (possibly per OPT_CHUNK chunk)
            from ..codecs.encode_batch import OPT_CHUNK

            v0 = int(vbase[i])
            done = 0
            while done < n:
                c = min(OPT_CHUNK, n - done)
                nct = (c + 3) // 4
                ctrl = flat[p : p + nct]
                codes = np.zeros(c, np.int64)
                for j in range(4):
                    sel = np.arange(j, c, 4)
                    codes[sel] = (ctrl[: sel.shape[0]] >> (2 * j)) & 3
                ln = codes + 1
                st = p + nct + np.cumsum(ln) - ln
                all_starts[v0 + done : v0 + done + c] = st
                all_lens[v0 + done : v0 + done + c] = ln
                p = p + nct + int(ln.sum())
                done += c
    elif codec == "varintgb":
        group_bits = 8
        adv_t, lens_t = blocks_mod._vgb_tables()
        for i in range(meta.num_lists):
            n = int(ns[i])
            if n == 0:
                continue
            p = int(pl_base[i])
            v0 = int(vbase[i])
            from ..codecs.encode_batch import OPT_CHUNK

            done = 0
            while done < n:
                c = min(OPT_CHUNK, n - done)
                G = (c + 3) // 4
                # bound the chain domain by the chunk's worst case
                # (17 bytes per group) — the whole remaining flat
                # buffer would make planning O(total^2)
                seg = np.concatenate(
                    [flat[p : p + 17 * G], np.zeros(8, np.uint8)]
                )
                adv = adv_t[seg[: max(seg.shape[0] - 8, 1)]]
                gpos = blocks_mod._chain_positions(adv, G)
                keys = seg[gpos]
                l4 = lens_t[keys]  # (G, 4)
                pref = np.concatenate(
                    [np.zeros((G, 1), np.int64), np.cumsum(l4, axis=1)[:, :3]],
                    axis=1,
                )
                st = (p + gpos[:, None] + 1 + pref).reshape(-1)[:c]
                ln = l4.reshape(-1)[:c]
                all_starts[v0 + done : v0 + done + c] = st
                all_lens[v0 + done : v0 + done + c] = ln
                used = c - 4 * (G - 1)
                p = int(gpos[-1]) + p + 1 + int(l4[-1, :used].sum())
                done += c
    elif codec == "varintg8iu":
        # 256-chunked; full chunks are 9-byte desc+data groups, partial
        # tails are interpolative (decoded host-side per run)
        group_bits = 8
        partials = []
        st_l, ln_l, oi_l = [], [], []
        for i in range(meta.num_lists):
            n = int(ns[i])
            p = int(pl_base[i])
            v0 = int(vbase[i])
            done = 0
            while done < n:
                c = min(BLOCK_SIZE, n - done)
                if c < BLOCK_SIZE:
                    vals, consumed = interpolative.decode_block(
                        flat, int(p), c, blocks_mod.UNKNOWN
                    )
                    partials.append((v0 + done, vals.astype(np.uint32)))
                    p = consumed
                    done += c
                    continue
                got = 0
                while got < c:
                    desc = int(flat[p]) ^ 0xFF  # cleared bit = value end
                    bits = [(desc >> b) & 1 for b in range(8)]
                    start = 0
                    for b in range(8):
                        if bits[b]:
                            st_l.append(p + 1 + start)
                            ln_l.append(b + 1 - start)
                            oi_l.append(v0 + done + got)
                            start = b + 1
                            got += 1
                            if got == c:
                                break
                    p += 9
                done += c
        return _byteclass_from_slices(
            codec, group_bits, flat,
            np.asarray(st_l, np.int64), np.asarray(ln_l, np.int64),
            total, np.asarray(oi_l, np.int64), partials,
        )
    else:
        raise ValueError(codec)
    return _byteclass_from_slices(
        codec, group_bits, flat, all_starts, all_lens, total
    )


class ByteClassEngine:
    """Device decode of a ByteClassPlan: per length class one fused
    shift/or over the dense byte array."""

    def __init__(self, plan: ByteClassPlan):
        import jax.numpy as jnp

        self.plan = plan
        # split class byte matrices into dense 1-D columns on the host:
        # an (N, L) u8 device array lane-pads L -> 128 (see
        # _byteclass_unpack)
        self._dev = [
            (int(L),
             tuple(jnp.asarray(np.ascontiguousarray(b[:, i]))
                   for i in range(int(L))))
            for L, b, _ in plan.classes if b.shape[0]
        ]

    def decode_classes(self):
        outs = {}
        for L, cols in self._dev:
            fn = _byteclass_fns(L, self.plan.group_bits)[0]
            outs[L] = np.asarray(fn(cols, np.uint32(0)))
        return outs

    def timed_chain(self, runs: int) -> float:
        import jax
        import jax.numpy as jnp

        spec = tuple(L for L, _ in self._dev)
        args = tuple(cols for _, cols in self._dev)
        gb = self.plan.group_bits

        pvals = jnp.asarray(
            np.concatenate(
                [v for _, v in self.plan.partials] or [np.zeros(0, np.uint32)]
            )
        )

        @functools.partial(jax.jit, static_argnames=("runs",))
        def chain_all(args, pvals, *, runs: int):
            def body(salt, _):
                s = jnp.uint32(0)
                cnt = 0
                for L, cols in zip(spec, args):
                    out = _byteclass_unpack(cols, gb, salt)
                    # materialize + sampled reduce (see _w_fns chain)
                    out = jax.lax.optimization_barrier(out)
                    samp = out[:8]
                    s = s + samp.sum(dtype=jnp.uint32)
                    cnt += samp.size
                pv = jax.lax.optimization_barrier(pvals + salt)
                s = s + pv.sum(dtype=jnp.uint32)
                cnt += pv.size
                return s - salt * jnp.uint32(cnt) + salt + jnp.uint32(1), None

            final, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
            return final

        int(np.asarray(chain_all(args, pvals, runs=runs)))  # warmup
        t0 = time.perf_counter()
        int(np.asarray(chain_all(args, pvals, runs=runs)))
        return time.perf_counter() - t0

    def decode_all_ordered(self) -> np.ndarray:
        outs = self.decode_classes()
        res = np.zeros(self.plan.total_ints, np.uint32)
        for L, b, o in self.plan.classes:
            if b.shape[0]:
                res[o] = outs[int(L)]
        for off, vals in self.plan.partials:
            res[off : off + vals.shape[0]] = vals
        return res


def _byteclass_unpack(cols, group_bits: int, salt):
    """L dense (N,) u8 column arrays -> (N,) u32 + salt: little-endian
    groups of `group_bits` bits per byte (7 for the vbyte family:
    marker masked).  Columns are split on the HOST at plan time: an
    (N, L) u8 array would lane-pad L -> 128 on device (measured ~3x
    slower end-to-end), while 1-D arrays stay dense."""
    import jax.numpy as jnp

    mask = jnp.uint32(0xFF if group_bits == 8 else 0x7F)
    v = jnp.zeros(cols[0].shape[0], jnp.uint32)
    for i, c in enumerate(cols):
        v = v | ((c.astype(jnp.uint32) & mask) << jnp.uint32(group_bits * i))
    return v + salt


@functools.lru_cache(maxsize=None)
def _byteclass_fns(L: int, group_bits: int):
    import jax

    def decode(cols, salt):
        return _byteclass_unpack(cols, group_bits, salt) - salt

    return (jax.jit(decode),)


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def _phase_geometry(b: int, vpb: int):
    """Static unpack geometry: values group by their bit phase within a
    u32 word.  Values j and j+P share shift s(j) (P = 32/gcd(b,32)), so
    each phase's fields read from STRIDED word slices — the whole
    unpack is shifts/ors over slices, no gathers and no per-bit work
    (the numpy form of SIMD bit unpacking; used at plan time)."""
    import math

    P = 32 // math.gcd(b, 32) if b else 1
    P_eff = min(P, vpb)
    C = vpb // P_eff  # values per phase
    stride_k = (b * P_eff) // 32  # words between consecutive same-phase values
    geo = []
    for p in range(P_eff):
        bit = p * b
        geo.append((bit // 32, bit % 32))
    return P_eff, C, stride_k, geo


def _np_phase_unpack(words: np.ndarray, b: int, vpb: int) -> np.ndarray:
    """Host mirror of the phase-grouped bit unpack: (N, W) u32 payload
    words at width b -> (N, vpb) u32 values (low bits only)."""
    N = words.shape[0]
    if b == 0:
        return np.zeros((N, vpb), np.uint32)
    P_eff, C, stride_k, geo = _phase_geometry(b, vpb)
    mask = np.uint32((1 << b) - 1) if b < 32 else np.uint32(0xFFFFFFFF)
    out = np.zeros((N, vpb), np.uint32)
    for p, (k0, s) in enumerate(geo):
        end = k0 + (C - 1) * stride_k + 1 if C > 1 else k0 + 1
        w1 = words[:, k0:end:stride_k] if C > 1 else words[:, k0 : k0 + 1]
        v = (w1 >> np.uint32(s)) & mask
        if s + b > 32:
            w2 = (words[:, k0 + 1 : end + 1 : stride_k]
                  if C > 1 else words[:, k0 + 1 : k0 + 2])
            v = v | ((w2.astype(np.uint64) << np.uint64(32 - s)).astype(
                np.uint32) & mask)
        out[:, p::P_eff] = v
    return out


# serving-image width ladder: the distinct no-straddle container widths
# (vpw = 32 // w values per u32 word, values never cross a word) — the
# smallest ladder width >= a block's needed bit width is its class
_LADDER = (1, 2, 3, 4, 5, 6, 8, 10, 16, 32)


def _ladder_width(w_need: int) -> int:
    for w in _LADDER:
        if w >= w_need:
            return w
    return 32


def _pack_w(values: np.ndarray, w: int) -> np.ndarray:
    """(N, vpb) u32 values (< 2^w) -> (N, ceil(vpb/vpw)) u32 words with
    vpw = 32//w little-endian w-bit fields per word (no value straddles
    a word; value j of a row sits in word j//vpw at shift (j%vpw)*w).
    The value axis zero-pads up to a whole word."""
    vpw = 32 // w
    N, vpb = values.shape
    W = -(-vpb // vpw)
    if W * vpw != vpb:
        values = np.concatenate(
            [values, np.zeros((N, W * vpw - vpb), np.uint32)], axis=1
        )
    v = values.reshape(N, W, vpw).astype(np.uint64)
    shifts = np.arange(vpw, dtype=np.uint64) * np.uint64(w)
    return (v << shifts).sum(axis=2, dtype=np.uint64).astype(np.uint32)


def _lane_major(words: np.ndarray) -> np.ndarray:
    """(N, W) u32 -> (W, M, 128): word k of row i at [k, i//128, i%128]
    — one class row per VPU lane, zero-padded to the lane grid."""
    N, W = words.shape
    M = max(1, (N + 127) // 128)
    out = np.zeros((W, M * 128), np.uint32)
    out[:, :N] = words.T
    return np.ascontiguousarray(out.reshape(W, M, 128))


@functools.lru_cache(maxsize=None)
def _fns(w: int):
    """Device decode for one optpfor width class: ONE broadcast kernel.

    The engine folds exception highs into the host-unpacked values and
    re-packs each block at its actual required ladder width w at load
    time (serving-image compilation — the same philosophy as DINT's
    local-table image): every value then lives whole inside one u32
    word at shift (r*w), so the unpack is a single broadcast
    (W', 1, M, 128) >> (1, vpw, 1, 1) producing (W', vpw, M, 128) —
    minor dim 128, one fused op per class, no exception side-stream.
    (The previous per-phase strided-slice form paid ~4 us of launch
    overhead per XLA op; the earlier pow2 re-pack plus dense exception
    add cost up to 4 extra HBM bytes per int on exception-bearing
    blocks.)  Value j of block i sits at
    [j // vpw, j % vpw, i // 128, i % 128]."""
    import jax.numpy as jnp

    vpw = 32 // w
    mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)

    def unpack(wT, hi, salt):
        del hi
        s = (jnp.arange(vpw, dtype=jnp.uint32)
             * jnp.uint32(w))[None, :, None, None]
        out = (wT[:, None] >> s) & mask  # (W', vpw, M, 128)
        return out + salt  # value-cancelling salt (wrap-add u32)

    return (unpack,)


@functools.lru_cache(maxsize=None)
def _fns_base(w: int):
    """Ladder unpack + per-block base broadcast-add (PEF docid image:
    blocks pack RELATIVE values at their span width; the block minimum
    rides as one u32 per lane and adds back here)."""
    import jax.numpy as jnp

    vpw = 32 // w
    mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)

    def unpack(wT, bT, salt):
        s = (jnp.arange(vpw, dtype=jnp.uint32)
             * jnp.uint32(w))[None, :, None, None]
        out = (wT[:, None] >> s) & mask  # (W', vpw, M, 128)
        return out + bT[None, None] + salt

    return (unpack,)


def _kind_fns(kind: str, b: int):
    if kind == "qmx":
        return _qmx_fns(b)
    if kind == "pforb":
        return _fns_base(b)
    return _fns(b)


class UnpackEngine:
    """Runs one UnpackPlan on device (class-major outputs).

    At load the plan's payload compiles into a lane-major device image
    — one class row per VPU lane — so every width class decodes as ONE
    broadcast kernel (see _fns/_qmx_fns).  optpfor blocks host-unpack,
    fold their exception highs into the values, and re-group by the
    smallest no-straddle ladder width that holds the folded values
    (image compilation, like DINT's serving plan; `device_bytes`
    reports the image size next to the plan's wire-faithful
    plan_bytes).  Device classes therefore do not map 1:1 onto plan
    classes; `self._meta` carries each device class's (out_base, size)
    block mapping."""

    def __init__(self, plan: UnpackPlan):
        import jax.numpy as jnp

        self.plan = plan
        self._dev = []   # (kind, w, a0, a1) per device class
        self._meta = []  # (out_base, size) per device class
        self.device_bytes = 0
        qmx = plan.codec == "qmx"
        vpb = plan.values_per_block
        if plan.codec == "ladder":
            # plan classes carry host-decoded VALUES already grouped by
            # ladder width: pack each class at its width and ship.
            # val_base (PEF docids) rides as a second lane-major array
            # broadcast-added back inside the kernel.
            for c in plan.classes:
                wT = jnp.asarray(
                    c.prepacked if c.prepacked is not None else
                    _lane_major(_pack_w(c.payload.astype(np.uint32), c.b))
                )
                if c.val_base is not None:
                    # slice to (M, 128) on the HOST: a device-side [0]
                    # executes an op that must wait for this class's
                    # queued wT upload (the relay moves ~6-8 MB/s), so
                    # the ctor was paying a forced sync per PEF class —
                    # 4 x ~1.5 s of the recorded PEF cold start.  Host
                    # slicing keeps the ctor a pure async upload issue
                    # like every other codec's.
                    bT = jnp.asarray(
                        _lane_major(c.val_base[:, None].astype(np.uint32)
                                    )[0]  # (M, 128)
                    )
                    self._dev.append(("pforb", int(c.b), wT, bT))
                    self.device_bytes += bT.nbytes
                else:
                    self._dev.append(("pfor", int(c.b), wT, None))
                self._meta.append((c.out_base, c.size))
                self.device_bytes += wT.nbytes
            return
        if qmx:
            for c in plan.classes:
                n = c.payload.shape[0]
                self._meta.append((c.out_base, c.size))
                if c.b == 0:
                    # width-0 QMX instances decode to ones ON DEVICE
                    # (the unpack fn generates them); only the
                    # lane-grid height is needed
                    M = max(1, (n + 127) // 128)
                    self._dev.append(
                        ("qmx", 0, jnp.zeros((1, M, 1), jnp.uint32), None)
                    )
                    continue
                pay8 = c.payload
                padc = (-pay8.shape[1]) % 4
                if padc:
                    pay8 = np.concatenate(
                        [pay8, np.zeros((n, padc), np.uint8)], axis=1
                    )
                words = np.ascontiguousarray(pay8).view("<u4")
                # lo/hi lane words, lane-major: (4, M, 128) each
                lo = jnp.asarray(_lane_major(words[:, :4]))
                hi = (jnp.asarray(_lane_major(words[:, 4:8]))
                      if words.shape[1] > 4 else None)
                self._dev.append(("qmx", int(c.b), lo, hi))
                self.device_bytes += lo.nbytes + (hi.nbytes if hi is not None
                                                  else 0)
            return
        # optpfor: host-unpack every block, fold exception highs into
        # the values (exception blocks are ordered first in each plan
        # class, aligned with exc_dense rows), then re-classify by the
        # smallest ladder width that holds the folded values
        per_w: Dict[int, list] = {}
        for c in plan.classes:
            n = c.payload.shape[0]
            if c.b == 0:
                values = np.zeros((n, vpb), np.uint32)
            else:
                pay8 = c.payload
                padc = (-pay8.shape[1]) % 4
                if padc:
                    pay8 = np.concatenate(
                        [pay8, np.zeros((n, padc), np.uint8)], axis=1
                    )
                words = np.ascontiguousarray(pay8).view("<u4")
                values = _np_phase_unpack(words, int(c.b), vpb)
            if c.exc_dense is not None and c.exc_dense.shape[0]:
                values[: c.exc_dense.shape[0]] += c.exc_dense
            # needed bit width per block (exact for ints <= 2^32 in f64)
            w_need = np.ceil(
                np.log2(values.max(axis=1).astype(np.float64) + 1.0)
            ).astype(np.int64)
            w_need = np.maximum(w_need, 1)
            for r in range(n):
                per_w.setdefault(_ladder_width(int(w_need[r])), []).append(
                    (values[r], int(c.out_base[r]), int(c.size[r]))
                )
        for w in sorted(per_w):
            items = per_w[w]
            vals = np.stack([x[0] for x in items])
            wT = jnp.asarray(_lane_major(_pack_w(vals, w)))
            self._dev.append(("pfor", w, wT, None))
            self._meta.append((
                np.asarray([x[1] for x in items], np.int64),
                np.asarray([x[2] for x in items], np.int64),
            ))
            self.device_bytes += wT.nbytes

    @staticmethod
    def _reorder(kind: str, b: int, out: np.ndarray, n: int) -> np.ndarray:
        """(.., .., M, 128) class output -> (N, ints) in value order."""
        if kind in ("pfor", "pforb") or b in (8, 16, 32):
            # value j at [j // R2, j % R2, i // 128, i % 128]
            a = np.transpose(out, (2, 3, 0, 1))
        else:
            # striped: value j at [j & 3, j >> 2, ...]
            a = np.transpose(out, (2, 3, 1, 0))
        return a.reshape(a.shape[0] * a.shape[1], -1)[:n]

    def decode_classes(self) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp

        outs = []
        for (out_base, size), dev in zip(self._meta, self._dev):
            kind, b, a0, a1 = dev
            n = out_base.shape[0]
            fn = jax.jit(_kind_fns(kind, b)[0])
            out = np.asarray(fn(a0, a1, jnp.uint32(0)))
            outs.append(self._reorder(kind, b, out, n))
        return outs

    def timed_chain(self, runs: int) -> float:
        """Seconds for `runs` full device decodes: ALL width classes
        chain inside ONE jit (one dispatch — the fixed per-dispatch
        relay overhead would otherwise multiply by the class count),
        salted per run, final checksum fetched to the host."""
        import jax
        import jax.numpy as jnp

        specs = []  # (kind, b) static parts, aligned with args
        args = []
        for dev in self._dev:
            kind, b, a0, a1 = dev
            specs.append((kind, b))
            args.append((a0, a1 if a1 is not None
                         else jnp.zeros((0,), jnp.uint32)))
        specs_t = tuple(specs)

        # partial tails are hosted plan values; per run they
        # materialize on device like every other value
        pvals = jnp.asarray(
            np.concatenate(
                [v for _, v in self.plan.partials]
                or [np.zeros(0, np.uint32)]
            )
        )

        @functools.partial(jax.jit, static_argnames=("runs",))
        def chain_all(args, pvals, *, runs: int):
            def body(salt, _):
                s = jnp.uint32(0)
                cnt = 0
                for (kind, b), (a0, a1) in zip(specs_t, args):
                    unpack = _kind_fns(kind, b)[0]
                    out = unpack(a0, a1, salt)
                    # materialize + sampled reduce (see _w_fns chain)
                    out = jax.lax.optimization_barrier(out)
                    samp = out[:1, :1, :8]
                    s = s + samp.sum(dtype=jnp.uint32)
                    cnt += samp.size
                pv = jax.lax.optimization_barrier(pvals + salt)
                s = s + pv.sum(dtype=jnp.uint32)
                cnt += pv.size
                return s - salt * jnp.uint32(cnt), None

            final, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
            return final

        int(np.asarray(chain_all(args, pvals, runs=runs)))  # compile warmup
        t0 = time.perf_counter()
        int(np.asarray(chain_all(args, pvals, runs=runs)))
        return time.perf_counter() - t0

    def decode_all_ordered(self) -> np.ndarray:
        """Full stream decode assembled back to stream order (host
        reorder; used by --check)."""
        out = np.zeros(self.plan.total_ints, np.uint32)
        for (out_base, size), vals in zip(self._meta, self.decode_classes()):
            for r in range(out_base.shape[0]):
                o = int(out_base[r])
                k = int(size[r])
                out[o : o + k] = vals[r, :k]
        for off, vals in self.plan.partials:
            out[off : off + vals.shape[0]] = vals
        return out
