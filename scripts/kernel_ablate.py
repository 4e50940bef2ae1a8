"""Ablation harness for the local decode kernel (real-TPU timings).

Loads the cached bench serving plan and times kernel variants with the
chained-salt + fetch-forced discipline (see tools/decode.py::timed_runs
for why: the runtime memoizes identical executions and completes work
lazily).  Every variant is checked bit-exact against the shipping
kernel before it is timed.

Usage:  python scripts/kernel_ablate.py [--runs 20] [--variants v0,v1,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

# NOTE: do NOT launch this with PYTHONPATH=/root/repo — that env var is
# inherited by the axon TPU relay's helper process and breaks chip
# init (silent fallback to CPU).  sys.path.insert is process-local.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dint_tpu.kernels import decode_local as dl
from dint_tpu.kernels.decode_local import (
    N_OUT,
    TABLE_CLS,
    W_TOKENS,
    _LEN_SHIFT,
    _OFF_MASK,
    _cumsum_mxu,
    _oh_dtype,
    _onehot_dot,
    _onehot_hist,
)
from dint_tpu.utils import jaxcfg

PLAN = "/root/repo/.bench/bench.single_rect_dint.v2.bin.plan.v1.npz"


# ---------------------------------------------------------------------------
# Kernel variants.  Each is decode_local_rows with one lever changed.
# ---------------------------------------------------------------------------


def _radix_gather(idx, planes, lo_bits):
    """planes[r, idx[r,q], :] via hi-radix MXU matmul + lo-radix VPU select.

    idx in [0, D); planes (R, D, V) u8-ranged.  Splits idx = hi*L + lo,
    contracts hi on the MXU against planes reshaped (R, D/L, L*V), then
    selects lo with a 0/1 mask on the VPU.  Exact: every intermediate is
    a 0/1-selected u8 in f32.
    """
    R, D, V = planes.shape
    L = 1 << lo_bits
    H = D // L
    hi = idx >> lo_bits
    lo = idx & (L - 1)
    T2 = planes.reshape(R, H, L * V)
    M1 = _onehot_dot(hi, T2)  # (R, Q, L*V) f32
    M1 = M1.reshape(R, idx.shape[1], L, V)
    Alo = jax.nn.one_hot(lo, L, dtype=M1.dtype)
    return (M1 * Alo[..., None]).sum(axis=2)


def _invert_compare(ends, lens, n_out):
    """o[r,j] = #real tokens with end <= j, as a fused compare+reduce."""
    R = ends.shape[0]
    jpos = jnp.arange(n_out, dtype=jnp.int32)
    real = lens > 0
    hit = (ends[:, None, :] <= jpos[None, :, None]) & real[:, None, :]
    return hit.sum(axis=-1, dtype=jnp.int32)


def _onehot_T(idx, D, dtype):
    """Transposed one-hot: out[r, d, q] = [idx[r, q] == d]."""
    iota = jnp.arange(D, dtype=jnp.int32)[None, :, None]
    return (idx[:, None, :] == iota).astype(dtype)


def _gather_T(idx, planes, int8=False):
    """planes[r, idx[r,q], v] computed transposed: (V,D)@(D,Q) so the
    tiny V dim pads in the sublane (M) position, not the 128-lane (N)
    position — 8x less MXU padding than the rqd,rdv->rqv form."""
    dt = jnp.int8 if int8 else _oh_dtype()
    A_T = _onehot_T(idx, planes.shape[1], dt)  # (R, D, Q)
    P_T = planes.swapaxes(1, 2)  # (R, V, D)
    if int8:
        out = jax.lax.dot_general(
            (P_T - 128).astype(jnp.int8), A_T,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ) + 128  # one-hot cols sum to 1
        return out.swapaxes(1, 2).astype(jnp.float32)
    out = jax.lax.dot_general(
        P_T.astype(dt), A_T, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.swapaxes(1, 2)  # (R, Q, V)


def make_kernel(value_lo_bits=None, attr_lo_bits=None, invert="hist",
                int8=False, transposed=False):
    """Build a decode_local_rows variant. None = shipping einsum."""

    def onehot_dot(idx, planes):
        if not int8:
            return _onehot_dot(idx, planes)
        # int8 MXU path: planes biased to [-128,127]; one-hot rows sum
        # to 1 so the bias adds back as a constant.
        A = jax.nn.one_hot(idx, planes.shape[1], dtype=jnp.int8)
        P = (planes - 128).astype(jnp.int8)
        out = jax.lax.dot_general(
            A, P, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return (out + 128).astype(jnp.float32)

    def gather(idx, planes, lo_bits):
        if transposed:
            return _gather_T(idx, planes, int8=int8)
        if lo_bits is None:
            return onehot_dot(idx, planes)
        return _radix_gather(idx, planes, lo_bits)

    @functools.partial(jax.jit, static_argnames=("n_out",))
    def rows(tokens, meta, table, n, salt, *, n_out=N_OUT):
        R, W = tokens.shape
        off_all = (meta & _OFF_MASK).astype(jnp.int32)
        mplanes = jnp.stack(
            [(meta >> _LEN_SHIFT).astype(jnp.int32), off_all & 255,
             off_all >> 8], axis=-1)
        tm = _onehot_dot(tokens, mplanes)
        lens = tm[:, :, 0].astype(jnp.int32)
        offs = (tm[:, :, 1] + tm[:, :, 2] * 256.0).astype(jnp.int32)
        ends = _cumsum_mxu(lens)

        if invert == "hist":
            w_real = (lens > 0).astype(jnp.int32)
            bins = jnp.clip(ends - 1, 0, n_out - 1)
            c = _onehot_hist(bins, w_real, n_out)
            csum = _cumsum_mxu(c)
            o = jnp.concatenate(
                [jnp.zeros((R, 1), jnp.int32), csum[:, : n_out - 1]], axis=1)
        else:
            o = _invert_compare(ends, lens, n_out)

        starts = ends - lens
        tplanes = jnp.stack(
            [starts & 255, starts >> 8, offs & 255, offs >> 8], axis=-1)
        o_c = jnp.minimum(o, W - 1)
        ta = gather(o_c, tplanes, attr_lo_bits)
        start_o = (ta[:, :, 0] + ta[:, :, 1] * 256.0).astype(jnp.int32)
        off_o = (ta[:, :, 2] + ta[:, :, 3] * 256.0).astype(jnp.int32)
        jpos = jnp.arange(n_out, dtype=jnp.int32)[None, :]
        k = jpos - start_o
        vidx = jnp.clip(off_o + k, 0, TABLE_CLS - 1)

        t32 = table + salt
        vplanes = jnp.stack(
            [(t32 & 255).astype(jnp.int32),
             ((t32 >> 8) & 255).astype(jnp.int32),
             ((t32 >> 16) & 255).astype(jnp.int32),
             ((t32 >> 24) & 255).astype(jnp.int32)], axis=-1)
        vv = gather(vidx, vplanes, value_lo_bits)
        val = (vv[:, :, 0].astype(jnp.uint32)
               + (vv[:, :, 1].astype(jnp.uint32) << 8)
               + (vv[:, :, 2].astype(jnp.uint32) << 16)
               + (vv[:, :, 3].astype(jnp.uint32) << 24)) - salt
        valid = jpos < n[:, None]
        return jnp.where(valid, val, 0)

    @jax.jit
    def all_tiles(tokens, meta, table, n, salt):
        def body(_, tile):
            t, m, tb, nn = tile
            return 0, rows(t, m, tb, nn, salt, n_out=N_OUT)
        _, outs = jax.lax.scan(body, 0, (tokens, meta, table, n))
        return outs

    return all_tiles


VARIANTS = {
    "v0_ship": dict(),
    "v1_radval4": dict(value_lo_bits=4),
    "v1b_radval3": dict(value_lo_bits=3),
    "v1c_radval5": dict(value_lo_bits=5),
    "v2_radattr": dict(value_lo_bits=4, attr_lo_bits=3),
    "v3_cmpinv": dict(value_lo_bits=4, attr_lo_bits=3, invert="cmp"),
    "v3b_cmponly": dict(invert="cmp"),
    "v4_int8": dict(value_lo_bits=4, attr_lo_bits=3, invert="cmp", int8=True),
    "v4b_int8_hist": dict(value_lo_bits=4, attr_lo_bits=3, int8=True),
    "v5_T": dict(transposed=True),
    "v5b_T_cmp": dict(transposed=True, invert="cmp"),
    "v6_T_int8": dict(transposed=True, int8=True),
    "v6b_T_int8_cmp": dict(transposed=True, int8=True, invert="cmp"),
}


def host_vidx(eng):
    """Precompute per-output-position table indices from the plan.

    The serving plan fully determines which table word every output
    position reads: vidx[r, j] = off(tok_j) + j - start(tok_j).  The
    XLA kernel re-derives this on device every run (cumsum + band +
    attrs gather); hosting it turns decode into a pure table gather.
    """
    tokens = np.asarray(eng.tokens).reshape(-1, W_TOKENS)
    meta = np.asarray(eng.meta).reshape(-1, W_TOKENS)
    n = np.asarray(eng.n).reshape(-1).astype(np.int64)
    meta_pos = np.take_along_axis(meta, tokens, axis=1).astype(np.int64)
    lens = meta_pos >> 13
    offs = meta_pos & ((1 << 13) - 1)
    ends = np.cumsum(lens, axis=1)
    starts = ends - lens
    R = lens.shape[0]
    flat_lens = lens.ravel()
    rep_off = np.repeat(offs.ravel(), flat_lens)
    rep_start = np.repeat(starts.ravel(), flat_lens)
    total = int(n.sum())
    row_base = np.concatenate([[0], np.cumsum(n)[:-1]])
    j_flat = np.arange(total, dtype=np.int64) - np.repeat(row_base, n)
    vidx_flat = rep_off + j_flat - rep_start
    vidx = np.zeros((R, N_OUT), np.int32)
    rows_flat = np.repeat(np.arange(R, dtype=np.int64), n)
    vidx[rows_flat, j_flat] = vidx_flat
    return vidx


def make_gather_kernel(radix):
    """Value-only decode: out = table[vidx] (+salt dance, n mask)."""

    @jax.jit
    def rows(vidx, table, n, salt):
        R, NO = vidx.shape
        TC = table.shape[1]
        t32 = table + salt
        planes = jnp.stack(
            [((t32 >> (8 * k)) & 255).astype(jnp.int32) - 128 for k in range(4)],
            axis=-1,
        ).astype(jnp.int8)  # (R, TC, 4)
        if radix:
            L, H = 16, TC // 16
            hi = vidx >> 4
            lo = vidx & 15
            iota_h = jnp.arange(H, dtype=jnp.int32)[None, None, :]
            A_hi = (hi[:, :, None] == iota_h).astype(jnp.int8)  # (R, NO, H)
            T2 = planes.reshape(R, H, L * 4)
            M1 = jax.lax.dot_general(
                A_hi, T2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (R, NO, L*4)
            M1 = M1.reshape(R, NO, L, 4)
            iota_l = jnp.arange(L, dtype=jnp.int32)[None, None, :]
            Alo = (lo[:, :, None] == iota_l).astype(jnp.int32)  # (R, NO, L)
            vv = jnp.sum(M1 * Alo[..., None], axis=2) + 128  # (R, NO, 4)
        else:
            iota_d = jnp.arange(TC, dtype=jnp.int32)[None, :, None]
            A_T = (vidx[:, None, :] == iota_d).astype(jnp.int8)  # (R, TC, NO)
            P_T = planes.swapaxes(1, 2)  # (R, 4, TC)
            vv = (
                jax.lax.dot_general(
                    P_T, A_T, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )
                + 128
            ).swapaxes(1, 2)  # (R, NO, 4)
        val = (
            vv[:, :, 0].astype(jnp.uint32)
            + (vv[:, :, 1].astype(jnp.uint32) << 8)
            + (vv[:, :, 2].astype(jnp.uint32) << 16)
            + (vv[:, :, 3].astype(jnp.uint32) << 24)
        ) - salt.astype(jnp.uint32)
        jpos = jnp.arange(NO, dtype=jnp.int32)[None, :]
        return jnp.where(jpos < n[:, None], val, 0)

    return rows


def time_vidx_variant(name, eng, ref, total, runs, radix):
    vidx_np = host_vidx(eng)
    table = np.asarray(eng.table).reshape(-1, TABLE_CLS)
    n = np.asarray(eng.n).reshape(-1)
    vidx = jnp.asarray(vidx_np)
    tbl = jnp.asarray(table.view(np.int32))
    nn = jnp.asarray(n)
    kern = make_gather_kernel(radix)
    got = np.asarray(kern(vidx, tbl, nn, jnp.uint32(0))).reshape(ref.shape)
    if not np.array_equal(got, ref):
        bad = np.argwhere(got != ref)
        print(f"{name}: MISMATCH at {bad[:3]}")
        return
    outs = kern(vidx, tbl, nn, jnp.uint32(1))
    salt = (outs.ravel()[0] & jnp.uint32(1)) + jnp.uint32(2)
    _ = int(np.asarray(salt))
    t0 = time.perf_counter()
    salt = jnp.uint32(1)
    for k in range(runs):
        outs = kern(vidx, tbl, nn, salt)
        salt = (outs.ravel()[0] & jnp.uint32(1)) + jnp.uint32(k + 1)
    _ = int(np.asarray(salt))
    dt = (time.perf_counter() - t0) / runs
    print(f"{name:14s} {dt*1e3:8.2f} ms/run  "
          f"{total/dt/1e9:6.3f} G ints/s  EXACT")


def time_pallas(eng, ref, total, runs):
    from dint_tpu.kernels import decode_pallas as dp

    tokens = np.asarray(eng.tokens).reshape(-1, W_TOKENS)
    meta = np.asarray(eng.meta).reshape(-1, W_TOKENS)
    table = np.asarray(eng.table).reshape(-1, TABLE_CLS)
    n = np.asarray(eng.n).reshape(-1)
    R = tokens.shape[0]
    RB = dp.ROW_BLOCK
    padR = ((R + RB - 1) // RB) * RB
    if padR != R:
        z = lambda a: np.concatenate(
            [a, np.zeros((padR - R,) + a.shape[1:], a.dtype)])
        tokens, meta, table, n = z(tokens), z(meta), z(table), z(n)
    meta_pos = jnp.asarray(
        np.take_along_axis(meta, tokens, axis=1).astype(np.int32))
    tbl = jnp.asarray(table.view(np.int32))
    nn = jnp.asarray(n)

    out = dp.decode_rows_pallas(meta_pos, tbl, nn, jnp.uint32(0))
    got = np.asarray(out).view(np.uint32)[:R].reshape(ref.shape)
    if not np.array_equal(got, ref):
        bad = np.argwhere(got != ref)
        print(f"v7_pallas: MISMATCH at {bad[:3]}")
        return
    outs = dp.decode_rows_pallas(meta_pos, tbl, nn, jnp.uint32(1))
    salt = (outs[0, 0] & 1) + 2
    _ = int(np.asarray(salt))
    t0 = time.perf_counter()
    salt = jnp.int32(1)
    for k in range(runs):
        outs = dp.decode_rows_pallas(meta_pos, tbl, nn, salt)
        salt = (outs[0, 0] & 1) + (k + 1)
    _ = int(np.asarray(salt))
    dt = (time.perf_counter() - t0) / runs
    print(f"{'v7_pallas':14s} {dt*1e3:8.2f} ms/run  "
          f"{total/dt/1e9:6.3f} G ints/s  EXACT")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--plan", default=PLAN)
    args = ap.parse_args()

    jaxcfg.enable_compile_cache()
    assert jax.default_backend() == "tpu", (
        f"ablation must run on the TPU, got {jax.default_backend()} "
        "(is another process holding the chip?)"
    )
    plan = dl.load_plan(args.plan)
    assert plan is not None, f"no plan at {args.plan}"
    eng = dl.LocalDecodeEngine(plan)
    total = eng.total_ints()
    print(f"rows={plan.rows} tiles={eng.T}x{eng.row_tile} ints={total}")

    ref = np.asarray(eng.decode_all(0))  # shipping kernel output

    for name in args.variants.split(","):
        if name == "v7_pallas":
            time_pallas(eng, ref, total, args.runs)
            continue
        if name in ("v8_vidx_radix", "v9_vidx_full"):
            time_vidx_variant(name, eng, ref, total, args.runs,
                              radix=(name == "v8_vidx_radix"))
            continue
        kern = make_kernel(**VARIANTS[name])
        out = kern(eng.tokens, eng.meta, eng.table, eng.n, jnp.uint32(0))
        got = np.asarray(out)
        if not np.array_equal(got, ref):
            bad = np.argwhere(got != ref)
            print(f"{name}: MISMATCH at {bad[:3]} "
                  f"got {got[tuple(bad[0])]} want {ref[tuple(bad[0])]}")
            continue
        # salted warmup (compiles the chained pattern), then timed chain
        outs = kern(eng.tokens, eng.meta, eng.table, eng.n, jnp.uint32(1))
        salt = (outs[0, 0, 0] & jnp.uint32(1)) + jnp.uint32(2)
        _ = int(np.asarray(salt))
        t0 = time.perf_counter()
        salt = jnp.uint32(1)
        for k in range(args.runs):
            outs = kern(eng.tokens, eng.meta, eng.table, eng.n, salt)
            salt = (outs[0, 0, 0] & jnp.uint32(1)) + jnp.uint32(k + 1)
        _ = int(np.asarray(salt))
        dt = (time.perf_counter() - t0) / args.runs
        print(f"{name:14s} {dt*1e3:8.2f} ms/run  "
              f"{total/dt/1e9:6.3f} G ints/s  EXACT")


if __name__ == "__main__":
    main()
