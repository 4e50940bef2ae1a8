"""Fused Pallas decode kernel: the hosted-vidx gather, one-hots in VMEM.

The shipping XLA path (decode_local.decode_gather_rows) materializes
the int8 one-hot selector A_T (R, TC, NO) in HBM between the compare
that builds it and the MXU dot that consumes it — ~TC bytes of HBM
traffic per decoded int, the measured bottleneck once everything else
was hosted (scripts/kernel_ablate.py).  Here the selector tiles are
generated in VMEM and fed straight to the MXU, so HBM traffic drops to
the plan rows themselves (~8 B/int).

Batching trick: a single row's gather dot is (4, TC)@(TC, NO) — M=4
pads to the int8 sublane tile (32) and tiny dots drown in per-op
overhead (measured 6x slower than XLA when looped row-at-a-time).
Instead G=8 rows fuse into ONE block-diagonal dot:

    P_blk (4G, G*TC)  u8 byte planes of row g in column block g,
                      zero elsewhere (v-major rows: m = v*G + g)
    A_stk (G*TC, NO)  A_stk[(g,d), j] = [vidx_g[j] == d]
    out   (4G, NO)    row (v,g) = byte plane v of row g's outputs

M = 32 exactly fills the int8 sublane tile, so the block-diagonal
zeros cost nothing beyond the padding a single row would pay anyway.
Bias correctness: planes are biased into int8 by -128 *inside* the
masked block only; A_stk has one 1 per column per row-block, but the
zeroed P region nullifies foreign blocks, so out = value - 128 and
+128 restores it exactly.  All arithmetic is integer; exact.

Semantics match decode_gather_rows bit-for-bit (same plan, same salt
dance).  Reference hot loop: include/dint/dint_codecs.hpp:13-49,
vroom_env/dint_codecs.hpp:37-107.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_local import N_OUT, TABLE_CLS

ROW_BLOCK = 256  # rows per grid program
G = 8  # rows fused per block-diagonal dot


def _gather_block_kernel(salt_ref, vidx_ref, table_ref, n_ref, out_ref,
                         A_sc):
    RB = vidx_ref.shape[0]
    NO = vidx_ref.shape[1]
    TC = table_ref.shape[1]
    salt = salt_ref[0, 0]

    # Constant masks (hoisted by the compiler out of the row loop).
    km = jax.lax.broadcasted_iota(jnp.int32, (4 * G, G * TC), 1)  # col id
    mm = jax.lax.broadcasted_iota(jnp.int32, (4 * G, G * TC), 0)  # row id
    blockmask = ((km // TC) == (mm % G)).astype(jnp.int8)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (TC, NO), 0)

    def group_body(gi, _):
        r0 = gi * G
        t32 = table_ref[pl.ds(r0, G), :] + salt  # (G, TC) i32 wrap

        # P_blk (4G, G*TC): v-major byte planes, block-diagonal
        # (column block g holds row g's planes; K order is (g, d)).
        p0 = (t32 & 255) - 128
        p1 = ((t32 >> 8) & 255) - 128
        p2 = ((t32 >> 16) & 255) - 128
        p3 = ((t32 >> 24) & 255) - 128
        planes = jnp.concatenate([p0, p1, p2, p3], axis=0)  # (4G, TC)
        P_wide = jnp.concatenate([planes] * G, axis=1)  # (4G, G*TC)
        P_blk = (P_wide * blockmask).astype(jnp.int8)

        # A_stk (G*TC, NO), block g rows: [vidx_g[j] == d].  Built with
        # G static compares into scratch (pltpu.repeat is tile-order,
        # not block-order, so it can't produce this layout directly).
        for g in range(G):
            vrow = vidx_ref[pl.ds(r0 + g, 1), :]  # (1, NO)
            A_sc[g * TC:(g + 1) * TC, :] = (vrow == iota_d).astype(jnp.int8)

        out = jax.lax.dot_general(
            P_blk, A_sc[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (4G, NO), row (v*G+g)
        val = (
            (out[0:G, :] + 128)
            + ((out[G : 2 * G, :] + 128) << 8)
            + ((out[2 * G : 3 * G, :] + 128) << 16)
            + ((out[3 * G : 4 * G, :] + 128) << 24)
            - salt
        )  # (G, NO) i32 wrap
        nmask = (
            jax.lax.broadcasted_iota(jnp.int32, (G, NO), 1)
            < n_ref[pl.ds(r0, G), :]
        )
        out_ref[pl.ds(r0, G), :] = jnp.where(nmask, val, 0)
        return 0

    jax.lax.fori_loop(0, RB // G, group_body, 0)


def _gather_group_kernel(salt_ref, vidx_ref, table_ref, n_ref, out_ref):
    """One grid program = one G-row group (grid pipelining instead of an
    in-kernel fori_loop; the loop variant measured 4.4us/group, far
    above the ~1us of compute)."""
    NO = vidx_ref.shape[1]
    TC = table_ref.shape[1]
    salt = salt_ref[0, 0]

    km = jax.lax.broadcasted_iota(jnp.int32, (4 * G, G * TC), 1)
    mm = jax.lax.broadcasted_iota(jnp.int32, (4 * G, G * TC), 0)
    blockmask = ((km // TC) == (mm % G)).astype(jnp.int8)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (TC, NO), 0)

    t32 = table_ref[:] + salt  # (G, TC)
    p0 = (t32 & 255) - 128
    p1 = ((t32 >> 8) & 255) - 128
    p2 = ((t32 >> 16) & 255) - 128
    p3 = ((t32 >> 24) & 255) - 128
    planes = jnp.concatenate([p0, p1, p2, p3], axis=0)  # (4G, TC)
    P_blk = (jnp.concatenate([planes] * G, axis=1) * blockmask).astype(
        jnp.int8
    )
    A_parts = [
        (vidx_ref[g:g + 1, :] == iota_d).astype(jnp.int8) for g in range(G)
    ]
    A_stk = jnp.concatenate(A_parts, axis=0)  # (G*TC, NO)
    out = jax.lax.dot_general(
        P_blk, A_stk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    val = (
        (out[0:G, :] + 128)
        + ((out[G:2 * G, :] + 128) << 8)
        + ((out[2 * G:3 * G, :] + 128) << 16)
        + ((out[3 * G:4 * G, :] + 128) << 24)
        - salt
    )
    nmask = jax.lax.broadcasted_iota(jnp.int32, (G, NO), 1) < n_ref[:]
    out_ref[:] = jnp.where(nmask, val, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_gather_pallas_grid(vidx, table, n, salt, *, interpret=False):
    """Grid-pipelined variant: one program per G-row group."""
    R = vidx.shape[0]
    assert R % G == 0, R
    salt_arr = jnp.reshape(salt.astype(jnp.int32), (1, 1))
    return pl.pallas_call(
        _gather_group_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N_OUT), jnp.int32),
        grid=(R // G,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, N_OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, TABLE_CLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, N_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(salt_arr, vidx, table, n.reshape(R, 1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_gather_pallas(vidx, table, n, salt, *, interpret=False):
    """vidx (R, N_OUT) i32; table (R, TABLE_CLS) i32 (u32 bits);
    n (R,) i32; salt u32/i32 scalar.  Returns (R, N_OUT) i32 (u32
    bits).  R must be a multiple of ROW_BLOCK."""
    R = vidx.shape[0]
    assert R % ROW_BLOCK == 0, R
    salt_arr = jnp.reshape(salt.astype(jnp.int32), (1, 1))
    return pl.pallas_call(
        _gather_block_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N_OUT), jnp.int32),
        grid=(R // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, N_OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, TABLE_CLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, N_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * TABLE_CLS, N_OUT), jnp.int8)],
        interpret=interpret,
    )(salt_arr, vidx, table, n.reshape(R, 1))
