"""Fused Pallas decode kernel — one-hots live and die in VMEM.

The XLA path (decode_local.decode_local_rows) materializes the int8
one-hot selector matrices in HBM between the compare that builds them
and the MXU dot that consumes them: ~640 bytes of HBM traffic per
decoded int, which is the measured bottleneck (scripts/kernel_ablate).
This kernel generates each selector tile in VMEM via broadcasted-iota
compares and feeds the MXU directly, so HBM traffic drops to the plan
rows themselves (~12 B/int).

Key structural choices (all measured/forced on real hardware):

* Every dot is INTEGER (int8 operands, int32 accumulation).  Mosaic
  lowers f32 matmuls to single-pass bf16 by default, which silently
  rounds integers > 256 (offsets up to 512 came back off by one).
  int8 x int8 -> int32 is exact and runs at 2x the bf16 MXU rate.
  u8-ranged planes are biased by -128 into int8; a one-hot column has
  exactly one 1, so adding 128 after the dot restores the value.
* The token->output inversion is the BAND identity: token t covers
  output j iff start_t <= j < end_t, so the selector matrix is built
  directly from compares — no histogram, no prefix sum, no o[] array
  (the XLA path needs all three).
* Mosaic supports dynamic slicing only on the sublane (second-minor)
  axis, so per-row W-vectors are read as (1, W) row slices and turned
  into (W, 1) columns with tiny supported transposes.

Semantics are identical to decode_local_rows (same serving plan,
bit-exact outputs); the reference hot loop it replaces is the
dictionary-copy decode of include/dint/dint_codecs.hpp:13-49 /
vroom_env/dint_codecs.hpp:37-107.

The host pre-gathers meta by position (meta_pos[q] = meta[tokens[q]]),
removing the token->meta gather from the device entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_local import _LEN_SHIFT, _OFF_MASK, N_OUT, TABLE_CLS, W_TOKENS

ROW_BLOCK = 256  # rows per grid program


def _decode_block_kernel(salt_ref, meta_ref, table_ref, n_ref, out_ref,
                         ends_sc, starts_sc, offs_sc):
    """One grid program: decode ROW_BLOCK sub-unit rows."""
    RB = meta_ref.shape[0]
    W = meta_ref.shape[1]
    NO = out_ref.shape[1]
    TC = table_ref.shape[1]

    meta = meta_ref[:]
    lens = (meta >> _LEN_SHIFT).astype(jnp.int8)  # (RB, W), values <= 16
    offs_sc[:] = meta & _OFF_MASK

    # ends[r, t] = sum_{s<=t} lens[r, s]: one int8 MXU matmul with an
    # upper-triangular ones matrix for the whole block.
    ti = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    tri = (ti <= tj).astype(jnp.int8)  # tri[s, t] = 1 if s <= t
    ends = jax.lax.dot_general(
        lens, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (RB, W)
    ends_sc[:] = ends
    starts_sc[:] = ends - lens.astype(jnp.int32)

    salt = salt_ref[0, 0]

    def row_body(r, _):
        ends_r = ends_sc[pl.ds(r, 1), :]  # (1, W)
        starts_r = starts_sc[pl.ds(r, 1), :]
        offs_r = offs_sc[pl.ds(r, 1), :]
        ends_c = ends_r.swapaxes(0, 1)  # (W, 1)
        starts_c = starts_r.swapaxes(0, 1)

        # Band selector: token t covers output j iff start <= j < end.
        # (Padding tokens have start == end: never hit.  Output columns
        # j >= n have no covering token: garbage, masked at the end.)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (W, NO), 1)
        A_o = ((starts_c <= jrow) & (jrow < ends_c)).astype(jnp.int8)  # (W, NO)

        # attrs of the covering token: u8 lo/hi planes of start & off.
        P_att = jnp.concatenate(
            [(starts_r & 255) - 128, (starts_r >> 8) - 128,
             (offs_r & 255) - 128, (offs_r >> 8) - 128], axis=0,
        ).astype(jnp.int8)  # (4, W)
        att = (
            jax.lax.dot_general(
                P_att, A_o, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            + 128
        )  # (4, NO)
        start_o = att[0:1, :] + (att[1:2, :] << 8)  # (1, NO)
        off_o = att[2:3, :] + (att[3:4, :] << 8)
        jpos = jax.lax.broadcasted_iota(jnp.int32, (1, NO), 1)
        vidx = jnp.clip(off_o + jpos - start_o, 0, TC - 1)  # (1, NO)

        # values: table[vidx] via int8 one-hot dot over the local table
        # domain; 4 u8 planes of the (salted) u32 words.
        t32 = table_ref[pl.ds(r, 1), :] + salt  # (1, TC) i32, wrapping
        p0 = (t32 & 255) - 128
        p1 = ((t32 >> 8) & 255) - 128
        p2 = ((t32 >> 16) & 255) - 128
        p3 = ((t32 >> 24) & 255) - 128
        P_v = jnp.concatenate([p0, p1, p2, p3], axis=0).astype(jnp.int8)  # (4, TC)
        drow = jax.lax.broadcasted_iota(jnp.int32, (TC, NO), 0)
        A_v = (vidx == drow).astype(jnp.int8)  # (TC, NO)
        vv = (
            jax.lax.dot_general(
                P_v, A_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            + 128
        )  # (4, NO)
        val = (
            vv[0:1, :]
            + (vv[1:2, :] << 8)
            + (vv[2:3, :] << 16)
            + (vv[3:4, :] << 24)
            - salt
        )  # (1, NO) int32, wrapping
        nmask = jax.lax.broadcasted_iota(jnp.int32, (1, NO), 1) < n_ref[
            pl.ds(r, 1), :
        ]
        out_ref[pl.ds(r, 1), :] = jnp.where(nmask, val, 0)
        return 0

    jax.lax.fori_loop(0, RB, row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_rows_pallas(meta_pos, table, n, salt, *, interpret=False):
    """meta_pos (R, W) i32 position-indexed len<<13|off; table (R, TC)
    i32 (u32 bits); n (R,) i32; salt i32 scalar. Returns (R, N_OUT)
    int32 (u32 bits). R must be a multiple of ROW_BLOCK."""
    R = meta_pos.shape[0]
    assert R % ROW_BLOCK == 0, R
    salt_arr = jnp.reshape(salt.astype(jnp.int32), (1, 1))
    return pl.pallas_call(
        _decode_block_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N_OUT), jnp.int32),
        grid=(R // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, W_TOKENS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, TABLE_CLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, N_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, W_TOKENS), jnp.int32),
            pltpu.VMEM((ROW_BLOCK, W_TOKENS), jnp.int32),
            pltpu.VMEM((ROW_BLOCK, W_TOKENS), jnp.int32),
        ],
        interpret=interpret,
    )(salt_arr, meta_pos, table, n.reshape(R, 1))
