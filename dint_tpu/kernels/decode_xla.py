"""Batched DINT decode as dense XLA array programs.

The reference decode (vroom_env/dint_codecs.hpp:37-107) is a sequential
pointer walk: read a codeword, copy a dictionary entry or consume an
inline exception, advance a data-dependent number of stream words.  On
TPU we re-express it as three dense phases over a whole batch of
encoded units (lists or 256-int blocks) at once:

1. **Classify**: view each unit's byte range as a token stream
   (u16 for b=16, u8 for b=8) and compute, for every token position,
   its step (1 token for a dictionary codeword, 1+2/tw for a 2-byte
   exception, 1+4/tw for a 4-byte one) and output length.

2. **Chain**: the walk visits positions 0, f(0), f(f(0)), ... where
   f(q) = q + step(q).  Because steps are bounded (<= 3 token widths
   for b=16, <= 5 for b=8), visited-ness satisfies a short linear
   recurrence over the boolean semiring; we solve it for all positions
   at once with `jax.lax.associative_scan` over per-position transition
   matrices.  Units whose token stream contains no word < EXCEPTIONS
   cannot contain exception markers, so every position is a codeword
   start and the scan is skipped entirely (the common fast path — the
   host planner buckets units into clean/dirty).

3. **Gather**: exclusive prefix sums of visited output lengths give
   each codeword's output offset; every output slot then *gathers* its
   value from the dictionary table (or inline exception words).  There
   is no scatter and no data-dependent control flow; run codewords
   (length > 16) read zeros beyond the 16-word zero region, matching
   the reference's pre-zeroed buffer + 16-word memcpy trick
   (dict_posting_list.hpp:296, single_dictionary.hpp:230-238).

All shapes are static per (W, N, b) bucket; the host planner pads units
into power-of-two buckets.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EXCEPTIONS, MAX_ENTRY_SIZE


def _steps_for(b: int) -> Tuple[int, int, int]:
    """(dict, small_exc, large_exc) steps in token units."""
    tw = b // 8
    return 1, 1 + 2 // tw, 1 + 4 // tw


def _chain_visited(cw: jnp.ndarray, b: int) -> jnp.ndarray:
    """Visited mask over token positions via associative matrix scan.

    cw: (B, W) int32 token values. Returns (B, W) bool.
    """
    B, W = cw.shape
    _, s_small, s_large = _steps_for(b)
    D = s_large  # max step == state depth
    is_dict = cw >= EXCEPTIONS
    is_small = cw == 0
    # contribution of position p to v_{p+step(p)}
    # build transition matrices T_q: state s_q = T_q @ s_{q-1}
    # state vector = (v_q, v_{q-1}, ..., v_{q-D+1})
    # v_q = OR over: v_{q-1} & dict_{q-1};  v_{q-s_small} & small_{q-s_small};
    #               v_{q-s_large} & large_{q-s_large}
    def shifted(x, k):
        # x_{q-k} aligned at q, False for q < k
        if k >= W:
            return jnp.zeros((B, W), dtype=bool)
        pad = jnp.zeros((B, k), dtype=bool)
        return jnp.concatenate([pad, x[:, : W - k]], axis=1)

    a = shifted(is_dict, 1)
    bb = shifted(is_small, s_small)
    cc = shifted(cw == 1, s_large)

    # D x D boolean transition matrices stored as D*D separate (B, W)
    # planes — a trailing (D, D) axis would be tile-padded to (8, 128)
    # on TPU, inflating memory ~100x.  Row 0 holds the recurrence taps;
    # rows 1..D-1 shift the state window.
    if W == 1:
        return jnp.ones((B, 1), dtype=bool)
    zeros = jnp.zeros((B, W - 1), dtype=bool)
    ones = jnp.ones((B, W - 1), dtype=bool)
    row0 = {0: a[:, 1:], s_small - 1: bb[:, 1:], s_large - 1: cc[:, 1:]}
    T = tuple(
        tuple(
            (row0.get(j, zeros) if i == 0 else (ones if j == i - 1 else zeros))
            for j in range(D)
        )
        for i in range(D)
    )

    def combine(x, y):
        # prefix transform: later-applied y composed after x (R = Y . X
        # over the boolean semiring), elementwise over (B, W-1) planes
        return tuple(
            tuple(
                jax.tree_util.tree_reduce(
                    jnp.logical_or,
                    [y[i][k] & x[k][j] for k in range(D)],
                )
                for j in range(D)
            )
            for i in range(D)
        )

    prefixes = jax.lax.associative_scan(combine, T, axis=1)
    # s_q = P_q @ e0  =>  v_q = P_q[0, 0]
    v_rest = prefixes[0][0]
    v0 = jnp.ones((B, 1), dtype=bool)
    return jnp.concatenate([v0, v_rest], axis=1)


@functools.partial(
    jax.jit, static_argnames=("b", "n_out", "assume_clean")
)
def decode_units(
    cw: jnp.ndarray,  # (B, W) int32 token values
    w_valid: jnp.ndarray,  # (B,) int32 valid token count per unit
    n: jnp.ndarray,  # (B,) int32 ints to produce per unit
    ctx: jnp.ndarray,  # (B,) int32 dictionary context per unit
    lengths: jnp.ndarray,  # (C, E) int32 entry lengths
    offsets: jnp.ndarray,  # (C, E) int32 entry table offsets
    table: jnp.ndarray,  # (T,) uint32 flat dictionary table (zero padded)
    *,
    b: int = 16,
    n_out: int = 256,
    assume_clean: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode a bucket of units; returns ((B, n_out) u32, (B,) produced)."""
    B, W = cw.shape
    _, s_small, s_large = _steps_for(b)

    qpos = jnp.arange(W, dtype=jnp.int32)[None, :]
    in_range = qpos < w_valid[:, None]
    # out-of-range tokens look like dictionary codewords of length 0
    cw_safe = jnp.where(in_range, cw, EXCEPTIONS)

    if assume_clean:
        visited = in_range
    else:
        visited = _chain_visited(cw_safe, b) & in_range

    is_dict = cw_safe >= EXCEPTIONS
    ent_len = lengths[ctx[:, None], cw_safe]
    out_len = jnp.where(is_dict, ent_len, 1)
    out_len = jnp.where(visited & in_range, out_len, 0)
    # zero-length out-of-range "entries" keep ends flat past the stream
    out_len = jnp.where(in_range, out_len, 0)

    ends = jnp.cumsum(out_len, axis=1)  # inclusive
    produced = ends[:, -1]
    starts = ends - out_len

    # ordinal compaction of visited codewords
    ordinal = jnp.cumsum(visited.astype(jnp.int32), axis=1) - 1
    M = W  # max codewords
    scatter_idx = jnp.where(visited, ordinal, M)
    pos_of_ord = (
        jnp.full((B, M), 0, dtype=jnp.int32)
        .at[jnp.arange(B)[:, None], scatter_idx]
        .set(qpos * jnp.ones((B, 1), jnp.int32), mode="drop")
    )
    start_of_ord = (
        jnp.zeros((B, M), dtype=jnp.int32)
        .at[jnp.arange(B)[:, None], scatter_idx]
        .set(starts, mode="drop")
    )

    # output slot -> ordinal: scatter 1 at each codeword's start, cumsum
    num_ords = jnp.cumsum(jnp.where(visited, 1, 0), axis=1)[:, -1]
    ord_ids = jnp.arange(M, dtype=jnp.int32)[None, :]
    ord_valid = ord_ids < num_ords[:, None]
    marks = (
        jnp.zeros((B, n_out), dtype=jnp.int32)
        .at[jnp.arange(B)[:, None], jnp.where(ord_valid, start_of_ord, n_out)]
        .add(1, mode="drop")
    )
    o_j = jnp.cumsum(marks, axis=1) - 1  # (B, n_out)

    q_j = jnp.take_along_axis(pos_of_ord, o_j, axis=1)
    st_j = jnp.take_along_axis(start_of_ord, o_j, axis=1)
    jpos = jnp.arange(n_out, dtype=jnp.int32)[None, :]
    k_j = jpos - st_j

    cw_j = jnp.take_along_axis(cw_safe, q_j, axis=1)
    is_dict_j = cw_j >= EXCEPTIONS

    off_j = offsets[ctx[:, None], cw_j]
    k_clamped = jnp.minimum(k_j, MAX_ENTRY_SIZE - 1)
    tbl_val = table[off_j + k_clamped]
    dict_val = jnp.where(k_j < MAX_ENTRY_SIZE, tbl_val, 0)

    # exception values from following tokens
    def tok(shift):
        idx = jnp.minimum(q_j + shift, W - 1)
        return jnp.take_along_axis(cw_safe, idx, axis=1).astype(jnp.uint32)

    if b == 16:
        small_val = tok(1)
        large_val = tok(1) | (tok(2) << 16)
    else:
        small_val = tok(1) | (tok(2) << 8)
        large_val = tok(1) | (tok(2) << 8) | (tok(3) << 16) | (tok(4) << 24)

    exc_val = jnp.where(cw_j == 1, large_val, small_val)
    val = jnp.where(is_dict_j, dict_val.astype(jnp.uint32), exc_val)
    val = jnp.where(jpos < n[:, None], val, 0)

    # tokens consumed to produce exactly n ints: the codeword covering
    # output n-1, plus its payload — lets a second pass decode the data
    # that follows (e.g. the freqs half of an index block).
    last_j = jnp.clip(n - 1, 0, n_out - 1)[:, None]
    q_last = jnp.take_along_axis(q_j, last_j, axis=1)[:, 0]
    cw_last = jnp.take_along_axis(cw_j, last_j, axis=1)[:, 0]
    step_last = jnp.where(
        cw_last >= EXCEPTIONS, 1, jnp.where(cw_last == 1, s_large, s_small)
    )
    consumed = q_last + step_last
    return val, produced, consumed


def tokens_from_arena(
    arena_u8: np.ndarray, starts: np.ndarray, W: int, b: int
) -> np.ndarray:
    """Host-side token view: (B, W) int32 tokens for units at byte starts.

    Tokens are little-endian u16 (b=16) or u8 (b=8) read at
    ``starts[i] + tw*q`` — list payloads are NOT required to be aligned
    (the reference's streams aren't).
    """
    tw = b // 8
    starts = np.asarray(starts, dtype=np.int64)[:, None]
    q = np.arange(W, dtype=np.int64)[None, :]
    base = starts + tw * q
    base = np.minimum(base, arena_u8.shape[0] - tw)
    lo = arena_u8[base].astype(np.int32)
    if tw == 1:
        return lo
    hi = arena_u8[base + 1].astype(np.int32)
    return lo | (hi << 8)
