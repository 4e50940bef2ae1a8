"""Host-side planning for batched device decode.

Buckets encoded units (whole lists for single-dict streams, 256-int
blocks for multi-dict streams) into power-of-two (token-capacity,
output-capacity) buckets, splits them into clean (no possible exception
marker anywhere in the token range — the associative chain-scan is
skipped) and dirty groups, and runs the XLA decoder per bucket.

This is load-time planning, the analogue of the reference's mmap +
header walk (vroom_env/decode.cpp:24-48); the timed work is the jitted
decode itself.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EXCEPTIONS
from ..dictionary.dictionary import DecodeView
from . import decode_xla


@dataclass
class Bucket:
    indices: np.ndarray  # unit ids in this bucket
    W: int  # token capacity (power of two)
    N: int  # output capacity (power of two)
    b: int  # codeword width in bits
    clean: bool
    cw: np.ndarray  # (B, W) int32 host tokens
    w_valid: np.ndarray
    n: np.ndarray
    ctx: np.ndarray


def _pow2(x: int) -> int:
    return 1 << max(1, int(np.ceil(np.log2(max(2, x)))))


def small_word_flags(arena: np.ndarray, b: int) -> Tuple[np.ndarray, ...]:
    """Prefix counts of possible exception markers for clean/dirty tests.

    b=16: two parity-phased u16 streams; b=8: one byte stream.  Returns
    cumulative counts so any unit's token range is testable in O(1).
    """
    if b == 8:
        small = arena < EXCEPTIONS
        return (np.concatenate([[0], np.cumsum(small)]),)
    a = arena.astype(np.uint16)
    even = a[0 : a.shape[0] - 1 : 2] | (a[1::2] << 8)
    odd = a[1 : a.shape[0] - 1 : 2] | (a[2::2] << 8)
    ce = np.concatenate([[0], np.cumsum(even < EXCEPTIONS)])
    co = np.concatenate([[0], np.cumsum(odd < EXCEPTIONS)])
    return ce, co


def units_are_clean(
    prefix_counts: Tuple[np.ndarray, ...],
    starts: np.ndarray,
    token_counts: np.ndarray,
    b: int,
) -> np.ndarray:
    starts = np.asarray(starts, dtype=np.int64)
    tc = np.asarray(token_counts, dtype=np.int64)
    if b == 8:
        (c,) = prefix_counts
        lo = np.clip(starts, 0, c.shape[0] - 1)
        hi = np.clip(starts + tc, 0, c.shape[0] - 1)
        return c[hi] == c[lo]
    ce, co = prefix_counts
    q0 = starts // 2
    even_phase = starts % 2 == 0
    out = np.zeros(starts.shape[0], dtype=bool)
    for phase, c in ((True, ce), (False, co)):
        m = even_phase == phase
        if not m.any():
            continue
        lo = np.clip(q0[m], 0, c.shape[0] - 1)
        hi = np.clip(q0[m] + tc[m], 0, c.shape[0] - 1)
        out[m] = c[hi] == c[lo]
    return out


def plan_buckets(
    arena: np.ndarray,
    starts: np.ndarray,
    byte_lens: np.ndarray,
    n: np.ndarray,
    ctx: np.ndarray,
    b: int,
    max_w: int = 1 << 15,
) -> List[Bucket]:
    """Bucket units by (pow2 token count, pow2 n, cleanliness)."""
    tw = b // 8
    token_counts = (np.asarray(byte_lens, dtype=np.int64) + tw - 1) // tw
    prefix = small_word_flags(arena, b)
    clean = units_are_clean(prefix, starts, token_counts, b)
    keys: Dict[Tuple[int, int, bool], List[int]] = {}
    for i in range(len(starts)):
        W = min(_pow2(int(token_counts[i])), max_w)
        if token_counts[i] > max_w:
            W = _pow2(int(token_counts[i]))  # oversized units get own bucket
        N = _pow2(int(n[i]))
        keys.setdefault((W, N, bool(clean[i])), []).append(i)
    buckets = []
    for (W, N, cl), idxs in sorted(keys.items()):
        idxs = np.asarray(idxs, dtype=np.int64)
        cw = decode_xla.tokens_from_arena(arena, np.asarray(starts)[idxs], W, b)
        buckets.append(
            Bucket(
                idxs,
                W,
                N,
                b,
                cl,
                cw,
                token_counts[idxs].astype(np.int32),
                np.asarray(n)[idxs].astype(np.int32),
                np.asarray(ctx)[idxs].astype(np.int32),
            )
        )
    return buckets


class DecodeEngine:
    """Holds device-resident dictionary + bucket tensors; runs timed decode."""

    def __init__(self, view: DecodeView, buckets: List[Bucket]):
        self.view = view
        self.lengths = jnp.asarray(view.lengths.astype(np.int32))
        self.offsets = jnp.asarray(view.offsets.astype(np.int32))
        self.table = jnp.asarray(view.table)
        self.buckets = buckets
        self.dev_buckets = [
            (
                jnp.asarray(bk.cw),
                jnp.asarray(bk.w_valid),
                jnp.asarray(bk.n),
                jnp.asarray(bk.ctx),
            )
            for bk in buckets
        ]

    def decode_all(self):
        """One decode pass over every bucket; returns device outputs."""
        outs = []
        for bk, (cw, wv, n, ctx) in zip(self.buckets, self.dev_buckets):
            out, produced = decode_xla.decode_units(
                cw,
                wv,
                n,
                ctx,
                self.lengths,
                self.offsets,
                self.table,
                b=bk.b,
                n_out=bk.N,
                assume_clean=bk.clean,
            )
            outs.append((out, produced))
        return outs

    def block_and_check(self, outs) -> int:
        total = 0
        for (out, produced), bk in zip(outs, self.buckets):
            produced = np.asarray(produced)
            if not (produced == bk.n).all():
                bad = np.flatnonzero(produced != bk.n)[:5]
                raise ValueError(
                    f"decode produced wrong counts for units {bk.indices[bad]}"
                )
            total += int(produced.sum())
        return total
