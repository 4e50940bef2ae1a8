"""Sharded device steps (mesh-parallel building blocks).

The reference's only parallelism is a construction thread pool
(semiasync_queue.hpp:12-95).  Here construction-time heavy passes run
data-parallel over a `jax.sharding.Mesh`: blocks are sharded over the
'dp' axis, the dictionary is replicated, and GSPMD inserts the
cross-chip reductions (the all-reduce replacing the reference's
serial commit ordering).

`stats_training_step` is the device half of dictionary training: a
bucketed histogram of sub-block patterns per selector context.  The
exact content counting/dedup stays on the host (stats/collectors.py);
the device histogram is the scalable first pass for pruning candidates
at Gov2/ClueWeb scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BLOCK_SIZE, NUM_SELECTORS, TARGET_SIZES


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise 32-bit mixer (murmur3 finalizer style)."""
    z = x.astype(jnp.uint32)
    z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
    z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
    return z ^ (z >> 16)


def selectors(blocks: jnp.ndarray) -> jnp.ndarray:
    """Selector code per block row (statistics_collectors.hpp:21-40)."""
    # compare in uint32 (x64 is disabled; 65536 fits comfortably)
    mx = blocks.max(axis=1).astype(jnp.uint32)
    sel = (
        (mx >= 2).astype(jnp.int32)
        + (mx >= 4)
        + (mx >= 16)
        + (mx >= 256)
        + (mx >= 65536)
    )
    return sel.astype(jnp.int32)


def window_bucket_hashes(blocks: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, BLOCK_SIZE) -> (B, BLOCK_SIZE//size) u32 window hashes."""
    B = blocks.shape[0]
    wins = blocks.reshape(B, BLOCK_SIZE // size, size)
    h = jnp.zeros(wins.shape[:2], dtype=jnp.uint32)
    for t in range(size):
        h = h * jnp.uint32(0x01000193) ^ mix32(wins[:, :, t])
    return h


def stats_training_step(blocks: jnp.ndarray, n_buckets: int = 1 << 16):
    """One sharded statistics pass over a batch of 256-int gap blocks.

    Returns (counts, selectors): counts is a
    (NUM_SELECTORS * n_buckets,) histogram of hashed windows of every
    target size, bucketed by the block's selector context — the
    device-side analogue of adjusted::collect
    (statistics_collectors.hpp:90-107).
    """
    sel = selectors(blocks)
    counts = jnp.zeros(NUM_SELECTORS * n_buckets, dtype=jnp.int32)
    for s in TARGET_SIZES:
        h = window_bucket_hashes(blocks, s)
        bucket = (h & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        idx = sel[:, None] * n_buckets + bucket
        counts = counts.at[idx.reshape(-1)].add(1)
    return counts, sel
