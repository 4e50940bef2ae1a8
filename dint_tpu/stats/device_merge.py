"""Device-backed weighted window dedup for statistics collection.

The north-star mapping makes dictionary training "a batched JAX
statistics-collection pipeline" (BASELINE.json): the exact-content
window counting of collectors.py (the reference's adjusted collectors,
statistics_collectors.hpp:66-118, counted by content instead of
collision-tolerant murmur) spends its time in sort-based
weighted-unique merges, which numpy runs over void-dtype rows (memcmp
argsort, a few M rows/s).  Here the same merge runs on device:
lexicographic lax.sort over the window's u32 columns (content is the
key — collision-free by construction, matching collectors.py's exact
semantics), boundary detection, and segment sums via cumsum +
running-max base subtraction (both lower to log-depth associative
scans — compact HLO; an unrolled shifted-add scan and >4M-row sorts
both hang this stack's compiler).

Merges are chunked at CHUNK rows with fixed power-of-two padding so
only a handful of shapes ever compile, and chunk results tree-merge
through the same kernel.

MEASURED RESULT on this environment (TPU behind the axon relay): the
merge is host<->device TRANSFER-bound — every merge ships the raw rows
up and the sorted rows back (~130 MB per 2M-row chunk), and the relay
moves that far slower than the numpy void-sort runs.  Unlike decode
(data resident on device, only a salt crosses per run), stats
collection streams fresh host data per merge, so the device path LOSES
end-to-end here.  It is therefore opt-in via DINT_TPU_DEVICE_STATS=1
— correct (parity-tested), and the right default on hardware where the
TPU is locally attached.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

MIN_DEVICE_ROWS = 1 << 20
CHUNK = 1 << 21


@functools.lru_cache(maxsize=None)
def _merge_fn(s: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def merge(cols, weights):
        # cols: (s, N) i32 window columns; weights: (N,) i32 (pad rows
        # carry weight 0 and sentinel content)
        sorted_ = jax.lax.sort(
            [*[cols[i] for i in range(s)], weights], num_keys=s
        )
        scols = sorted_[:s]
        w = sorted_[s]
        neq = jnp.zeros(w.shape[0] - 1, dtype=bool)
        for i in range(s):
            neq = neq | (scols[i][1:] != scols[i][:-1])
        start = jnp.concatenate([jnp.ones(1, bool), neq])
        end = jnp.concatenate([neq, jnp.ones(1, bool)])
        csum = jnp.cumsum(w)
        excl = csum - w
        # base[i] = csum just before i's segment start: excl at starts
        # is non-decreasing (w >= 0), so a running max propagates it
        base = jax.lax.associative_scan(
            jnp.maximum, jnp.where(start, excl, 0)
        )
        seg_sum = csum - base
        return (*scols, seg_sum, start, end)

    return merge


def _merge_chunk(s: int, windows: np.ndarray, weights: np.ndarray):
    """Device-merge one chunk (rows <= CHUNK), padded to a power of 2."""
    import jax.numpy as jnp

    N = windows.shape[0]
    Npad = 1 << int(np.ceil(np.log2(max(N, 2))))
    cols_np = np.full((s, Npad), -1, dtype=np.int32)
    cols_np[:, :N] = windows.view(np.int32).T
    w_np = np.zeros(Npad, np.int32)
    w_np[:N] = weights.astype(np.int32)
    res = _merge_fn(s)(jnp.asarray(cols_np), jnp.asarray(w_np))
    out = [np.asarray(r) for r in res]
    scols, sums, start, end = out[:s], out[s], out[s + 1], out[s + 2]
    uniq = np.stack([c[start] for c in scols], axis=1).view(np.uint32)
    counts = sums[end].astype(np.int64)
    real = counts > 0  # drop pure-sentinel rows (real rows count >= 1)
    return np.ascontiguousarray(uniq[real]), counts[real]


def unique_weighted_device(
    windows: np.ndarray, weights: np.ndarray, force: bool = False
) -> Tuple[np.ndarray, np.ndarray] | None:
    """(U, s) u32 windows + (U,) weights -> (unique windows, counts),
    or None when the device path should not be used (caller falls back
    to the numpy merge).  ``force`` bypasses the profitability/backend
    gate (tests exercise the kernel on CPU)."""
    import jax

    N, s = windows.shape
    if not force and (
        N < MIN_DEVICE_ROWS
        or jax.default_backend() not in ("tpu",)
        or os.environ.get("DINT_TPU_DEVICE_STATS") != "1"
    ):
        return None
    if weights.max(initial=0) > np.iinfo(np.int32).max // 2:
        return None  # keep i32 segment sums exact
    if weights.sum() > np.iinfo(np.int32).max // 2:
        return None  # global cumsum must stay exact in i32

    from ..utils import jaxcfg

    jaxcfg.enable_compile_cache()
    windows = np.ascontiguousarray(windows, dtype="<u4")
    weights = np.asarray(weights)
    for _ in range(8):  # tree-merge rounds; dedup shrinks each round
        if windows.shape[0] <= CHUNK:
            return _merge_chunk(s, windows, weights)
        parts = [
            _merge_chunk(s, windows[i : i + CHUNK], weights[i : i + CHUNK])
            for i in range(0, windows.shape[0], CHUNK)
        ]
        before = windows.shape[0]
        windows = np.concatenate([p[0] for p in parts])
        weights = np.concatenate([p[1] for p in parts])
        if windows.shape[0] > before * 9 // 10:
            return None  # barely deduping: numpy finish is cheaper
    return None
