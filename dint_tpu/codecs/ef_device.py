"""Device (XLA) whole-list Elias-Fano decode — gather-free.

Decode semantics of compact_elias_fano (compact_elias_fano.hpp:138-417,
materialized whole-list like codecs/ef.py::decode_all): value[i] =
((select_1(i) - i - 1) << w) | low[i].  On this stack dynamic gathers
are unusable, so both parts are expressed densely:

* LOW bits: expand the region's u32 words to a dense bit array
  (words >> iota & 1 — pure shifts), dynamic-slice the n*w field bits,
  reshape (n, w), and shift-sum each row (exact in u32; LSB-first like
  bitio.read_fields).
* HIGH bits (select_1): same dense bit expansion, then a 2-key
  lax.sort of (1-bit, position): ones sort first in position order, so
  the first n sorted positions ARE select_1(0..n-1).

Lists are batched by compiled shape (w is compile-time; words/count
dimensions pad to powers of two) so one dispatch decodes every list of
a bucket — the per-shape compile is cached on disk
(utils/jaxcfg.enable_compile_cache).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from . import ef as ef_mod


def _pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


@functools.lru_cache(maxsize=None)
def _decode_fn(w: int, LW: int, HW: int, NP: int):
    """jit'd (B, LW) low-words x (B, HW) high-words -> (B, NP) values."""
    import jax
    import jax.numpy as jnp

    LBITS = LW * 32
    HBITS = HW * 32

    def expand_bits(words):  # (B, W) u32 -> (B, W*32) u32 in {0,1}
        b = (words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
        return b.reshape(words.shape[0], -1)

    @jax.jit
    def decode(low_words, high_words, r0_low, r0_high, hb_len, n_mask):
        B = low_words.shape[0]
        # ---- low fields ----
        if w:
            bits = expand_bits(low_words)  # (B, LBITS)
            sl = jax.vmap(
                lambda row, s: jax.lax.dynamic_slice(row, (s,), (NP * w,))
            )(bits, r0_low)
            sl = sl.reshape(B, NP, w)
            weights = (jnp.uint32(1) << jnp.arange(w, dtype=jnp.uint32))
            low = (sl * weights[None, None, :]).sum(axis=2, dtype=jnp.uint32)
        else:
            low = jnp.zeros((B, NP), jnp.uint32)
        # ---- high select_1 ----
        hbits = expand_bits(high_words)  # (B, HBITS)
        hsl = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (HBITS - 32,))
        )(hbits, r0_high)
        pos = jnp.arange(HBITS - 32, dtype=jnp.int32)[None, :]
        valid = pos < hb_len[:, None]
        key1 = jnp.where(valid & (hsl == 1), 0, 1).astype(jnp.int32)
        pos_b = jnp.broadcast_to(pos, key1.shape)
        _, spos = jax.lax.sort([key1, pos_b], num_keys=2, dimension=1)
        rel = spos[:, :NP].astype(jnp.uint32)  # select_1(i), i < n
        i = jnp.arange(NP, dtype=jnp.uint32)[None, :]
        high = rel - i - jnp.uint32(1)
        vals = (high << jnp.uint32(w)) | low
        return jnp.where(i < n_mask[:, None], vals, 0)

    return decode


def decode_lists(
    words: np.ndarray,
    specs: List[Tuple[int, int, int]],
    params: ef_mod.GlobalParameters,
) -> List[np.ndarray]:
    """Decode many EF lists from one u64-word arena.

    specs: (offset_bits, universe, n) per list — the same arguments
    codecs/ef.py::compact_elias_fano.decode_all takes.  Lists group by
    compiled shape; each group decodes in one device dispatch.
    """
    import jax.numpy as jnp

    from ..utils import jaxcfg

    jaxcfg.enable_compile_cache()
    w32 = np.ascontiguousarray(words, dtype="<u8").view("<u4")
    out: List[np.ndarray] = [None] * len(specs)
    groups: Dict[Tuple[int, int, int, int], List[int]] = {}
    metas = []
    for k, (off, universe, n) in enumerate(specs):
        assert universe < 1 << 32, "device EF decode is u32-valued"
        of = ef_mod.ef_offsets(off, universe, n, params)
        w = of.lower_bits
        # low region, sliced at word granularity
        lw0 = of.lower_bits_offset >> 5
        r0l = of.lower_bits_offset & 31
        lw_cnt = (r0l + max(n * w, 1) + 31) >> 5
        # high region (+1 guard word: the kernel slices HBITS-32)
        hw0 = of.higher_bits_offset >> 5
        r0h = of.higher_bits_offset & 31
        hw_cnt = ((r0h + of.higher_bits_length + 31) >> 5) + 1
        NP = _pow2(n)
        # the kernel dynamic-slices NP*w bits starting at r0 < 32
        LW = _pow2(max(lw_cnt, (31 + NP * w + 31) >> 5))
        HW = _pow2(hw_cnt)
        metas.append((of, lw0, r0l, hw0, r0h, LW, HW, NP))
        groups.setdefault((w, LW, HW, NP), []).append(k)

    for (w, LW, HW, NP), idxs in groups.items():
        B = len(idxs)
        low_w = np.zeros((B, LW), np.uint32)
        high_w = np.zeros((B, HW), np.uint32)
        r0l = np.zeros(B, np.int32)
        r0h = np.zeros(B, np.int32)
        hb = np.zeros(B, np.int32)
        nm = np.zeros(B, np.int32)
        for j, k in enumerate(idxs):
            of, lw0, rl, hw0, rh, _, _, _ = metas[k]
            lcnt = min(LW, w32.shape[0] - lw0)
            low_w[j, :lcnt] = w32[lw0 : lw0 + lcnt]
            hcnt = min(HW, w32.shape[0] - hw0)
            high_w[j, :hcnt] = w32[hw0 : hw0 + hcnt]
            r0l[j] = rl
            r0h[j] = rh
            hb[j] = of.higher_bits_length
            nm[j] = of.n
        vals = np.asarray(
            _decode_fn(w, LW, HW, NP)(
                jnp.asarray(low_w), jnp.asarray(high_w), jnp.asarray(r0l),
                jnp.asarray(r0h), jnp.asarray(hb), jnp.asarray(nm),
            )
        )
        for j, k in enumerate(idxs):
            out[k] = vals[j, : metas[k][0].n].astype(np.uint64)
    return out
