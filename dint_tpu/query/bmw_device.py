"""Device-resident Block-Max survival tests (VERDICT r3 item 7).

The host engine (query/bmw.py prune_blocks) runs the per-block
survival test with numpy searchsorted + sparse-table range maxima —
~0.8 ms/query of host pre-work per batch that the device batch engine
must wait for.  This module runs the SAME test as one device dispatch
over the whole query batch, gather-free:

  events     every block b of every query term t contributes two
             events: (docid=lo_b, +ub_b) and (docid=hi_b+1, -ub_b),
             where ub_b = q_weight(t) * block_maxw(t, b).
  sort       one lax.sort per batch row by (docid, is_end): at equal
             docids every start applies before any end, so interval
             values can only OVER-estimate the true pointwise bound
             U(x) = sum_t ub(block_t(x), t) — the test stays
             conservative (see EXACTNESS below).
  prefix sum U at every elementary interval = cumsum of sorted deltas.
  seg-cummax for each term slot k: running max of U with resets at
             slot k's start events (associative_scan with the
             (max, reset) monoid).  At slot k's end-event positions
             the scan value is max U over that block's docid span.
  survive    byte mask: bit k set at positions that are slot-k end
             events whose running max >= tau(q).  Ships (Q, P) u8 to
             the host, which reorders bits into per-term block masks —
             end events of one term arrive in block order, so the
             unpack is a boolean compaction, no permutation needed.

EXACTNESS.  The host test bounds each block by summing PER-TERM range
maxima; the pointwise U(x) here is tighter (max of a sum <= sum of
maxes), and the tie-ordering only ever over-counts a block that ends
exactly where another starts.  Over-estimates keep extra blocks
(less pruning, same results); under-estimates are impossible: every
interval inside a block's span appears between its start and end
events in the sorted order with all overlapping +ub applied.  The
surviving set therefore still satisfies query/bmw.py's exactness
proof, and is parity-tested against ranked_or plus checked to be a
superset-or-equal of the host pass-1 masks
(tests/test_bmw_device.py).

The reference has no analogue: its block-max tests ride the WAND
pivot walk one posting at a time (wand_data.hpp + queries.hpp:190-307).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import BLOCK_SIZE
from . import bmw as bmw_mod
from . import ranked as ranked_mod

# term slots per query supported by one survival byte
MAX_SLOTS = 8

# device sort budgets: the survival test's 5-array 2-key sort blows up
# the compiler at monster widths (the known >4M-row multi-array sort
# hazard — the remote compile helper gets OOM-killed at 90.8M-scale
# event rows).  Queries whose event row exceeds EVENT_CAP take the
# host test (few monster unions, ~1 ms each); the device batch chunks
# so Q_chunk * P stays under SORT_ELEMS.
import os as _os

EVENT_CAP = int(_os.environ.get("DINT_TPU_BMW_EVENT_CAP", str(1 << 15)))
# per-chunk sort budget: the environment's measured multi-array sort
# compile hazard starts well under 4M rows (CLAUDE.md: chunk to <=2M);
# a T=5 survival batch at 8M elements hung the remote compiler
SORT_ELEMS = 1 << 21


@functools.lru_cache(maxsize=None)
def _survival_fn(P: int, T: int):
    import jax
    import jax.numpy as jnp

    def seg_cummax(u, resets):
        # running max of u with restart where resets is True:
        # monoid ((m, r) . (m2, r2)) = (m2 if r2 else max(m,m2), r|r2)
        def comb(a, b):
            m1, r1 = a
            m2, r2 = b
            return jnp.where(r2, m2, jnp.maximum(m1, m2)), r1 | r2

        m, _ = jax.lax.associative_scan(comb, (u, resets), axis=1)
        return m

    @jax.jit
    def run(docid, is_end, delta, slot, tau):
        # two-key sort per query row: (docid, is_end*16+slot) — starts
        # before ends at ties, slot makes the key pair UNIQUE so the
        # non-stable device sort and the host numpy replay agree
        # position for position (slot order within a tie is irrelevant
        # to U).  Two int32 keys, no wide arithmetic: int64 is off by
        # default and a packed key overflows int32 at real docids.
        sub = (is_end.astype(jnp.int32) * 16 + slot.astype(jnp.int32))
        _, _, delta_s, slot_s, end_s = jax.lax.sort(
            (docid, sub, delta, slot, is_end), dimension=1, num_keys=2
        )
        u = jnp.cumsum(delta_s, axis=1)
        out = jnp.zeros(docid.shape, jnp.uint8)
        for k in range(T):
            is_k = slot_s == k
            starts_k = is_k & (end_s == 0)
            ends_k = is_k & (end_s == 1)
            m = seg_cummax(u, starts_k)
            # at slot-k end events: does the block's best interval
            # reach tau?  (m at the end position includes the interval
            # after the end event too — an over-estimate only: its
            # value lacks just this block's own ub, so it never
            # exceeds the true in-span max + 0)
            hit = ends_k & (m >= tau[:, None])
            out = out | (hit.astype(jnp.uint8) << k)
        return out

    return run


def prune_blocks_device(
    cache,
    index,
    wdata,
    queries: Sequence[Sequence[int]],
    k: int,
    taus_hint: Sequence[Optional[float]] = None,
) -> Tuple[List[Dict[int, np.ndarray]], List[float], Dict[str, int]]:
    """Batched device survival tests for many queries at once.

    Returns (per-query {term: keep bool mask}, taus, stats) with the
    same contract as bmw.prune_blocks pass 1 (the point-bound
    refinement pass stays host-side in build_pruned_rows_device).
    tau estimation stays host-side: it decodes a handful of probe
    blocks per query (real partial scores are what make tau a valid
    lower bound)."""
    if wdata.block_maxw is None:
        raise ValueError("wand_data has no block-max sidecar")
    shared = {}        # device geometry cache: (term, qw) -> (g, None)
    shared_host = {}   # host-fallback cache (carries _RangeMax tables)
    per_q = []
    taus = []
    P_need = 1
    for qi, q in enumerate(queries):
        weighted = ranked_mod._query_weights(index, q)
        if not weighted:
            per_q.append(None)
            taus.append(0.0)
            continue
        if len(weighted) > MAX_SLOTS:
            # fall back to the host test for very wide queries
            keep, tau, _ = bmw_mod.prune_blocks(
                cache, index, wdata, q, k, _cache=shared_host)
            per_q.append(("host", weighted, keep))
            taus.append(tau)
            continue
        geoms = []
        ev = 0
        for t, qw in weighted:
            key = (t, float(qw))
            if key not in shared:
                g = bmw_mod._term_geom(index, wdata, t, qw)
                shared[key] = (g, None)
            g = shared[key][0]
            geoms.append((t, g))
            ev += 2 * g[0].shape[0]
        if ev > EVENT_CAP:
            # monster event rows use the host test too (see EVENT_CAP)
            keep, tau, _ = bmw_mod.prune_blocks(
                cache, index, wdata, q, k, _cache=shared_host)
            per_q.append(("host", weighted, keep))
            taus.append(tau)
            continue
        # taus_hint: caller-supplied valid lower bound (e.g. the
        # serving store's per-term top-k tables — real achievable
        # partial totals, no probe-block decode); else probe blocks
        if taus_hint is not None and taus_hint[qi] is not None:
            tau = float(taus_hint[qi])
        else:
            tau = bmw_mod.estimate_tau(cache, index, wdata, weighted, k)
        tau *= 1.0 - 1e-6  # same f32-rounding shave as the host test
        per_q.append(("dev", weighted, geoms))
        taus.append(float(tau))
        P_need = max(P_need, ev)
    P = 1 << max(int(np.ceil(np.log2(P_need))), 3)
    dev_rows = [i for i, p in enumerate(per_q)
                if p is not None and p[0] == "dev"]
    keeps: List[Dict[int, np.ndarray]] = [None] * len(queries)
    stats = {"device_queries": len(dev_rows),
             "host_fallback_queries":
                 sum(1 for p in per_q if p is not None and p[0] == "host"),
             "event_width": P}
    if dev_rows:
        Q = len(dev_rows)
        docid = np.full((Q, P), np.iinfo(np.int32).max, np.int32)
        is_end = np.zeros((Q, P), np.uint8)
        delta = np.zeros((Q, P), np.float32)
        slot = np.full((Q, P), 255, np.uint8)
        tau_arr = np.zeros(Q, np.float32)
        for r, qi in enumerate(dev_rows):
            _, weighted, geoms = per_q[qi]
            tau_arr[r] = taus[qi]
            pos = 0
            for sk, (t, (lo, hi, ub)) in enumerate(geoms):
                nb = lo.shape[0]
                docid[r, pos:pos + nb] = lo
                delta[r, pos:pos + nb] = ub
                slot[r, pos:pos + nb] = sk
                is_end[r, pos:pos + nb] = 0
                pos += nb
                docid[r, pos:pos + nb] = hi.astype(np.int64) + 1
                delta[r, pos:pos + nb] = -ub
                slot[r, pos:pos + nb] = sk
                is_end[r, pos:pos + nb] = 1
                pos += nb
        T = max(len(per_q[qi][2]) for qi in dev_rows)
        fn = _survival_fn(P, T)
        # chunk rows so each sort stays under the compile-safe element
        # budget (at most two compiled shapes: full chunk + remainder)
        rows_per = max(1, SORT_ELEMS // P)
        out = np.empty((Q, P), np.uint8)
        for c0 in range(0, Q, rows_per):
            c1 = min(c0 + rows_per, Q)
            out[c0:c1] = np.asarray(
                fn(docid[c0:c1], is_end[c0:c1], delta[c0:c1],
                   slot[c0:c1], tau_arr[c0:c1]))
        # unpack: per row, slot-k end events in sorted order ARE that
        # term's blocks in block order (disjoint spans, increasing hi)
        ends_sorted = _host_end_order(docid, is_end, slot)
        for r, qi in enumerate(dev_rows):
            _, weighted, geoms = per_q[qi]
            keep = {}
            for sk, (t, (lo, hi, ub)) in enumerate(geoms):
                sel = ends_sorted[r] == sk
                bits = (out[r][sel] >> sk) & 1
                assert bits.shape[0] == lo.shape[0], (t, bits.shape, lo.shape)
                keep[t] = bits.astype(bool)
            keeps[qi] = keep
    for qi, p in enumerate(per_q):
        if p is not None and p[0] == "host":
            keeps[qi] = p[2]
    return keeps, taus, stats


def _host_end_order(docid, is_end, slot):
    """Host replay of the device sort ORDER (keys only, no values):
    for each row, the slot id at each sorted position for end events
    (255 elsewhere).  numpy argsort on the same (docid, is_end) key is
    exactly the device lax.sort order because the composite key is
    unique up to ties that carry identical (slot, is_end) payload
    semantics per term (two blocks of one term never share a
    boundary docid)."""
    sub = is_end.astype(np.int64) * 16 + slot.astype(np.int64)
    key = docid.astype(np.int64) * 512 + sub
    order = np.argsort(key, axis=1, kind="stable")
    slot_s = np.take_along_axis(slot, order, axis=1)
    end_s = np.take_along_axis(is_end, order, axis=1)
    return np.where(end_s == 1, slot_s, 255)


def build_pruned_rows_device(
    cache,
    index,
    wdata,
    queries: Sequence[Sequence[int]],
    k: int,
):
    """device-test variant of bmw.build_pruned_rows: survival masks
    from ONE device dispatch, survivor decode + row assembly on the
    host as before.  Returns (drows, srows, stats)."""
    from .device_batch import PAD_DOC

    if int(getattr(index, "num_docs", 0)) > int(PAD_DOC):
        raise ValueError(
            f"device batch engine requires docids < 2^31-1; index has "
            f"num_docs={index.num_docs}"
        )
    keeps, taus, dstats = prune_blocks_device(
        cache, index, wdata, queries, k)
    agg = {"postings_total": 0, "postings_kept": 0, "blocks_total": 0,
           "blocks_kept": 0, **dstats}
    plans = []
    need = []
    for qi, q in enumerate(queries):
        weighted = ranked_mod._query_weights(index, q)
        if not weighted:
            plans.append((None, None))
            continue
        keep = keeps[qi]
        plans.append((weighted, keep))
        for t, _ in weighted:
            m = keep[t]
            sizes = bmw_mod._block_sizes(index, t, m.shape[0])
            agg["postings_total"] += int(index.list_n[t])
            agg["postings_kept"] += int(sizes[m].sum())
            agg["blocks_total"] += m.shape[0]
            agg["blocks_kept"] += int(m.sum())
            p0, _ = index.list_blocks(t)
            need.extend((t, p0 + int(rb)) for rb in np.flatnonzero(m))
    need = list(dict.fromkeys(need))
    cache.docs_blocks_batch(need)
    cache.freqs_blocks_batch(need)
    drows, srows = [], []
    for weighted, keep in plans:
        if weighted is None:
            drows.append(np.zeros(0, np.int32))
            srows.append(np.zeros(0, np.float32))
            continue
        dparts, sparts = [], []
        for t, qw in weighted:
            p0, _ = index.list_blocks(t)
            for rb in np.flatnonzero(keep[t]):
                d = cache.docs_block(t, p0 + int(rb))
                f = cache.freqs_block(t, p0 + int(rb))
                w = ranked_mod.doc_term_weight(
                    f, wdata.norm_lens[d.astype(np.int64)]
                )
                dparts.append(d.astype(np.int32))
                sparts.append(np.float32(qw) * w)
        drows.append(np.concatenate(dparts) if dparts
                     else np.zeros(0, np.int32))
        srows.append(np.concatenate(sparts).astype(np.float32)
                     if sparts else np.zeros(0, np.float32))
    return drows, srows, agg
