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


def make_shard_map(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions (replication checking is disabled:
    collective outputs like all_gather-merge results are replicated in
    ways the static checker cannot always infer)."""
    try:
        from jax import shard_map as sm

        return sm(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as sm

        return sm(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def term_sharded_and_step(cand: jnp.ndarray, shard_docs: jnp.ndarray,
                          shard_valid: jnp.ndarray, axis: str = "dp"):
    """Term-sharded boolean AND under shard_map.

    The index is term-partitioned across the mesh (SURVEY §2.6's
    "term-sharded query serving"): every device holds, for each of the
    Q in-flight queries, (at most) one of its terms' docID lists.  Each
    device computes a membership mask of the replicated candidate set
    against its local list; the cross-device AND is a psum of misses —
    the collective that replaces the reference's sequential leapfrog
    (queries.hpp:59-79).

    cand:        (Q, C) candidate docIDs, replicated
    shard_docs:  (Q, L) this shard's sorted docID list per query
                 (padded with 0xFFFFFFFF)
    shard_valid: (Q,) whether this shard holds a term for the query
    returns      (Q, C) bool: candidate present in every shard's term
    """
    pos = jax.vmap(jnp.searchsorted)(shard_docs, cand)
    pos = jnp.minimum(pos, shard_docs.shape[1] - 1)
    hit = jnp.take_along_axis(shard_docs, pos, axis=1) == cand
    miss = (~hit) & shard_valid[:, None]
    misses = jax.lax.psum(miss.astype(jnp.int32), axis)
    return misses == 0


def term_sharded_topk_step(shard_scores: jnp.ndarray, k: int,
                           axis: str = "dp"):
    """Term-sharded ranked top-k under shard_map.

    The ranked-retrieval analogue of term_sharded_and_step: with the
    index term-partitioned, each device holds the BM25 contributions of
    ITS terms to every (query, doc) pair; the global score is a psum
    over the mesh and the top-k selection runs replicated (the
    collective pattern that replaces the reference's single-threaded
    wand/maxscore accumulation, queries.hpp:190-307).

    shard_scores: (Q, D) this shard's partial scores
    returns       (values (Q, k), doc_ids (Q, k))
    """
    total = jax.lax.psum(shard_scores, axis)
    return jax.lax.top_k(total, k)


def doc_sharded_topk_step(local_docs: jnp.ndarray,
                          local_scores: jnp.ndarray, k: int,
                          axis: str = "dp"):
    """Doc-sharded ranked top-k under shard_map.

    The complementary partitioning to term_sharded_topk_step: the index
    is partitioned by document range (SURVEY §2.6's doc-sharded option),
    so each device fully scores ITS documents for every query and the
    global top-k merges the per-shard top-k candidates with an
    all_gather (k << D makes the gathered candidate set tiny — the
    classic distributed-search gather-merge).

    local_docs:   (Q, D) docids owned by this shard
    local_scores: (Q, D) their complete scores on this shard
    returns       (values (Q, k), doc_ids (Q, k)) — globally exact
    """
    lv, li = jax.lax.top_k(local_scores, k)  # (Q, k) per shard
    ld = jnp.take_along_axis(local_docs, li, axis=1)
    gv = jax.lax.all_gather(lv, axis, axis=1)  # (Q, S, k)
    gd = jax.lax.all_gather(ld, axis, axis=1)
    Q = gv.shape[0]
    gv = gv.reshape(Q, -1)
    gd = gd.reshape(Q, -1)
    v, i = jax.lax.top_k(gv, k)
    return v, jnp.take_along_axis(gd, i, axis=1)


PAD_DOC_I32 = jnp.int32(2**31 - 1)


def _seg_scan_rows(x: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive scan along the last axis (log-step doubling;
    same recurrence as query/device_batch.py seg_scan)."""
    P = x.shape[-1]
    f = start
    k = 1
    while k < P:
        xs = jnp.pad(x, ((0, 0), (k, 0)))[:, :P]
        fs = jnp.pad(f, ((0, 0), (k, 0)), constant_values=True)[:, :P]
        x = x + jnp.where(f, jnp.zeros_like(x), xs)
        f = f | fs
        k *= 2
    return x


def doc_sharded_rows_topk_step(d: jnp.ndarray, s: jnp.ndarray, k: int,
                               axis: str = "dp"):
    """Doc-sharded ranked serving over REAL posting rows.

    The serving configuration for a built index partitioned by document
    range: each device holds, per query, the (docid, partial score)
    posting rows whose docids fall in ITS doc range (PAD_DOC padded).
    Because a document lives in exactly one shard, the local sort-merge
    score sums are COMPLETE, so per-shard top-k + all_gather merge is
    globally exact (doc_sharded_topk_step's argument, applied to the
    sort-merge kernel of query/device_batch.py).

    d: (Q, P) i32 docids, s: (Q, P) f32 partial scores (this shard)
    returns (values (Q, k), doc_ids (Q, k)) — exact global top-k
    """
    d, s = jax.lax.sort([d, s], num_keys=1)
    start = jnp.concatenate(
        [jnp.ones_like(d[:, :1], bool), d[:, 1:] != d[:, :-1]], axis=1
    )
    sums = _seg_scan_rows(s, start)
    end = jnp.concatenate(
        [d[:, :-1] != d[:, 1:], jnp.ones_like(d[:, :1], bool)], axis=1
    )
    valid = d != PAD_DOC_I32
    cand = jnp.where(end & valid, sums, -jnp.inf)
    lv, li = jax.lax.top_k(cand, k)
    ld = jnp.take_along_axis(d, li, axis=1)
    gv = jax.lax.all_gather(lv, axis, axis=1)  # (Q, S, k)
    gd = jax.lax.all_gather(ld, axis, axis=1)
    Q = gv.shape[0]
    v, i = jax.lax.top_k(gv.reshape(Q, -1), k)
    return v, jnp.take_along_axis(gd.reshape(Q, -1), i, axis=1)


def term_sharded_rows_topk_step(d: jnp.ndarray, s: jnp.ndarray, k: int,
                                axis: str = "dp"):
    """Term-sharded ranked serving over REAL posting rows.

    The serving configuration for an index partitioned by TERM range
    (SURVEY §2.6's term-sharded option on a real built index): each
    device decodes only ITS terms' posting lists, so a document's score
    contributions are scattered across devices.  The step repartitions
    postings to their doc-range owner with one all_to_all (the ICI
    shuffle replacing the reference's single-thread accumulation,
    queries.hpp:190-307), after which every docid's rows are complete
    on exactly one device and the doc-sharded sort-merge top-k merge
    applies unchanged — exact by the same ownership argument.

    d: (1, S, Q, P) i32 docids — this term shard's postings bucketed by
       destination doc shard (bucket j = docids in j's doc range),
       PAD_DOC padded; s: same-shape f32 partial scores.
    returns (values (Q, k), doc_ids (Q, k)) — exact global top-k
    """
    d = jax.lax.all_to_all(d, axis, split_axis=1, concat_axis=0)
    s = jax.lax.all_to_all(s, axis, split_axis=1, concat_axis=0)
    # (S, 1, Q, P): rows from every source term shard for MY doc range
    Q = d.shape[2]
    d = d[:, 0].transpose(1, 0, 2).reshape(Q, -1)
    s = s[:, 0].transpose(1, 0, 2).reshape(Q, -1)
    return doc_sharded_rows_topk_step(d, s, k, axis)


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


# ---------------------------------------------------------------------------
# Mesh-sharded ladder decode (SURVEY §5 long-list story: very long
# lists shard across the chip mesh — block-parallel decode)
# ---------------------------------------------------------------------------


def ladder_shard_pack(flat_values, n_shards: int):
    """Doc-shard a flat value stream's canonical ladder image.

    The 256-value blocks split into ``n_shards`` contiguous ranges
    (block-parallel: each block packs independently at its own ladder
    width, so per-shard images are exactly slices of the unsharded
    image — kernels/unpack_device.ladder_plan_from_values geometry).
    Per-width arrays pad to the max block count across shards so one
    shard_map can decode every shard in parallel.

    Returns (packed, counts, order, tail):
      packed  {width: (S, NBw_max, words_w) u32}
      counts  {width: (S,) int32 valid block count}
      order   per-shard per-width original block indices (host-side
              reassembly map)
      tail    (tail_offset, values) — the <256-value stream tail,
              decoded host-side like the single-chip engine's partials
    """
    import numpy as np

    from ..kernels.unpack_device import _LADDER, _ladder_width, _pack_w

    flat = np.ascontiguousarray(flat_values, dtype=np.uint32)
    vpb = BLOCK_SIZE
    nb = flat.shape[0] // vpb
    blocks = flat[: nb * vpb].reshape(nb, vpb)
    tail = (nb * vpb, flat[nb * vpb:].copy())
    S = n_shards
    span = -(-nb // S) if nb else 0
    per_w_blocks = {w: [] for w in _LADDER}
    per_w_order = {w: [] for w in _LADDER}
    for s in range(S):
        b0, b1 = s * span, min((s + 1) * span, nb)
        sl = blocks[b0:b1]
        if sl.shape[0]:
            mx = sl.max(axis=1)
            w_need = np.maximum(
                np.ceil(np.log2(mx.astype(np.float64) + 1.0)), 1
            ).astype(np.int64)
            lw = np.asarray([_ladder_width(int(w)) for w in w_need])
        else:
            lw = np.zeros(0, np.int64)
        for w in _LADDER:
            rows = np.flatnonzero(lw == w)
            per_w_blocks[w].append(sl[rows] if rows.size
                                   else np.zeros((0, vpb), np.uint32))
            per_w_order[w].append(rows + b0)
    packed, counts, order = {}, {}, {}
    for w in _LADDER:
        nmax = max(b.shape[0] for b in per_w_blocks[w])
        if nmax == 0:
            continue
        words = _pack_w(np.zeros((1, vpb), np.uint32), w).shape[1]
        arr = np.zeros((S, nmax, words), np.uint32)
        cnt = np.zeros(S, np.int32)
        for s in range(S):
            b = per_w_blocks[w][s]
            cnt[s] = b.shape[0]
            if b.shape[0]:
                arr[s, : b.shape[0]] = _pack_w(b, w)
        packed[w] = arr
        counts[w] = cnt
        order[w] = per_w_order[w]
    return packed, counts, order, tail


def ladder_sharded_decode_step(packed, counts, axis: str = "dp"):
    """Per-device ladder decode of one shard's width classes.

    ``packed`` {width: (1, NBw, words)} (mesh axis stripped by
    shard_map), ``counts`` {width: (1,)}.  Every width class decodes as
    the same broadcast shift/mask the single-chip engine uses
    (unpack_device._fns); the psum'd total decoded-int count is the
    step's collective (the real serving merge collectives live in the
    topk steps above).  Returns ({width: (NBw, 256) u32}, total)."""
    outs = {}
    local = jnp.int32(0)
    for w, arr in packed.items():
        a = arr[0]
        vpw = 32 // w
        j = jnp.arange(BLOCK_SIZE)
        wi = j // vpw
        sh = ((j % vpw) * w).astype(jnp.uint32)
        mask = jnp.uint32((1 << w) - 1) if w < 32 else jnp.uint32(0xFFFFFFFF)
        vals = (a[:, wi] >> sh[None, :]) & mask
        outs[w] = vals
        local = local + counts[w][0] * BLOCK_SIZE
    total = jax.lax.psum(local, axis)
    return outs, total
