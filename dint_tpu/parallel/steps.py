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
