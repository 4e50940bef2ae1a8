"""Serve a REAL built index across a device mesh.

Partitions query posting rows doc-wise across the mesh's 'dp' axis and
runs the exact sharded sort-merge top-k (steps.doc_sharded_rows_topk_step).
This is the multi-chip serving configuration for a built DintIndex:
decode happens once on the host/device decode path (TermDecoder or the
BMW-pruned rows), the per-shard row arrays are device_put with a
sharded layout, and one shard_map dispatch serves the whole query
batch.  SURVEY §2.6's "doc-sharded AND/top-k with collectives".
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..query import device_batch

PAD_DOC = int(device_batch.PAD_DOC)


def shard_rows_by_doc(
    drows: Sequence[np.ndarray],
    srows: Sequence[np.ndarray],
    n_shards: int,
    num_docs: int,
    min_width: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split per-query (docid, score) rows into doc-range shards.

    Returns (d (S, Q, P) i32, s (S, Q, P) f32), PAD padded, where shard
    j owns docids in [j*ceil(num_docs/S), (j+1)*ceil(...)).
    ``min_width`` floors P (the top-k step needs k candidates per row).
    """
    S = n_shards
    span = -(-max(num_docs, 1) // S)
    Q = len(drows)
    per = [[None] * Q for _ in range(S)]
    for q in range(Q):
        d = np.asarray(drows[q], np.int64)
        s = np.asarray(srows[q], np.float32)
        shard_of = np.minimum(d // span, S - 1)
        for j in range(S):
            m = shard_of == j
            per[j][q] = (d[m].astype(np.int32), s[m])
    return pad_shard_rows(per, min_width)


def pad_shard_rows(
    per: Sequence[Sequence[Tuple[np.ndarray, np.ndarray]]],
    min_width: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad per-shard per-query (docid, score) pairs to (S, Q, P) with
    PAD_DOC / 0 fills; P = next pow2 of the widest row, floored at
    ``min_width`` (the top-k step needs k candidates per row)."""
    S = len(per)
    Q = len(per[0]) if S else 0
    width = max(
        [min_width]
        + [int(d.shape[0]) for qrows in per for d, _ in qrows]
    )
    P = 1 << max(int(np.ceil(np.log2(width))), 3)
    dd = np.full((S, Q, P), PAD_DOC, np.int32)
    ss = np.zeros((S, Q, P), np.float32)
    for j in range(S):
        for q in range(Q):
            d, s = per[j][q]
            dd[j, q, : d.shape[0]] = d
            ss[j, q, : s.shape[0]] = s
    return dd, ss


def serve_ranked_doc_sharded(
    mesh,
    sharded,  # parallel.build.DocShardedIndex
    norm_lens: np.ndarray,
    queries: Sequence[Sequence[int]],
    k: int = 10,
):
    """Exact ranked top-k over a set of per-doc-range indexes.

    The true multi-host topology: each shard is a SELF-CONTAINED index
    over its doc range (built by parallel.build.build_doc_sharded — no
    host ever holds the whole index); scoring uses the catalog's GLOBAL
    document frequencies and the global norm_lens so per-shard partial
    scores are globally comparable, and one shard_map dispatch merges
    per-shard top-k via all_gather.  Returns (scores (Q, k) desc,
    docids (Q, k) global ids)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..query import ranked
    from ..query.term_decode import TermDecoder
    from . import steps

    S = len(sharded.shards)
    mesh_devs = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    # the step consumes exactly one shard per device (d[0]); a
    # mismatched mesh would silently drop shards
    assert S == mesh_devs, (
        f"shard count {S} != mesh devices {mesh_devs}: rebuild the shard "
        "set or the mesh so each device serves exactly one shard"
    )
    norm_lens = np.asarray(norm_lens, np.float32)
    decs = [TermDecoder(idx) for idx in sharded.shards]
    rows: List[List[Tuple[np.ndarray, np.ndarray]]] = []
    for j, (idx, dec) in enumerate(zip(sharded.shards, decs)):
        lo = int(sharded.doc_lo[j])
        qrows = []
        for q in queries:
            ds, ss = [], []
            for t, qw in ranked.query_weights_from(
                sharded.df, sharded.num_docs, q
            ):
                d = dec.decode_docids([t])[t].astype(np.int64) + lo
                fr = dec.decode_freqs([t])[t]
                ds.append(d.astype(np.int32))
                ss.append(
                    np.float32(qw)
                    * ranked.doc_term_weight(fr, norm_lens[d])
                )
            d = np.concatenate(ds) if ds else np.zeros(0, np.int32)
            s = np.concatenate(ss) if ss else np.zeros(0, np.float32)
            qrows.append((d, s))
        rows.append(qrows)
    dd, ss = pad_shard_rows(rows, min_width=k)
    fn = steps.make_shard_map(
        lambda d, s: steps.doc_sharded_rows_topk_step(d[0], s[0], k),
        mesh,
        (P("dp", None, None), P("dp", None, None)),
        P(),
    )
    put = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", None, None))
    )
    v, ids = fn(put(dd), put(ss))
    jax.block_until_ready(v)
    return np.asarray(v), np.asarray(ids)


def serve_ranked_term_sharded(
    mesh,
    tsharded,  # parallel.build.TermShardedIndex
    norm_lens: np.ndarray,
    queries: Sequence[Sequence[int]],
    k: int = 10,
):
    """Exact ranked top-k over a set of per-term-range indexes.

    The term-partitioned multi-host topology (SURVEY §2.6): each shard
    is a SELF-CONTAINED index over its term range, so a query's terms
    are decoded on different devices and a document's score is split
    across the mesh.  Each shard buckets its partial (docid, score)
    rows by destination doc range on the host; one shard_map dispatch
    then runs all_to_all (postings travel to their doc owner over ICI)
    + the exact doc-sharded sort-merge top-k
    (steps.term_sharded_rows_topk_step).  Scoring uses the catalog's
    GLOBAL document frequencies and the global norm_lens.  Returns
    (scores (Q, k) desc, docids (Q, k) global ids)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..query import ranked
    from ..query.term_decode import TermDecoder
    from . import steps

    S = len(tsharded.shards)
    mesh_devs = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert S == mesh_devs, (
        f"shard count {S} != mesh devices {mesh_devs}: rebuild the shard "
        "set or the mesh so each device serves exactly one term shard"
    )
    norm_lens = np.asarray(norm_lens, np.float32)
    Q = len(queries)
    span = -(-max(tsharded.num_docs, 1) // S)
    # per[src][dest][q] = (docids, scores): source shard src decodes its
    # own terms; rows bucket by the doc-range owner dest
    empty = (np.zeros(0, np.int32), np.zeros(0, np.float32))
    per = [
        [[empty] * Q for _ in range(S)] for _ in range(S)
    ]
    for j, idx in enumerate(tsharded.shards):
        dec = TermDecoder(idx)
        tlo, thi = int(tsharded.term_lo[j]), int(tsharded.term_hi[j])
        for qi, q in enumerate(queries):
            ds = [[] for _ in range(S)]
            ss = [[] for _ in range(S)]
            for t, qw in ranked.query_weights_from(
                tsharded.df, tsharded.num_docs, q
            ):
                if not (tlo <= int(t) < thi):
                    continue
                lt = int(t) - tlo
                d = dec.decode_docids([lt])[lt].astype(np.int64)
                fr = dec.decode_freqs([lt])[lt]
                s = np.float32(qw) * ranked.doc_term_weight(
                    fr, norm_lens[d]
                )
                dest = np.minimum(d // span, S - 1)
                for dj in np.unique(dest):
                    m = dest == dj
                    ds[dj].append(d[m].astype(np.int32))
                    ss[dj].append(s[m].astype(np.float32))
            for dj in range(S):
                if ds[dj]:
                    per[j][dj][qi] = (
                        np.concatenate(ds[dj]),
                        np.concatenate(ss[dj]),
                    )
    width = max(
        [k] + [int(d.shape[0]) for src in per for dst in src
               for d, _ in dst]
    )
    Pw = 1 << max(int(np.ceil(np.log2(width))), 3)
    dd = np.full((S, S, Q, Pw), PAD_DOC, np.int32)
    ss_arr = np.zeros((S, S, Q, Pw), np.float32)
    for j in range(S):
        for dj in range(S):
            for qi in range(Q):
                d, s = per[j][dj][qi]
                dd[j, dj, qi, : d.shape[0]] = d
                ss_arr[j, dj, qi, : s.shape[0]] = s
    fn = steps.make_shard_map(
        lambda d, s: steps.term_sharded_rows_topk_step(d, s, k),
        mesh,
        (P("dp", None, None, None), P("dp", None, None, None)),
        P(),
    )
    put = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", None, None, None))
    )
    v, ids = fn(put(dd), put(ss_arr))
    jax.block_until_ready(v)
    return np.asarray(v), np.asarray(ids)


def serve_boolean_doc_sharded(
    sharded,  # parallel.build.DocShardedIndex
    queries: Sequence[Sequence[int]],
) -> List[np.ndarray]:
    """Exact boolean AND over a set of per-doc-range indexes.

    Every document lives in exactly one shard, so the global AND is the
    concatenation of per-shard local ANDs (shard-local ids rebased to
    global) — no cross-shard communication at all, the boolean analogue
    of doc-sharded top-k.  Returns per-query sorted global docid
    arrays, identical to and_query on the unsharded index."""
    from ..query import boolean
    from ..query.term_decode import TermDecoder

    all_terms = sorted({int(t) for q in queries for t in q})
    results = [[] for _ in queries]
    for j, shard in enumerate(sharded.shards):
        # one decoder per shard, constructed inside the loop: the
        # shards are independent, so peak host memory is ONE shard's
        # decoded query terms, not the union across all shards
        dec = TermDecoder(shard)
        lo = np.uint32(int(sharded.doc_lo[j]))
        decoded = dec.decode_docids(all_terms)
        for qi, q in enumerate(queries):
            r = boolean.and_query(decoded, q)
            if r.shape[0]:
                results[qi].append(r + lo)
    return [
        np.concatenate(parts) if parts else np.zeros(0, np.uint32)
        for parts in results
    ]


def serve_ranked_sharded(
    mesh,
    index,
    decoder,
    wdata,
    queries: Sequence[Sequence[int]],
    k: int = 10,
    pruned: bool = True,
):
    """Exact ranked top-k of `queries` over a real index, doc-sharded
    across `mesh`.  Returns (scores (Q, k) desc, docids (Q, k)).

    With ``pruned`` and a block-max wand_data sidecar, rows contain only
    surviving-block postings (query/bmw.py) — same top-k, less data on
    the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from . import steps

    if (
        pruned
        and getattr(wdata, "block_maxw", None) is not None
        and hasattr(decoder, "lazy_cache")
        and hasattr(decoder.lazy_cache, "docs_blocks_batch")
    ):
        import os as _os

        if _os.environ.get("DINT_TPU_DEVICE_BMW", "1") == "1":
            from ..query import bmw_device

            drows, srows, _ = bmw_device.build_pruned_rows_device(
                decoder.lazy_cache, index, wdata, queries, k
            )
        else:
            from ..query import bmw

            drows, srows, _ = bmw.build_pruned_rows(
                decoder.lazy_cache, index, wdata, queries, k
            )
    else:
        drows, srows = device_batch.build_ranked_rows(
            index, decoder, wdata, queries
        )
    S = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    dd, ss = shard_rows_by_doc(
        drows, srows, S, index.num_docs, min_width=k
    )
    fn = steps.make_shard_map(
        lambda d, s: steps.doc_sharded_rows_topk_step(d[0], s[0], k),
        mesh,
        (P("dp", None, None), P("dp", None, None)),
        P(),
    )
    put = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("dp", None, None))
    )
    v, ids = fn(put(dd), put(ss))
    jax.block_until_ready(v)
    return np.asarray(v), np.asarray(ids)
