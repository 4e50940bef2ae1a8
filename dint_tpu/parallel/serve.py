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
) -> Tuple[np.ndarray, np.ndarray]:
    """Split per-query (docid, score) rows into doc-range shards.

    Returns (d (S, Q, P) i32, s (S, Q, P) f32), PAD padded, where shard
    j owns docids in [j*ceil(num_docs/S), (j+1)*ceil(...)).
    """
    S = n_shards
    span = -(-max(num_docs, 1) // S)
    Q = len(drows)
    per = [[None] * Q for _ in range(S)]
    width = 1
    for q in range(Q):
        d = np.asarray(drows[q], np.int64)
        s = np.asarray(srows[q], np.float32)
        shard_of = np.minimum(d // span, S - 1)
        for j in range(S):
            m = shard_of == j
            per[j][q] = (d[m].astype(np.int32), s[m])
            width = max(width, int(m.sum()))
    P = 1 << max(int(np.ceil(np.log2(width))), 3)
    dd = np.full((S, Q, P), PAD_DOC, np.int32)
    ss = np.zeros((S, Q, P), np.float32)
    for j in range(S):
        for q in range(Q):
            d, s = per[j][q]
            dd[j, q, : d.shape[0]] = d
            ss[j, q, : s.shape[0]] = s
    return dd, ss


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
        from ..query import bmw

        drows, srows, _ = bmw.build_pruned_rows(
            decoder.lazy_cache, index, wdata, queries, k
        )
    else:
        drows, srows = device_batch.build_ranked_rows(
            index, decoder, wdata, queries
        )
    S = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    dd, ss = shard_rows_by_doc(drows, srows, S, index.num_docs)
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
