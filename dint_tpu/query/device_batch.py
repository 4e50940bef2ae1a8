"""Device-batched query execution — sort-merge set algebra on TPU.

TPU-native re-design of the reference's per-query enumerator loops
(queries.hpp:34-573): a whole batch of queries executes as a handful of
device dispatches over dense padded arrays (queries group into
power-of-4 size buckets so one monster union cannot inflate the whole
batch's padding).  Measured primitive rates on this
stack (salted, fetch-forced): XLA dynamic gathers and searchsorted are
unusable (~2.6 M searches/s), while lax.sort runs at ~134 M elems/s and
top_k at ~125 M elems/s — so every merge is expressed as
sort + segmented scan + top_k, all dense VPU work with NO gathers:

* ranked_or / wand / maxscore: concatenate each query's (docid, partial
  BM25 score) postings, sort by docid, segmented-sum scores within equal
  docid runs (Hillis-Steele segmented scan, log2(P) shifted adds), then
  top_k over run ends.  Exact same top-k as the host oracle (float
  summation order differs — tree vs sequential — within the 0.1%
  tolerance the reference's own acceptance test uses,
  test_ranked_queries.cpp:43-55).
* and / or counts: same sort, runs of length == num_terms (AND) or
  run-end count (OR).  Exact integer results.

Scores are computed on device from (freq, norm_len) pairs with the
bm25.hpp:7-25 formulas; the host only decodes postings (device decode
via the serving-image engine) and pads the batch.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import ranked as ranked_mod

PAD_DOC = np.int32(2**31 - 1)


def _check_docid_range(docs) -> None:
    """Docids are sorted as int32 with PAD_DOC = 2^31-1 as the padding
    sentinel; a docid >= 2^31-1 would wrap negative (mis-sort) or
    collide with the pad.  Reject such collections up front instead of
    silently corrupting results."""
    for t, d in docs.items():
        if d.size and int(d[-1]) >= int(PAD_DOC):
            raise ValueError(
                f"device batch engine requires docids < 2^31-1; term {t} "
                f"has docid {int(d[-1])}"
            )


def _next_pow2(x: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 5)


# ---------------------------------------------------------------------------
# Device kernels (jitted per padded shape, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _kernels():
    import jax
    import jax.numpy as jnp

    def seg_scan(x, start):
        """Segmented inclusive scan along the last axis.

        x (Q, P) values, start (Q, P) bool segment-start flags; returns
        per-position inclusive sums that reset at segment starts.
        """
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

    def sort_rows(d, *vals):
        return jax.lax.sort([d, *vals], num_keys=1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def ranked_union_topk(d, s, *, k: int):
        """d (Q, P) i32 docids (PAD_DOC padded), s (Q, P) f32 partial
        scores; per-docid score sums; returns (top-k scores desc,
        top-k docids) per query."""
        d, s = sort_rows(d, s)
        start = jnp.concatenate(
            [jnp.ones_like(d[:, :1], bool), d[:, 1:] != d[:, :-1]], axis=1
        )
        sums = seg_scan(s, start)
        end = jnp.concatenate(
            [d[:, :-1] != d[:, 1:], jnp.ones_like(d[:, :1], bool)], axis=1
        )
        valid = d != PAD_DOC
        cand = jnp.where(end & valid, sums, -jnp.inf)
        top, idx = jax.lax.top_k(cand, k)
        top_docs = jnp.take_along_axis(d, idx, axis=1)
        return top, top_docs

    @jax.jit
    def boolean_counts(d, nterms):
        """d (Q, P) i32 sorted-per-term concatenated docids; nterms (Q,)
        i32.  Returns (and_count, or_count) per query: runs of length
        == nterms are intersection members; every run is a union
        member."""
        (d,) = sort_rows(d)
        start = jnp.concatenate(
            [jnp.ones_like(d[:, :1], bool), d[:, 1:] != d[:, :-1]], axis=1
        )
        ones = jnp.ones(d.shape, jnp.float32)
        runlen = seg_scan(ones, start)
        end = jnp.concatenate(
            [d[:, :-1] != d[:, 1:], jnp.ones_like(d[:, :1], bool)], axis=1
        )
        valid = d != PAD_DOC
        is_end = end & valid
        and_c = jnp.sum(
            is_end & (runlen.astype(jnp.int32) == nterms[:, None]), axis=1
        )
        or_c = jnp.sum(is_end, axis=1)
        return and_c, or_c

    @jax.jit
    def and_members(d, nterms):
        """Sorted docids with intersection membership mask (for result
        extraction / parity checks)."""
        (d,) = sort_rows(d)
        start = jnp.concatenate(
            [jnp.ones_like(d[:, :1], bool), d[:, 1:] != d[:, :-1]], axis=1
        )
        ones = jnp.ones(d.shape, jnp.float32)
        runlen = seg_scan(ones, start)
        end = jnp.concatenate(
            [d[:, :-1] != d[:, 1:], jnp.ones_like(d[:, :1], bool)], axis=1
        )
        valid = d != PAD_DOC
        mask = end & valid & (runlen.astype(jnp.int32) == nterms[:, None])
        return d, mask

    return ranked_union_topk, boolean_counts, and_members


# ---------------------------------------------------------------------------
# Host-side batch assembly
# ---------------------------------------------------------------------------


def pad_batch(rows: List[np.ndarray], pad_val, dtype) -> np.ndarray:
    P = _next_pow2(max((r.shape[0] for r in rows), default=1))
    out = np.full((len(rows), P), pad_val, dtype=dtype)
    for i, r in enumerate(rows):
        out[i, : r.shape[0]] = r
    return out


def bucket_queries(lengths: Sequence[int]) -> Dict[int, List[int]]:
    """Group query indices by padded posting count (powers of 4, so at
    most 4x padding waste and a handful of compiled shapes) — one long
    query must not inflate the whole batch's padded width."""
    buckets: Dict[int, List[int]] = {}
    for i, ln in enumerate(lengths):
        p = 1 << max(int(np.ceil(np.log2(max(ln, 1)))), 5)
        if (p.bit_length() - 1) % 2:
            p <<= 1  # powers of 4
        buckets.setdefault(p, []).append(i)
    return buckets


def build_ranked_rows(
    index,
    decoder,
    wdata,
    queries: Sequence[Sequence[int]],
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Per-query (docids i32, scores f32) union posting rows.

    Scores are the per-(term, doc) BM25 partials (query weight x doc
    term weight) — the same quantities the reference computes inside
    its enumerator loops (queries.hpp:262-276)."""
    all_terms = sorted({int(t) for q in queries for t in q})
    docs = decoder.decode_docids(all_terms)
    freqs = decoder.decode_freqs(all_terms)
    _check_docid_range(docs)
    drows, srows = [], []
    for q in queries:
        weighted = ranked_mod._query_weights(index, q)
        if not weighted:
            drows.append(np.zeros(0, np.int32))
            srows.append(np.zeros(0, np.float32))
            continue
        dr = np.concatenate([docs[t] for t, _ in weighted])
        sr = np.concatenate(
            [
                np.float32(qw)
                * ranked_mod.doc_term_weight(
                    freqs[t], wdata.norm_lens[docs[t].astype(np.int64)]
                )
                for t, qw in weighted
            ]
        )
        drows.append(dr.astype(np.int32))
        srows.append(sr.astype(np.float32))
    return drows, srows


def build_boolean_rows(
    decoder, queries: Sequence[Sequence[int]]
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Per-query concatenated docid rows + nterms for AND/OR counting."""
    from .boolean import dedup_terms

    all_terms = sorted({int(t) for q in queries for t in q})
    docs = decoder.decode_docids(all_terms)
    _check_docid_range(docs)
    drows, nterms = [], []
    for q in queries:
        terms = dedup_terms(q)
        if terms:
            drows.append(
                np.concatenate([docs[t] for t in terms]).astype(np.int32)
            )
        else:
            drows.append(np.zeros(0, np.int32))
        nterms.append(len(terms))
    return drows, np.asarray(nterms, np.int32)


# ---------------------------------------------------------------------------
# Public batched entry points
# ---------------------------------------------------------------------------


def ranked_or_batch(
    index, decoder, wdata, queries: Sequence[Sequence[int]], k: int = 10
) -> List[np.ndarray]:
    """Top-k scores (descending) per query — one device dispatch per
    size bucket; identical results to ranked.ranked_or within float
    summation-order tolerance."""
    import jax.numpy as jnp

    ranked_union_topk, _, _ = _kernels()
    drows, srows = build_ranked_rows(index, decoder, wdata, queries)
    out: List[np.ndarray] = [None] * len(queries)
    for P, idxs in sorted(bucket_queries([len(r) for r in drows]).items()):
        d = pad_batch([drows[i] for i in idxs], PAD_DOC, np.int32)
        s = pad_batch([srows[i] for i in idxs], 0.0, np.float32)
        top, _ = ranked_union_topk(jnp.asarray(d), jnp.asarray(s), k=k)
        top = np.asarray(top)
        for row, i in zip(top, idxs):
            out[i] = row[np.isfinite(row)].astype(np.float32)
    return out


def boolean_count_batch(
    decoder, queries: Sequence[Sequence[int]], op: str
) -> np.ndarray:
    """AND or OR result-set sizes per query, one dispatch per bucket."""
    import jax.numpy as jnp

    _, boolean_counts, _ = _kernels()
    drows, nterms = build_boolean_rows(decoder, queries)
    res = np.zeros(len(queries), np.int64)
    for P, idxs in sorted(bucket_queries([len(r) for r in drows]).items()):
        d = pad_batch([drows[i] for i in idxs], PAD_DOC, np.int32)
        and_c, or_c = boolean_counts(jnp.asarray(d), jnp.asarray(nterms[idxs]))
        res[idxs] = np.asarray(and_c if op == "and" else or_c)
    return res


def and_results_batch(
    decoder, queries: Sequence[Sequence[int]]
) -> List[np.ndarray]:
    """Exact AND result docid arrays per query (device merge, host
    compaction of the membership mask)."""
    import jax.numpy as jnp

    _, _, and_members = _kernels()
    drows, nterms = build_boolean_rows(decoder, queries)
    out: List[np.ndarray] = [None] * len(queries)
    for P, idxs in sorted(bucket_queries([len(r) for r in drows]).items()):
        d = pad_batch([drows[i] for i in idxs], PAD_DOC, np.int32)
        ds, mask = and_members(jnp.asarray(d), jnp.asarray(nterms[idxs]))
        ds, mask = np.asarray(ds), np.asarray(mask)
        for j, i in enumerate(idxs):
            out[i] = ds[j][mask[j]].astype(np.uint32)
    return out
