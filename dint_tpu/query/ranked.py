"""Ranked retrieval: BM25 scoring, wand_data, top-k queries.

BM25 constants and formulas match bm25.hpp:7-25 exactly (k1=1.2, b=0.5,
idf floored at 1e-6, query weight scaled by (1+k1)); wand_data matches
wand_data.hpp:17-53 (lengths normalized by the average, per-term max
doc_term_weight).

Query algorithms: `ranked_or` is the exhaustive union scorer — the
oracle the reference's own tests compare WAND/maxscore against
(test_ranked_queries.cpp:43-55).  `wand` and `maxscore` currently
delegate to the exhaustive scorer: on TPU the dense batched union
scoring of decoded lists replaces branchy pivoting, and by construction
the top-k is identical to ranked_or (the reference's acceptance
criterion).  Block-max upper-bound pruning (the batched analogue of the
pivot test at queries.hpp:241-253) is a planned optimization on top.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..index.dint_index import DintIndex
from ..io.collection import open_freq_collection, read_sizes_file
from .term_decode import TermDecoder

K1 = 1.2
B = 0.5
EPS_SCORE = 1e-6


def doc_term_weight(freq: np.ndarray, norm_len: np.ndarray) -> np.ndarray:
    f = freq.astype(np.float32)
    return f / (f + np.float32(K1) * (1.0 - B + B * norm_len.astype(np.float32)))


def query_term_weight(qf: int, df: int, num_docs: int) -> float:
    idf = np.log((float(num_docs) - df + 0.5) / (df + 0.5))
    return float(qf) * max(EPS_SCORE, float(idf)) * (1.0 + K1)


@dataclass
class WandData:
    """wand_data sidecar (wand_data.hpp)."""

    norm_lens: np.ndarray  # (num_docs,) f32, lengths / avg length
    max_term_weight: np.ndarray  # (num_terms,) f32

    def save(self, path: str) -> None:
        np.savez(path, norm_lens=self.norm_lens, max_term_weight=self.max_term_weight)

    @classmethod
    def load(cls, path: str) -> "WandData":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return cls(z["norm_lens"], z["max_term_weight"])


def build_wand_data(basename: str) -> WandData:
    """create_wand_data equivalent (src/create_wand_data.cpp)."""
    sizes = read_sizes_file(basename).astype(np.float64)
    norm = (sizes / sizes.mean()).astype(np.float32)
    view = open_freq_collection(basename)
    maxw = np.zeros(len(view), dtype=np.float32)
    for i, (docs, freqs) in enumerate(view):
        w = doc_term_weight(freqs, norm[docs.astype(np.int64)])
        maxw[i] = w.max() if w.shape[0] else 0.0
    return WandData(norm, maxw)


def _query_weights(
    index: DintIndex, terms: Sequence[int]
) -> List[Tuple[int, float]]:
    """(term, q_weight) pairs; duplicate query terms raise qf
    (wand_query ctor semantics, queries.hpp:209-222)."""
    qf: Dict[int, int] = {}
    for t in terms:
        qf[int(t)] = qf.get(int(t), 0) + 1
    out = []
    for t, f in sorted(qf.items()):
        df = int(index.list_n[t])
        out.append((t, query_term_weight(f, df, index.num_docs)))
    return out


def ranked_or(
    index: DintIndex,
    decoder: TermDecoder,
    wdata: WandData,
    terms: Sequence[int],
    k: int = 10,
) -> np.ndarray:
    """Exhaustive union scoring; returns top-k scores descending."""
    weighted = _query_weights(index, terms)
    if not weighted:
        return np.zeros(0, dtype=np.float32)
    tlist = [t for t, _ in weighted]
    docs = decoder.decode_docids(tlist)
    freqs = decoder.decode_freqs(tlist)
    all_docs = np.concatenate([docs[t] for t in tlist])
    all_scores = np.concatenate(
        [
            np.float32(qw)
            * doc_term_weight(freqs[t], wdata.norm_lens[docs[t].astype(np.int64)])
            for t, qw in weighted
        ]
    )
    order = np.argsort(all_docs, kind="stable")
    d = all_docs[order]
    s = all_scores[order]
    boundary = np.empty(d.shape[0], dtype=bool)
    boundary[0] = True
    boundary[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(boundary)
    sums = np.add.reduceat(s, starts)
    top = np.sort(sums)[::-1][:k]
    return top.astype(np.float32)


def wand(
    index: DintIndex,
    decoder: TermDecoder,
    wdata: WandData,
    terms: Sequence[int],
    k: int = 10,
) -> np.ndarray:
    """Top-k identical to ranked_or (exact scoring; see module docstring)."""
    return ranked_or(index, decoder, wdata, terms, k)


def maxscore(
    index: DintIndex,
    decoder: TermDecoder,
    wdata: WandData,
    terms: Sequence[int],
    k: int = 10,
) -> np.ndarray:
    return ranked_or(index, decoder, wdata, terms, k)


def ranked_and(
    index: DintIndex,
    decoder: TermDecoder,
    wdata: WandData,
    terms: Sequence[int],
    k: int = 10,
) -> np.ndarray:
    """ranked_and_query (queries.hpp:309-385): score docs in the AND set."""
    from .boolean import and_query

    weighted = _query_weights(index, terms)
    if not weighted:
        return np.zeros(0, dtype=np.float32)
    tlist = [t for t, _ in weighted]
    docs = decoder.decode_docids(tlist)
    freqs = decoder.decode_freqs(tlist)
    cand = and_query(docs, tlist)
    if cand.shape[0] == 0:
        return np.zeros(0, dtype=np.float32)
    total = np.zeros(cand.shape[0], dtype=np.float32)
    nl = wdata.norm_lens[cand.astype(np.int64)]
    for t, qw in weighted:
        pos = np.searchsorted(docs[t], cand)
        total += np.float32(qw) * doc_term_weight(freqs[t][pos], nl)
    return np.sort(total)[::-1][:k].astype(np.float32)
