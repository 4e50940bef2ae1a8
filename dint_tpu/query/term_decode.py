"""Batched decoding of index posting lists for query execution.

Gathers every needed block of the queried terms into one device decode
plan (full DINT blocks through the XLA pipeline, partial interpolative
blocks on the host), then rebuilds docIDs per block with a vectorized
prefix sum — each block is independent because block bases come from
block_maxs (dict_posting_list.hpp:284-309 semantics, batched).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..codecs import interpolative
from ..config import BLOCK_SIZE, NUM_SELECTORS
from ..index.dint_index import DintIndex
from ..kernels import decode_local


class TermDecoder:
    """Decodes docID lists (and lazily freqs) for sets of terms."""

    def __init__(self, index: DintIndex):
        self.index = index
        index.ensure_docs_end()
        self.docs_view = index.docs_dict.decode_view()
        self.freqs_view = index.freqs_dict.decode_view()
        self._doc_cache: Dict[int, np.ndarray] = {}
        self._freq_cache: Dict[int, np.ndarray] = {}
        self._lazy_cache = None

    @property
    def lazy_cache(self):
        """Skip-aware per-block decoder shared by WAND/maxscore/lazy AND
        (query/lazy_decode.py) — decodes only the blocks skips land in."""
        if self._lazy_cache is None:
            from .lazy_decode import BlockCache

            self._lazy_cache = BlockCache(self.index)
        return self._lazy_cache

    # ---- block geometry ----
    def _block_geometry(self, terms: Sequence[int]):
        idx = self.index
        rows = []  # (term, block_id, pos_in_list, size, base, start, end)
        for t in terms:
            p0, p1 = idx.list_blocks(t)
            n = int(idx.list_n[t])
            for b in range(p0, p1):
                pos = (b - p0) * BLOCK_SIZE
                size = min(BLOCK_SIZE, n - pos)
                base = int(idx.block_max[b - 1]) + 1 if b > p0 else 0
                rows.append((t, b, pos, size, base))
        return rows

    def _decode_units(
        self, starts, byte_lens, sizes, view, b_bits, ctxs, bases=None
    ) -> List[np.ndarray]:
        """Decode DINT units via the localized serving-image engine —
        the same fast path as full-stream decode (plan once per term
        batch with the native planner, one device dispatch).

        With ``bases`` (per-unit docid bases from block_maxs) the
        docid rebuild fuses into the device pass (gather + segmented
        prefix-sum, decode_local._docid_rebuild) and the returned
        arrays are docids rather than gaps."""
        arena = self.index.arena
        plan = decode_local.plan_stream(
            arena, np.asarray(starts), np.asarray(byte_lens),
            np.asarray(sizes), np.asarray(ctxs), np.asarray(b_bits), view,
        )
        engine = decode_local.LocalDecodeEngine(plan)
        if bases is not None:
            outs = engine.decode_docids_all(np.asarray(bases, np.uint32))
        else:
            outs = engine.decode_all()
        return engine.gather_units(outs, len(starts), sizes)

    def decode_docids(self, terms: Sequence[int]) -> Dict[int, np.ndarray]:
        """{term: docids} decoding every uncached term in one batch."""
        todo = [t for t in dict.fromkeys(terms) if t not in self._doc_cache]
        if todo:
            self._decode_terms(todo, docs=True)
        return {t: self._doc_cache[t] for t in dict.fromkeys(terms)}

    def decode_freqs(self, terms: Sequence[int]) -> Dict[int, np.ndarray]:
        todo = [t for t in dict.fromkeys(terms) if t not in self._freq_cache]
        if todo:
            self._decode_terms(todo, docs=False)
        return {t: self._freq_cache[t] for t in dict.fromkeys(terms)}

    def _decode_terms(self, terms: List[int], docs: bool) -> None:
        idx = self.index
        geo = self._block_geometry(terms)
        multi = idx.kind == "multi"
        # split full-DINT vs partial-interpolative
        dint_rows, part_rows = [], []
        for row in geo:
            (dint_rows if row[3] == BLOCK_SIZE else part_rows).append(row)
        values: Dict[Tuple[int, int], np.ndarray] = {}

        if dint_rows:
            starts, byte_lens, sizes, b_bits, ctxs, bases = [], [], [], [], [], []
            for t, b, pos, size, base in dint_rows:
                s = idx.block_start(b) if docs else int(idx.docs_end[b])
                e = int(idx.docs_end[b]) if docs else int(idx.block_end[b])
                if multi:
                    sc = int(idx.arena[s])
                    ctxs.append(sc % NUM_SELECTORS)
                    b_bits.append(16 if sc < NUM_SELECTORS else 8)
                    s += 1
                else:
                    ctxs.append(0)
                    b_bits.append(16)
                starts.append(s)
                byte_lens.append(e - s)
                sizes.append(size)
                bases.append(base)
            view = self.docs_view if docs else self.freqs_view
            decoded = self._decode_units(
                starts, byte_lens, sizes, view, b_bits, ctxs,
                bases=bases if docs else None,
            )
            for row, vals in zip(dint_rows, decoded):
                values[(row[0], row[1])] = vals

        if part_rows:
            # all partial (interpolative) blocks decode as ONE batch
            specs = []
            for t, b, pos, size, base in part_rows:
                if docs:
                    sum_v = int(idx.block_max[b]) - base - (size - 1)
                    specs.append((idx.block_start(b), size, sum_v))
                else:
                    specs.append(
                        (int(idx.docs_end[b]), size, interpolative.UNKNOWN_SUM)
                    )
            decoded_parts = interpolative.decode_blocks_batch(idx.arena, specs)
            for (t, b, pos, size, base), vals in zip(part_rows, decoded_parts):
                values[(t, b)] = vals

        # assemble per-term arrays (full DINT doc blocks arrive as
        # device-rebuilt docids; partial blocks rebuild here)
        partial = {(r[0], r[1]) for r in part_rows}
        for t in terms:
            p0, p1 = idx.list_blocks(t)
            parts = []
            for b in range(p0, p1):
                pos = (b - p0) * BLOCK_SIZE
                size = min(BLOCK_SIZE, int(idx.list_n[t]) - pos)
                base = int(idx.block_max[b - 1]) + 1 if b > p0 else 0
                vals = values[(t, b)]
                if docs:
                    if (t, b) in partial:
                        parts.append(
                            np.cumsum(vals.astype(np.int64) + 1) - 1 + base
                        )
                    else:
                        parts.append(vals)  # device docids
                else:
                    parts.append(vals.astype(np.int64) + 1)
            # empty posting lists (e.g. a doc shard holding none of a
            # term's postings) decode to an empty array
            arr = (
                np.concatenate(parts).astype(np.uint32)
                if parts
                else np.zeros(0, np.uint32)
            )
            if docs:
                self._doc_cache[t] = arr
            else:
                self._freq_cache[t] = arr
