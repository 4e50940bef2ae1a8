"""Localized decode engine — the fast TPU path.

At stream-load time the planner compiles the encoded stream into a
*serving image*: per-row (vidx, local table) pairs such that the whole
device decode is out[r, j] = table[r, vidx[r, j]].  The device kernel
is a Pallas VPU lane gather (jnp.take_along_axis lowers to Mosaic's
native dynamic gather along the 128-lane axis) — bandwidth-bound, no
MXU involvement: 133+ G ints/s on the 16.7M-int bench stream with
rows split into zero / packed-u16 / i32 table width classes and
multi-unit row packing (pack_plan_units).  The earlier one-hot-matmul
formulation (decode_gather_rows, 1.70 G ints/s) is kept below for
ablation and as the portable XLA expression; plain XLA gathers serve
the CPU/test path (_decode_flat_xla).

At stream-load time the planner walks each encoded unit once (host,
amortized across decode runs — the moral analogue of the reference's
mmap + warmup, vroom_env/decode.cpp:24-48 and dict_freq_index's
warmup :183-198) and compiles it into a *serving image*:

* every codeword becomes a local token; run codewords split into
  16-zero entries; inline exceptions become 1-int local entries (so the
  device kernel has NO exception branches and NO chain scan);
* tokens chop into sub-units of <= 512 tokens / <= N_OUT ints /
  <= TABLE_CLS content words;
* each sub-unit gets a local dictionary: unique entry contents
  (<= 512 of them), meta = len<<13 | offset packed u32, plus a local
  content table opened by 16 zeros (the run target, mirroring
  single_dictionary.hpp:43-56).

From the serving image, plan_to_vidx hosts the per-output-position
table index once; decode_local_rows (kept for ablation) shows how the
device could re-derive it from tokens/meta with MXU cumsums instead.

The serialized stream is untouched; bpi is measured on it.  The plan is
decode-acceleration state, reported separately (like the reference
reports dictionary MiB separately).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EXCEPTIONS, MAX_ENTRY_SIZE
from ..dictionary.dictionary import DecodeView

import os as _os

W_TOKENS = int(_os.environ.get("DINT_TPU_W_TOKENS", "128"))  # tokens
# per sub-unit row (chop budget only — FFD packing recombines
# sub-units, so the device row density is set by N_OUT, not this)
N_OUT = int(_os.environ.get("DINT_TPU_N_OUT", "256"))  # output ints
if W_TOKENS <= 0:
    raise ValueError(f"DINT_TPU_W_TOKENS must be > 0, got {W_TOKENS}")
if N_OUT <= 0 or N_OUT % 128 != 0:
    raise ValueError(
        f"DINT_TPU_N_OUT must be a positive multiple of 128 lanes, "
        f"got {N_OUT}")
# per device row (must be a multiple of 128 lanes).  256 is the
# measured optimum on the bench stream; 512 halves row count when the
# vocab budget doesn't bind (geometry A/B: scripts/gather_geometry.py)
TABLE_CLS = 256  # local content table words per row (must be <= 256:
# vidx values are stored u8, and the pallas kernel selects between
# TABLE_CLS/128 gathered 128-lane halves by the index high bits)

_LEN_SHIFT = 13
_OFF_MASK = (1 << _LEN_SHIFT) - 1


@dataclass
class LocalPlan:
    """Device-ready serving image of one encoded stream.

    Packed plans (pack_plan_units) hold MULTIPLE units per row; there
    unit_id/out_pos describe only each row's FIRST segment and the
    seg_* arrays carry the full row→unit mapping.  The device kernel is
    identical either way (out[r, j] = table[r, vidx[r, j]]); only the
    host-side unit gathering differs."""

    tokens: np.ndarray  # (R, W_TOKENS) i32 local entry ids
    meta: np.ndarray  # (R, W_TOKENS) i32 len<<13|off per local id
    table: np.ndarray  # (R, TABLE_CLS) u32 local contents
    out_n: np.ndarray  # (R,) i32 ints produced per row
    unit_id: np.ndarray  # (R,) i64 original unit of each row
    out_pos: np.ndarray  # (R,) i64 output offset of the row in its unit
    seg_row: np.ndarray = None  # (S,) i64 row of each segment (packed)
    seg_unit: np.ndarray = None  # (S,) i64 unit of each segment
    seg_pos: np.ndarray = None  # (S,) i64 output offset within the unit
    seg_off: np.ndarray = None  # (S,) i32 output offset within the row
    seg_len: np.ndarray = None  # (S,) i32 ints of the segment

    @property
    def rows(self) -> int:
        return int(self.tokens.shape[0])

    @property
    def packed(self) -> bool:
        return self.seg_row is not None

    def plan_bytes(self) -> int:
        return (
            self.tokens.nbytes + self.meta.nbytes + self.table.nbytes
            + self.out_n.nbytes
        )


# ---------------------------------------------------------------------------
# Host planner
# ---------------------------------------------------------------------------


def _parse_unit_tokens(
    arena: np.ndarray,
    start: int,
    byte_len: int,
    n: int,
    b: int,
    view: DecodeView,
    ctx: int,
) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, ...]]]:
    """Walk one unit's codeword stream; return (lens, entry_key, contents).

    lens[i] = ints emitted by codeword i; entry_key[i] = index into
    `contents`, a list of distinct content tuples for this unit.
    Runs are split into 16-zero entries; exceptions become 1-int
    entries.  Clean units (no token < EXCEPTIONS) vectorize; dirty
    units take the scalar walk (rare).
    """
    tw = b // 8
    count = byte_len // tw
    base = arena[start : start + count * tw]
    if tw == 2:
        toks = base[0::2].astype(np.int64) | (base[1::2].astype(np.int64) << 8)
    else:
        toks = base.astype(np.int64)
    lengths = view.lengths[ctx]
    offsets = view.offsets[ctx]
    table = view.table

    out_lens: List[int] = []
    out_content: List[Tuple[int, ...]] = []

    if not (toks < EXCEPTIONS).any():
        # clean: every token is a codeword
        cws = toks
        lns = lengths[cws]
        for cw, ln in zip(cws, lns):
            if ln > MAX_ENTRY_SIZE:
                full, rem = divmod(int(ln), MAX_ENTRY_SIZE)
                out_lens.extend([MAX_ENTRY_SIZE] * full)
                out_content.extend([(0,) * MAX_ENTRY_SIZE] * full)
                if rem:
                    out_lens.append(rem)
                    out_content.append((0,) * rem)
            else:
                off = int(offsets[cw])
                out_lens.append(int(ln))
                out_content.append(
                    tuple(int(x) for x in table[off : off + int(ln)])
                )
    else:
        i = 0
        produced = 0
        while produced < n:
            cw = int(toks[i])
            if cw >= EXCEPTIONS:
                ln = int(lengths[cw])
                if ln > MAX_ENTRY_SIZE:
                    full, rem = divmod(ln, MAX_ENTRY_SIZE)
                    out_lens.extend([MAX_ENTRY_SIZE] * full)
                    out_content.extend([(0,) * MAX_ENTRY_SIZE] * full)
                    if rem:
                        out_lens.append(rem)
                        out_content.append((0,) * rem)
                else:
                    off = int(offsets[cw])
                    out_lens.append(ln)
                    out_content.append(
                        tuple(int(x) for x in table[off : off + ln])
                    )
                produced += ln
                i += 1
            elif cw == 1:  # 4-byte exception
                if tw == 2:
                    v = int(toks[i + 1]) | (int(toks[i + 2]) << 16)
                    i += 3
                else:
                    v = (
                        int(toks[i + 1])
                        | (int(toks[i + 2]) << 8)
                        | (int(toks[i + 3]) << 16)
                        | (int(toks[i + 4]) << 24)
                    )
                    i += 5
                out_lens.append(1)
                out_content.append((v,))
                produced += 1
            else:  # 2-byte exception
                if tw == 2:
                    v = int(toks[i + 1])
                    i += 2
                else:
                    v = int(toks[i + 1]) | (int(toks[i + 2]) << 8)
                    i += 3
                out_lens.append(1)
                out_content.append((v,))
                produced += 1
    assert sum(out_lens) == n, (sum(out_lens), n)
    return out_lens, out_content


def plan_stream(
    arena: np.ndarray,
    starts: Sequence[int],
    byte_lens: Sequence[int],
    ns: Sequence[int],
    ctxs: Sequence[int],
    b_bits: Sequence[int],
    view: DecodeView,
    prefer_native: bool = True,
    pack_units: bool = False,
) -> LocalPlan:
    """Compile all units into the local serving image.

    Prefers the native C++ planner (bit-identical plans, ~50x faster on
    large streams); falls back to the pure-Python walk below.
    ``pack_units`` runs the multi-unit row-merging pass afterwards
    (pack_plan_units) — use it for whole-stream decode; the index query
    path keeps per-unit rows because the fused docid rebuild
    (decode_docids_all) needs one base per row.
    """
    plan = None
    if prefer_native:
        from . import planner_native

        res = planner_native.plan_stream_native(
            arena, starts, byte_lens, ns, ctxs, b_bits, view,
            W_TOKENS, N_OUT, TABLE_CLS,
        )
        if res is not None:
            plan = LocalPlan(*res)
    if plan is None:
        plan = _plan_stream_py(
            arena, starts, byte_lens, ns, ctxs, b_bits, view
        )
    if pack_units:
        plan = pack_plan_units(plan)
    return plan


def _plan_stream_py(
    arena: np.ndarray,
    starts: Sequence[int],
    byte_lens: Sequence[int],
    ns: Sequence[int],
    ctxs: Sequence[int],
    b_bits: Sequence[int],
    view: DecodeView,
) -> LocalPlan:
    """Pure-Python reference planner (the oracle the native one mirrors)."""
    rows_tokens: List[np.ndarray] = []
    rows_meta: List[np.ndarray] = []
    rows_table: List[np.ndarray] = []
    rows_n: List[int] = []
    rows_unit: List[int] = []
    rows_pos: List[int] = []

    for u in range(len(starts)):
        lens, contents = _parse_unit_tokens(
            arena,
            int(starts[u]),
            int(byte_lens[u]),
            int(ns[u]),
            int(b_bits[u]),
            view,
            int(ctxs[u]),
        )
        # chop into sub-units under the three budgets
        i = 0
        out_pos = 0
        T = len(lens)
        while i < T:
            j = i
            outs = 0
            vocab: Dict[Tuple[int, ...], int] = {}
            words = MAX_ENTRY_SIZE  # leading zero region
            tok_ids: List[int] = []
            # greedy extend (token budget is implied by outs <= N_OUT
            # since every local token emits >= 1 int)
            while j < T and (j - i) < W_TOKENS and outs + lens[j] <= N_OUT:
                c = contents[j]
                if c not in vocab:
                    if all(x == 0 for x in c):
                        # zeros live in the shared leading region
                        extra = 0
                    else:
                        extra = len(c)
                    if words + extra > TABLE_CLS:
                        break
                    vocab[c] = -1  # placeholder
                    words += extra
                outs += lens[j]
                tok_ids.append(j)
                j += 1
            assert j > i, "single codeword exceeds budgets"
            # build local dict: order vocab by frequency desc
            freq: Dict[Tuple[int, ...], int] = {}
            for t in tok_ids:
                freq[contents[t]] = freq.get(contents[t], 0) + 1
            ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
            meta = np.zeros(W_TOKENS, dtype=np.int32)
            tab = np.zeros(TABLE_CLS, dtype=np.uint32)
            pos = MAX_ENTRY_SIZE
            local_id: Dict[Tuple[int, ...], int] = {}
            for vi, (c, _) in enumerate(ordered):
                local_id[c] = vi
                if all(x == 0 for x in c):
                    off = 0
                else:
                    off = pos
                    tab[pos : pos + len(c)] = c
                    pos += len(c)
                meta[vi] = np.int32((len(c) << _LEN_SHIFT) | off)
            toks = np.full(W_TOKENS, len(ordered), dtype=np.int32)
            toks[: j - i] = [local_id[contents[t]] for t in tok_ids]
            # padding id has meta 0 (len 0)
            rows_tokens.append(toks)
            rows_meta.append(meta)
            rows_table.append(tab)
            rows_n.append(outs)
            rows_unit.append(u)
            rows_pos.append(out_pos)
            out_pos += outs
            i = j

    return LocalPlan(
        np.stack(rows_tokens),
        np.stack(rows_meta),
        np.stack(rows_table),
        np.asarray(rows_n, np.int32),
        np.asarray(rows_unit, np.int64),
        np.asarray(rows_pos, np.int64),
    )


def pack_plan_units(plan: LocalPlan) -> LocalPlan:
    """Merge consecutive rows into multi-unit rows (the occupancy pass).

    Per-unit planning leaves every unit's last row partially filled
    (measured: 25% of slots on the bench stream for whole-list single
    units, 54% wasted slot-share for 256-int multi units) and the
    engine is ROW-bound (~3 ns/row, HBM speed of light), so decode
    throughput is proportional to ints/row.  This pass greedily merges
    runs of consecutive rows while three budgets hold — combined tokens
    <= W_TOKENS-1 (the padding id needs a meta slot), combined outputs
    <= N_OUT, combined content words <= TABLE_CLS (each row's 16-word
    leading zero region is shared) — and records a per-row SEGMENT map
    so gather_units can split merged outputs back into units.  Local
    vocabularies are concatenated without cross-row dedup (a bound, not
    a correctness issue).  The device kernel is untouched.

    Bench stream effect: single rows 75,677 -> ~65K (x1.16), multi
    89,520 -> ~67K (x1.33); both verified int-exact vs the source
    collection."""
    R = plan.rows
    if R == 0:
        return plan
    mlens = (np.take_along_axis(plan.meta, plan.tokens, axis=1)
             >> _LEN_SHIFT)
    tcount = (mlens > 0).sum(axis=1).astype(np.int64)
    vcount = ((plan.meta >> _LEN_SHIFT) > 0).sum(axis=1).astype(np.int64)
    offs = (plan.meta & _OFF_MASK).astype(np.int64)
    lens = (plan.meta >> _LEN_SHIFT).astype(np.int64)
    words = np.maximum((offs + lens).max(axis=1), MAX_ENTRY_SIZE)
    out_n = plan.out_n.astype(np.int64)
    is16 = plan.table.max(axis=1) < (1 << 16)

    # ---- first-fit-decreasing bin packing, per table-width class ----
    # (row order is free: the engine permutes rows into width classes
    # anyway and the segment map carries unit identity; packing within
    # a class keeps u16 tables u16)
    MAX_OPEN = 48  # bounded open-bin scan keeps FFD near-linear
    bins: List[List[int]] = []  # row ids per merged row
    bin_state: List[Tuple[int, int, int]] = []  # (outs, words-16 sum, toks)
    for cls in (True, False):
        rows_c = np.flatnonzero(is16 == cls)
        if rows_c.shape[0] == 0:
            continue
        order = rows_c[np.argsort(-out_n[rows_c], kind="stable")]
        open_bins: List[int] = []
        for r in order:
            o = int(out_n[r])
            w = int(words[r]) - MAX_ENTRY_SIZE
            t = int(tcount[r])
            placed = -1
            for bi in open_bins:
                bo, bw, bt = bin_state[bi]
                if bo + o <= N_OUT and bw + w <= TABLE_CLS - MAX_ENTRY_SIZE \
                        and bt + t <= W_TOKENS - 1:
                    placed = bi
                    break
            if placed < 0:
                placed = len(bins)
                bins.append([])
                bin_state.append((0, 0, 0))
                open_bins.append(placed)
            bins[placed].append(int(r))
            bo, bw, bt = bin_state[placed]
            bin_state[placed] = (bo + o, bw + w, bt + t)
            if bin_state[placed][0] > N_OUT - 8:
                open_bins.remove(placed)
            elif len(open_bins) > MAX_OPEN:
                open_bins.pop(0)

    new_tokens: List[np.ndarray] = []
    new_meta: List[np.ndarray] = []
    new_table: List[np.ndarray] = []
    new_n: List[int] = []
    seg_row: List[int] = []
    seg_unit: List[int] = []
    seg_pos: List[int] = []
    seg_off: List[int] = []
    seg_len: List[int] = []
    first_unit: List[int] = []
    first_pos: List[int] = []

    for group in bins:
        group.sort()  # stream order within the merged row
        r0 = group[0]
        cur_tok = plan.tokens[r0].copy()
        cur_meta = plan.meta[r0].copy()
        cur_tab = plan.table[r0].copy()
        cur_outs = int(out_n[r0])
        cur_words = int(words[r0])
        cur_t = int(tcount[r0])
        cur_v = int(vcount[r0])
        rid = len(new_n)
        seg_row.append(rid)
        seg_unit.append(int(plan.unit_id[r0]))
        seg_pos.append(int(plan.out_pos[r0]))
        seg_off.append(0)
        seg_len.append(cur_outs)
        for r in group[1:]:
            t, v, w, o = (
                int(tcount[r]), int(vcount[r]), int(words[r]),
                int(out_n[r]),
            )
            shift = cur_words - MAX_ENTRY_SIZE
            m = plan.meta[r, :v].astype(np.int64)
            m_off = m & _OFF_MASK
            m_len = m >> _LEN_SHIFT
            new_off = np.where(m_off == 0, 0, m_off + shift)
            cur_meta[cur_v : cur_v + v] = (
                (m_len << _LEN_SHIFT) | new_off
            ).astype(np.int32)
            cur_tok[cur_t : cur_t + t] = plan.tokens[r, :t] + cur_v
            pad_id = cur_v + v
            cur_tok[cur_t + t :] = pad_id
            cur_tab[cur_words : cur_words + (w - MAX_ENTRY_SIZE)] = (
                plan.table[r, MAX_ENTRY_SIZE : w]
            )
            seg_row.append(rid)
            seg_unit.append(int(plan.unit_id[r]))
            seg_pos.append(int(plan.out_pos[r]))
            seg_off.append(cur_outs)
            seg_len.append(o)
            cur_outs += o
            cur_words += w - MAX_ENTRY_SIZE
            cur_t += t
            cur_v += v
        new_tokens.append(cur_tok)
        new_meta.append(cur_meta)
        new_table.append(cur_tab)
        new_n.append(cur_outs)
        first_unit.append(seg_unit[-len(group)])
        first_pos.append(seg_pos[-len(group)])

    return LocalPlan(
        np.stack(new_tokens),
        np.stack(new_meta),
        np.stack(new_table),
        np.asarray(new_n, np.int32),
        np.asarray(first_unit, np.int64),
        np.asarray(first_pos, np.int64),
        np.asarray(seg_row, np.int64),
        np.asarray(seg_unit, np.int64),
        np.asarray(seg_pos, np.int64),
        np.asarray(seg_off, np.int32),
        np.asarray(seg_len, np.int32),
    )


PLAN_VERSION = 3  # v3: v2 + optional multi-unit packed rows (seg_* map)
IMAGE_VERSION = 1  # engine-ready class-array image (native plan2)


@dataclass
class DecodeImage:
    """Engine-ready serving image: the final per-width-class device
    arrays, produced directly by the native streaming planner
    (native/dint_planner.cpp plan2) without whole-stream intermediates.

    Replaces LocalPlan + pack_plan_units + plan_to_vidx + the engine's
    class split for whole-stream decode: the old pipeline peaked at
    ~88 transient bytes/int (79.7 GiB at 908M ints); building this
    image is O(shard) scratch + O(image) output."""

    n0: np.ndarray  # (R0,) i32 — write-only zero-table rows
    vidx16: np.ndarray  # (R16, N_OUT) u8
    tab16: np.ndarray  # (R16, TABLE_CLS//2) u32 — 2 u16 entries/lane
    n16: np.ndarray  # (R16,) i32
    vidx32: np.ndarray  # (R32, N_OUT) u8
    tab32: np.ndarray  # (R32, TABLE_CLS) u32
    n32: np.ndarray  # (R32,) i32
    seg_cls: np.ndarray  # (S,) u8 in {0, 16, 32}
    seg_row: np.ndarray  # (S,) i64 row WITHIN its class
    seg_off: np.ndarray  # (S,) i32 output offset within the row
    seg_len: np.ndarray  # (S,) i32
    seg_unit: np.ndarray  # (S,) i64 global unit id
    seg_pos: np.ndarray  # (S,) i64 output offset within the unit

    def device_bytes(self) -> int:
        return (
            self.n0.nbytes + self.vidx16.nbytes + self.tab16.nbytes
            + self.n16.nbytes + self.vidx32.nbytes + self.tab32.nbytes
            + self.n32.nbytes
        )

    def total_ints(self) -> int:
        return int(
            self.n0.astype(np.int64).sum()
            + self.n16.astype(np.int64).sum()
            + self.n32.astype(np.int64).sum()
        )


def plan_stream_image(
    arena: np.ndarray,
    starts: Sequence[int],
    byte_lens: Sequence[int],
    ns: Sequence[int],
    ctxs: Sequence[int],
    b_bits: Sequence[int],
    view: DecodeView,
    shard_ints: int = 32_000_000,
    threads: int = None,
) -> "DecodeImage | None":
    """Streaming image build: units are planned in shards bounded by
    ~shard_ints output ints each (native plan2 per shard: chop + FFD
    pack + direct vidx + class split), DS2I_THREADS shards in flight
    (ctypes releases the GIL; each shard owns a private handle), and
    the shard outputs concatenate into the final image.  Returns None
    when the native toolchain is unavailable (callers fall back to the
    LocalPlan pipeline)."""
    import os as _os

    from . import planner_native

    if planner_native.get_lib() is None:
        return None
    if threads is None:
        threads = max(1, int(_os.environ.get("DS2I_THREADS", "1")))
    starts = np.ascontiguousarray(starts, np.int64)
    byte_lens = np.ascontiguousarray(byte_lens, np.int64)
    ns = np.ascontiguousarray(ns, np.int32)
    ctxs = np.ascontiguousarray(ctxs, np.int32)
    b_bits = np.ascontiguousarray(b_bits, np.int32)
    U = starts.shape[0]
    # shard boundaries on cumulative output ints
    cuts = [0]
    acc = 0
    for u in range(U):
        acc += int(ns[u])
        if acc >= shard_ints:
            cuts.append(u + 1)
            acc = 0
    if cuts[-1] != U:
        cuts.append(U)
    shards = [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]

    def run_shard(a_b):
        a, b = a_b
        return planner_native.plan_shard_image(
            arena, starts[a:b], byte_lens[a:b], ns[a:b], ctxs[a:b],
            b_bits[a:b], a, view, W_TOKENS, N_OUT, TABLE_CLS,
        )

    if threads > 1 and len(shards) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(run_shard, shards))
    else:
        parts = [run_shard(s) for s in shards]
    if any(p is None for p in parts):
        return None
    # concatenate; seg_row offsets by per-class row bases
    b0 = b16 = b32 = 0
    seg_rows = []
    for p in parts:
        sr = p["seg_row"].copy()
        sr[p["seg_cls"] == 0] += b0
        sr[p["seg_cls"] == 16] += b16
        sr[p["seg_cls"] == 32] += b32
        seg_rows.append(sr)
        b0 += p["n0"].shape[0]
        b16 += p["n16"].shape[0]
        b32 += p["n32"].shape[0]

    def cat(key):
        return np.concatenate([p[key] for p in parts])

    return DecodeImage(
        n0=cat("n0"),
        vidx16=cat("vidx16"), tab16=cat("tab16"), n16=cat("n16"),
        vidx32=cat("vidx32"), tab32=cat("tab32"), n32=cat("n32"),
        seg_cls=cat("seg_cls"), seg_row=np.concatenate(seg_rows),
        seg_off=cat("seg_off"), seg_len=cat("seg_len"),
        seg_unit=cat("seg_unit"), seg_pos=cat("seg_pos"),
    )


def save_image(img: DecodeImage, path: str) -> None:
    np.savez(
        path,
        image_version=np.asarray([IMAGE_VERSION, W_TOKENS, N_OUT, TABLE_CLS]),
        **{f.name: getattr(img, f.name) for f in
           __import__("dataclasses").fields(DecodeImage)},
    )


def load_image(path: str):
    try:
        z = np.load(path)
        if "image_version" not in z:
            return None
        if list(z["image_version"]) != [
            IMAGE_VERSION, W_TOKENS, N_OUT, TABLE_CLS
        ]:
            return None
        return DecodeImage(
            **{f.name: z[f.name] for f in
               __import__("dataclasses").fields(DecodeImage)}
        )
    except Exception:
        return None


def plan_to_vidx(plan: LocalPlan) -> np.ndarray:
    """Per-output-position table indices, hosted once at load.

    The serving plan fully determines which local-table word every
    output position reads: vidx[r, j] = off(tok_j) + j - start(tok_j).
    Hosting this turns the device decode into a pure table gather (one
    int8 one-hot matmul) — the cumsum/band/attrs stages the device
    kernel would otherwise re-derive every run are measured pure
    overhead (scripts/kernel_ablate.py v9 vs v0).
    """
    meta_pos = np.take_along_axis(plan.meta, plan.tokens, axis=1).astype(
        np.int64
    )
    lens = meta_pos >> _LEN_SHIFT
    offs = meta_pos & _OFF_MASK
    ends = np.cumsum(lens, axis=1)
    starts = ends - lens
    R = lens.shape[0]
    n = plan.out_n.astype(np.int64)
    flat_lens = lens.ravel()
    rep_off = np.repeat(offs.ravel(), flat_lens)
    rep_start = np.repeat(starts.ravel(), flat_lens)
    total = int(n.sum())
    row_base = np.concatenate([[0], np.cumsum(n)[:-1]])
    j_flat = np.arange(total, dtype=np.int64) - np.repeat(row_base, n)
    vidx = np.zeros((R, N_OUT), np.int32)
    rows_flat = np.repeat(np.arange(R, dtype=np.int64), n)
    vidx[rows_flat, j_flat] = rep_off + j_flat - rep_start
    return vidx


def save_plan(plan: LocalPlan, path: str) -> None:
    extra = {}
    if plan.packed:
        extra = dict(
            seg_row=plan.seg_row, seg_unit=plan.seg_unit,
            seg_pos=plan.seg_pos, seg_off=plan.seg_off,
            seg_len=plan.seg_len,
        )
    np.savez(
        path,
        version=np.asarray([PLAN_VERSION, W_TOKENS, N_OUT, TABLE_CLS]),
        tokens=plan.tokens,
        meta=plan.meta,
        table=plan.table,
        out_n=plan.out_n,
        unit_id=plan.unit_id,
        out_pos=plan.out_pos,
        **extra,
    )


def load_plan(path: str):
    try:
        z = np.load(path)
        if list(z["version"]) != [PLAN_VERSION, W_TOKENS, N_OUT, TABLE_CLS]:
            return None
        segs = (
            (z["seg_row"], z["seg_unit"], z["seg_pos"], z["seg_off"],
             z["seg_len"])
            if "seg_row" in z
            else (None,) * 5
        )
        return LocalPlan(
            z["tokens"], z["meta"], z["table"], z["out_n"], z["unit_id"],
            z["out_pos"], *segs,
        )
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------


def _oh_dtype():
    # bf16 feeds the MXU on TPU; CPU (tests) lacks fast bf16 — use f32
    # (both are exact for 0/1 one-hots and u8 planes).
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _onehot_dot(idx: jnp.ndarray, planes: jnp.ndarray) -> jnp.ndarray:
    """out[r, q, v] = planes[r, idx[r, q], v] via one-hot x planes matmul.

    idx (R, Q) in [0, D); planes (R, D, V) with integer values <= 255.
    The MXU is the only fast data-dependent-access path on this stack,
    so the gather is a 0/1 matrix times the planes.  Two measured
    choices (scripts/kernel_ablate.py, TPU v5e):

    * TRANSPOSED contraction (V,D)@(D,Q): V is tiny (3-4), so in the
      rqd,rdv->rqv orientation it pads to the 128-wide lane dimension
      (32x waste); transposed it pads only to the sublane tile
      (16/32) — measured 1.8x whole-kernel speedup.
    * int8 operands: one-hots are 0/1 and planes are u8; biasing planes
      by -128 keeps them in int8 and the one-hot's single 1 per column
      adds the bias back exactly.  int8 halves one-hot HBM bytes and
      doubles MXU rate vs bf16.

    Exact: integer matmul with int32 accumulation.
    """
    D = planes.shape[1]
    iota = jnp.arange(D, dtype=jnp.int32)[None, :, None]
    A_T = (idx[:, None, :] == iota).astype(jnp.int8)  # (R, D, Q)
    P_T = (planes.swapaxes(1, 2) - 128).astype(jnp.int8)  # (R, V, D)
    out = jax.lax.dot_general(
        P_T, A_T, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    ) + 128  # each one-hot column sums to 1
    return out.swapaxes(1, 2).astype(jnp.float32)  # (R, Q, V)


def _onehot_hist(bins: jnp.ndarray, weights: jnp.ndarray, D: int) -> jnp.ndarray:
    """c[r, d] = sum_q weights[r, q] * [bins[r, q] == d] (MXU histogram)."""
    dt = _oh_dtype()
    A = jax.nn.one_hot(bins, D, dtype=dt)
    return jnp.einsum(
        "rqd,rq->rd",
        A,
        weights.astype(dt),
        preferred_element_type=jnp.float32,
    )


def _cumsum_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive row cumsum as an f32 matmul with a triangular ones
    matrix — VPU prefix scans are slow on this stack, the MXU is not.
    Exact for row sums < 2^24."""
    W = x.shape[-1]
    tri = jnp.tril(jnp.ones((W, W), dtype=jnp.float32)).T  # tri[j,i]=1 if j<=i
    return jnp.einsum(
        "rq,qi->ri", x.astype(jnp.float32), tri,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_out",))
def decode_local_rows(
    tokens: jnp.ndarray,  # (R, W_TOKENS) i32
    meta: jnp.ndarray,  # (R, W_TOKENS) i32
    table: jnp.ndarray,  # (R, TABLE_CLS) u32
    n: jnp.ndarray,  # (R,) i32
    salt: jnp.ndarray = None,  # scalar u32; flows through and cancels out
    *,
    n_out: int = N_OUT,
) -> jnp.ndarray:
    # `salt` defeats result memoization in measurement harnesses: it is
    # mixed into the table planes and cancelled after reconstruction, so
    # outputs are identical but every execution is distinct work.
    if salt is None:
        salt = jnp.uint32(0)
    R, W = tokens.shape

    # token metadata via one-hot matmul: planes [len, off_lo, off_hi]
    off_all = (meta & _OFF_MASK).astype(jnp.int32)
    mplanes = jnp.stack(
        [
            (meta >> _LEN_SHIFT).astype(jnp.int32),
            off_all & 255,
            off_all >> 8,
        ],
        axis=-1,
    )  # (R, W, 3), all values <= 255
    tm = _onehot_dot(tokens, mplanes)  # (R, W, 3) f32
    lens = tm[:, :, 0].astype(jnp.int32)
    offs = (tm[:, :, 1] + tm[:, :, 2] * 256.0).astype(jnp.int32)
    ends = _cumsum_mxu(lens)  # (R, W)

    # invert token->output: o_j = #tokens with end <= j, via an MXU
    # histogram of end positions + prefix sum (padding tokens have len 0
    # and must not contribute).
    w_real = (lens > 0).astype(jnp.int32)
    bins = jnp.clip(ends - 1, 0, n_out - 1)
    c = _onehot_hist(bins, w_real, n_out)  # (R, n_out)
    csum = _cumsum_mxu(c)
    o = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), csum[:, : n_out - 1]], axis=1
    )  # (R, n_out)

    # per-output token attributes: planes [start_lo, start_hi, off_lo,
    # off_hi] (starts <= 512 need two u8 planes)
    starts = ends - lens
    tplanes = jnp.stack(
        [starts & 255, starts >> 8, offs & 255, offs >> 8], axis=-1
    )  # (R, W, 4)
    o_c = jnp.minimum(o, W - 1)
    ta = _onehot_dot(o_c, tplanes)  # (R, n_out, 4)
    start_o = (ta[:, :, 0] + ta[:, :, 1] * 256.0).astype(jnp.int32)
    off_o = (ta[:, :, 2] + ta[:, :, 3] * 256.0).astype(jnp.int32)
    jpos = jnp.arange(n_out, dtype=jnp.int32)[None, :]
    k = jpos - start_o
    vidx = jnp.clip(off_o + k, 0, TABLE_CLS - 1)

    # values: four u8 planes of the u32 local table, salted
    t32 = table + salt
    vplanes = jnp.stack(
        [
            (t32 & 255).astype(jnp.int32),
            ((t32 >> 8) & 255).astype(jnp.int32),
            ((t32 >> 16) & 255).astype(jnp.int32),
            ((t32 >> 24) & 255).astype(jnp.int32),
        ],
        axis=-1,
    )  # (R, TABLE_CLS, 4)
    vv = _onehot_dot(vidx, vplanes)  # (R, n_out, 4) f32
    val = (
        vv[:, :, 0].astype(jnp.uint32)
        + (vv[:, :, 1].astype(jnp.uint32) << 8)
        + (vv[:, :, 2].astype(jnp.uint32) << 16)
        + (vv[:, :, 3].astype(jnp.uint32) << 24)
    ) - salt
    valid = jpos < n[:, None]
    return jnp.where(valid, val, 0)


def decode_gather_rows(vidx, table, n, salt):
    """out[r, j] = table[r, vidx[r, j]] for j < n[r], else 0 — the whole
    decode once vidx is hosted (plan_to_vidx).

    Implemented as a transposed int8 one-hot matmul: the gather matrix
    A_T[r, d, j] = [vidx[r,j]==d] is 0/1 int8, the table is split into
    four u8 byte planes biased into int8 (the one-hot's single 1 per
    column restores the +128 bias exactly), and the MXU contracts them
    with int32 accumulation — exact by construction and the fastest
    measured data-dependent-access form on this stack.  `salt` is mixed
    into the table words and cancelled after reconstruction (defeats
    execution memoization in timing harnesses; outputs identical).
    """
    TC = table.shape[-1]
    NO = vidx.shape[-1]
    t32 = table + salt.astype(jnp.uint32)
    planes = [
        (((t32 >> (8 * k)) & 255).astype(jnp.int32) - 128).astype(jnp.int8)
        for k in range(4)
    ]
    P_T = jnp.stack(planes, axis=1)  # (R, 4, TC)
    iota_d = jnp.arange(TC, dtype=jnp.int32)[None, :, None]
    A_T = (vidx[:, None, :] == iota_d).astype(jnp.int8)  # (R, TC, NO)
    vv = (
        jax.lax.dot_general(
            P_T, A_T, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        + 128
    )  # (R, 4, NO)
    val = (
        vv[:, 0, :].astype(jnp.uint32)
        + (vv[:, 1, :].astype(jnp.uint32) << 8)
        + (vv[:, 2, :].astype(jnp.uint32) << 16)
        + (vv[:, 3, :].astype(jnp.uint32) << 24)
    ) - salt.astype(jnp.uint32)
    jpos = jnp.arange(NO, dtype=jnp.int32)[None, :]
    return jnp.where(jpos < n[:, None], val, 0)


GATHER_ROW_TILE = 1024  # pallas grid block (rows per kernel invocation)
FORCE_SPLIT_INTERPRET = False  # tests: run the split engine in pallas
# interpret mode on CPU (exercises the width-class machinery off-TPU)


def _gather16_body(salt_ref, vidx_ref, tab_ref, n_ref, out_ref):
    """u16 width class: rows whose local-table words all fit 16 bits
    (the common case for gap contents) pack TWO table entries per i32
    lane — the packed table is 128 lanes, so ONE native lane gather
    serves the whole 256-entry table (no half select) and table HBM
    traffic halves.  val = (word >> 16*(idx&1)) & 0xffff; the salt
    wrap-adds into the OUTPUT on valid positions (cancelled by the
    caller / chain reduction), keeping timed runs distinct.
    Measured vs the i32 kernel on identical shapes: 90.2 vs 67.0
    G ints/s.

    A sum-emitting variant (second (8,128)-per-tile output feeding the
    chain salt) was built and REMOVED: the extra output stream slows
    the tile loop 116 -> 82-84 G on the packed bench stream, and the
    chain now feeds its salt from a small contiguous slice of this
    kernel's written output instead (see the chain body)."""
    rt = out_ref.shape[0]
    salt = salt_ref[0]
    tab = tab_ref[:]  # (rt, 128) i32: entry 2j | entry 2j+1 << 16
    jpos = jax.lax.broadcasted_iota(jnp.int32, (rt, 128), 1)
    nn = n_ref[:]
    for c in range(N_OUT // 128):
        idx = vidx_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32) & 255
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)
        hi = jax.lax.shift_right_logical(word, 16)
        val = (jnp.where((idx & 1) == 1, hi, word) & 0xFFFF) + salt
        valid = (jpos + c * 128) < nn
        out_ref[:, c * 128 : (c + 1) * 128] = jnp.where(valid, val, 0)


def _gather32_body(salt_ref, vidx_ref, tab_ref, n_ref, out_ref):
    """out[r, j] = (table[r, vidx[r, j]] + salt) - salt, masked by n[r].

    The decode hot loop as a pure VPU lane gather: Mosaic lowers
    jnp.take_along_axis along the 128-lane axis to a native dynamic
    gather, so the per-row table lookup costs bandwidth, not MXU MACs.
    TABLE_CLS = 256 > 128 lanes, so the table splits into two 128-lane
    halves gathered separately and selected by index bit 7.  vidx is
    stored as u8 (TABLE_CLS <= 256) to quarter its HBM traffic; the
    salt (u32 wrap-add, exactly cancelled) keeps timed runs distinct.
    First measured at 26.8 G ints/s on the 16.7M-int bench stream vs
    1.70 for the one-hot MXU formulation it replaced
    (decode_gather_rows); the shipping engine — width classes +
    multi-unit row packing around this same body — reaches 134 G
    (see the module docstring)."""
    rt = out_ref.shape[0]
    salt = salt_ref[0]
    tab = tab_ref[:] + salt  # i32 wrap-add == u32 bit arithmetic
    halves = [
        tab[:, k * 128 : (k + 1) * 128] for k in range(TABLE_CLS // 128)
    ]
    jpos = jax.lax.broadcasted_iota(jnp.int32, (rt, 128), 1)
    nn = n_ref[:]  # (rt, 1)
    for c in range(N_OUT // 128):
        idx = vidx_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32) & (
            TABLE_CLS - 1
        )
        val = jnp.take_along_axis(halves[0], jnp.minimum(idx, 127), axis=1)
        for k in range(1, len(halves)):
            in_k = (idx >> 7) == k
            gk = jnp.take_along_axis(
                halves[k], jnp.where(in_k, idx - k * 128, 0), axis=1
            )
            val = jnp.where(in_k, gk, val)
        val = val - salt
        valid = (jpos + c * 128) < nn
        out_ref[:, c * 128 : (c + 1) * 128] = jnp.where(valid, val, 0)


def _zero_body(salt_ref, n_ref, out_ref):
    """Zero width class: rows whose local table is ENTIRELY zero
    (zero-run-only units — 23% of the bench plan's rows) decode to
    all-zero outputs whatever their tokens say, so the kernel writes
    salt on valid lanes (val == 0; the caller cancels the salt) and
    reads NO table and NO vidx — the class is write-only.  On the
    bench plan this removes ~12 MB of the ~60 MB of per-run image
    reads."""
    rt = out_ref.shape[0]
    salt = salt_ref[0]
    jpos = jax.lax.broadcasted_iota(jnp.int32, (rt, N_OUT), 1)
    out_ref[...] = jnp.where(jpos < n_ref[:], salt, 0)


def _pallas_zero_kernel(salt_ref, n_ref, out_ref):
    _zero_body(salt_ref, n_ref, out_ref)


def _pallas_gather16_kernel(salt_ref, vidx_ref, tab_ref, n_ref, out_ref):
    _gather16_body(salt_ref, vidx_ref, tab_ref, n_ref, out_ref)


def _pallas_gather_kernel(salt_ref, vidx_ref, tab_ref, n_ref, out_ref):
    _gather32_body(salt_ref, vidx_ref, tab_ref, n_ref, out_ref)


@functools.lru_cache(maxsize=None)
def _pallas_decode_fns(R: int, rt: int, interpret: bool = False):
    """(decode, chain) jitted callables for a padded plan of R rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        _pallas_gather_kernel,
        grid=(R // rt,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rt, N_OUT), lambda i: (i, 0)),
            pl.BlockSpec((rt, TABLE_CLS), lambda i: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rt, N_OUT), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, N_OUT), jnp.int32),
    )

    def decode(vidx8, tab_i32, n2, salt):
        s = jax.lax.bitcast_convert_type(salt, jnp.int32)
        out = call(s[None], vidx8, tab_i32, n2)
        return jax.lax.bitcast_convert_type(out, jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("runs",))
    def chain(vidx8, tab_i32, n2, *, runs: int):
        def body(salt, _):
            outs = decode(vidx8, tab_i32, n2, salt)
            nxt = jnp.sum(outs, dtype=jnp.uint32) + salt + jnp.uint32(1)
            return nxt, None

        salt, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
        return salt

    return jax.jit(decode), chain


_CLASS_KERNELS = {
    0: (_pallas_zero_kernel, 0, True),
    16: (_pallas_gather16_kernel, TABLE_CLS // 2, True),
    32: (_pallas_gather_kernel, TABLE_CLS, False),
}
# mode -> (kernel, packed table lanes, kernel adds salt to output)

# Chain flavor crossover: plans whose total output exceeds this feed
# the next salt from a small contiguous SLICE of each class's written
# output (the whole-output re-read dominates chain traffic at scale:
# measured ~1/3 at 90.8M ints); smaller plans keep the whole-output
# reduction, which measures FASTER than the slice at bench size
# (116 vs 108 G — the big fused reduction overlaps the tile loop
# better than a tiny dependent read).  An in-kernel sum-emitting
# flavor (second per-tile output) was built and removed: the extra
# output stream cost 116 -> 82-84 G on the packed bench stream.
CHAIN_SUMS_MIN_OUT_BYTES = 128 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _pallas_split_fns(spec, rt: int, interpret: bool = False):
    """(decode, chain) for a plan split into table width classes.

    ``spec`` is a tuple of (padded_rows, mode) with mode in {0,16,32};
    zero-row classes are skipped.  decode takes one (vidx, table, n)
    triple per class + salt (mode-0 classes pass empty vidx/table) and
    returns the exact per-class outputs; chain runs every class per
    scan step in ONE dispatch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _make_call(kern, rows, lanes):
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if lanes:  # gather classes read (vidx, table); mode 0 reads neither
            in_specs += [
                pl.BlockSpec((rt, N_OUT), lambda i: (i, 0)),
                pl.BlockSpec((rt, lanes), lambda i: (i, 0)),
            ]
        in_specs.append(pl.BlockSpec((rt, 1), lambda i: (i, 0)))
        return pl.pallas_call(
            kern,
            grid=(rows // rt,),
            interpret=interpret,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rt, N_OUT), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, N_OUT), jnp.int32),
        )

    # chain flavor by total output size (see CHAIN_SUMS_MIN_OUT_BYTES)
    total_out = sum(rows for rows, _ in spec) * N_OUT * 4
    chain_sums = total_out >= CHAIN_SUMS_MIN_OUT_BYTES

    calls = []
    for rows, mode in spec:
        kern, lanes, salted = _CLASS_KERNELS[mode]
        call = _make_call(kern, rows, lanes) if rows else None
        calls.append((call, salted, mode))

    def _run(args, salt):
        s = jax.lax.bitcast_convert_type(salt, jnp.int32)
        outs = []
        for (call, salted, mode), (v, t, n) in zip(calls, args):
            if call is None:
                outs.append(None)
            elif mode == 0:
                outs.append(call(s[None], n))
            else:
                outs.append(call(s[None], v, t, n))
        return outs

    @jax.jit
    def decode(args, salt):
        raw = _run(args, salt)
        outs = []
        jpos = jnp.arange(N_OUT, dtype=jnp.int32)[None, :]
        for o, (call, salted, mode), (v, t, n) in zip(raw, calls, args):
            if o is None:
                continue
            u = jax.lax.bitcast_convert_type(o, jnp.uint32)
            if salted:  # kernel wrote val+salt on valid lanes
                u = jnp.where(jpos < n, u - salt, 0)
            outs.append(u)
        return tuple(outs)

    @functools.partial(jax.jit, static_argnames=("runs",))
    def chain(args, valids, *, runs: int):
        if chain_sums:
            # Large plan: next salt from a small contiguous SLICE of
            # each class's written output — no whole-output re-read
            # (measured ~1/3 of chain traffic at 90.8M-int scale) and
            # no second kernel output stream (the (8,128)-sample
            # sum-emitting kernels measurably slow the tile loop:
            # 116 -> 82-84 G on the packed bench stream).  The decode
            # cannot be hoisted out of the scan (every kernel input
            # depends on the carry), and the Mosaic kernels are opaque
            # to XLA, which cannot split or partially execute them, so
            # each run still gathers and writes every row regardless of
            # how little of the output feeds the salt.  The
            # salted-class correction is unnecessary here: the salt's
            # exact value is arbitrary.
            def body(salt, _):
                raw = _run(args, salt)
                acc = jnp.uint32(0)
                for o in raw:
                    if o is None:
                        continue
                    acc = acc + jnp.sum(
                        jax.lax.bitcast_convert_type(
                            o[:128], jnp.uint32
                        ),
                        dtype=jnp.uint32,
                    )
                return acc + salt + jnp.uint32(1), None

        else:
            # Small plan: whole-output reduction (the re-read is cheap
            # at this size, and the extra output stream of the sums
            # kernel measurably slows the tile loop).
            def body(salt, _):
                raw = _run(args, salt)
                s = jnp.uint32(0)
                for o, (call, salted, mode), valid in zip(raw, calls, valids):
                    if o is None:
                        continue
                    s = s + jnp.sum(
                        jax.lax.bitcast_convert_type(o, jnp.uint32),
                        dtype=jnp.uint32,
                    )
                    if salted:
                        s = s - salt * valid
                return s + salt + jnp.uint32(1), None

        salt, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
        return salt

    return decode, chain


@jax.jit
def _decode_flat_xla(vidx8, table, n2, salt):
    """Portable path (CPU tests / non-TPU backends): XLA's native gather
    is fast off-TPU, so the same hosted-vidx plan decodes directly."""
    idx = vidx8.astype(jnp.int32) & 255
    t = table + salt
    val = jnp.take_along_axis(t, idx, axis=1) - salt
    jpos = jnp.arange(N_OUT, dtype=jnp.int32)[None, :]
    return jnp.where(jpos < n2, val, 0)


@functools.partial(jax.jit, static_argnames=("runs",))
def _chain_flat_xla(vidx8, table, n2, *, runs: int):
    def body(salt, _):
        outs = _decode_flat_xla(vidx8, table, n2, salt)
        nxt = jnp.sum(outs, dtype=jnp.uint32) + salt + jnp.uint32(1)
        return nxt, None

    salt, _ = jax.lax.scan(body, jnp.uint32(1), None, length=runs)
    return salt


@jax.jit
def _docid_rebuild(gaps, base, n2):
    """Per-row docid rebuild: docid[j] = base + cumsum(gap+1) - 1 for
    j < n (the dict_posting_list.hpp:284-309 reconstruction, batched —
    the 'segmented prefix-sums to rebuild docIDs' device step; rows are
    independent because each block's base comes from block_maxs)."""
    c = jnp.cumsum(gaps + jnp.uint32(1), axis=1)
    doc = base[:, None] + c - jnp.uint32(1)
    jpos = jnp.arange(gaps.shape[1], dtype=jnp.int32)[None, :]
    return jnp.where(jpos < n2, doc, 0)


class LocalDecodeEngine:
    """Single-dispatch runner over a LocalPlan (flat padded rows).

    TPU: Pallas VPU lane-gather kernel (_pallas_gather_kernel).
    Elsewhere: XLA take_along_axis over the same hosted-vidx plan.
    Both are exact; outputs are identical u32 arrays.
    """

    def __init__(self, plan: LocalPlan, row_tile: int | None = None):
        self.plan = plan
        self.use_pallas = (
            jax.default_backend() == "tpu" or FORCE_SPLIT_INTERPRET
        )
        self._interpret = FORCE_SPLIT_INTERPRET
        R = plan.rows
        if row_tile is None:
            row_tile = GATHER_ROW_TILE if self.use_pallas else max(R, 1)
            row_tile = min(row_tile, max(1 << int(np.ceil(np.log2(max(R, 1)))), 32))
        self.row_tile = row_tile
        vidx_np = plan_to_vidx(plan)
        assert int(vidx_np.max(initial=0)) < TABLE_CLS <= 256

        def pad_to(a, rows, fill=0):
            if a.shape[0] != rows:
                ext = np.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
                a = np.concatenate([a, ext])
            return a

        if self.use_pallas:
            # split rows into table width classes: u8 packs 4 entries
            # per i32 lane, u16 packs 2 (one <=128-lane gather serves
            # the whole table in every class; table HBM traffic scales
            # with the class width)
            tabmax = (
                plan.table.max(axis=1) if R else np.zeros(0, plan.table.dtype)
            )
            # NOTE: a u8 class (4 entries/lane, 64-lane table) has no
            # traffic win: Mosaic's dynamic gather requires operand
            # lane width == index lane width (128), so the 64-lane
            # table would have to be stored 128 lanes wide anyway.
            # all-zero tables decode to all-zero outputs whatever the
            # tokens say: those rows form a write-only zero class that
            # reads neither vidx nor table
            sel0 = tabmax == 0
            sel16 = (tabmax < (1 << 16)) & ~sel0
            sel32 = tabmax >= (1 << 16)
            classes = []  # (mode, orig row ids, padded rows)
            for mode, sel in ((0, sel0), (16, sel16), (32, sel32)):
                rows = np.flatnonzero(sel).astype(np.int64)
                padded = -(-rows.shape[0] // row_tile) * row_tile if rows.shape[0] else 0
                classes.append((mode, rows, padded))
            self._classes = classes
            self._spec = tuple(
                (padded, mode) for mode, _, padded in classes
            )
            order = np.concatenate([rows for _, rows, _ in classes])
            dev = []
            valids = []
            eng_rows = sum(p for _, _, p in classes)
            self.eng_unit_id = np.full(eng_rows, -1, np.int64)
            self.eng_out_pos = np.zeros(eng_rows, np.int64)
            self.eng_out_n = np.zeros(eng_rows, np.int32)
            base = 0
            cls_bases = []
            for mode, rows, padded in classes:
                Rc = rows.shape[0]
                cls_bases.append(base)
                nn = (
                    pad_to(plan.out_n[rows], padded)
                    if Rc
                    else np.zeros(0, np.int32)
                )
                if mode == 0:
                    # write-only class: no vidx, no table on device
                    dev.append(
                        (
                            jnp.zeros((0,), jnp.int8),
                            jnp.zeros((0,), jnp.int32),
                            jnp.asarray(nn.astype(np.int32)[:, None]),
                        )
                    )
                else:
                    v = (
                        pad_to(vidx_np[rows], padded)
                        if Rc
                        else np.zeros((0, N_OUT), np.int32)
                    )
                    tr = (
                        plan.table[rows]
                        if Rc
                        else np.zeros((0, TABLE_CLS), np.uint32)
                    )
                    if mode == 16:
                        t = (
                            tr[:, 0::2] | (tr[:, 1::2] << np.uint32(16))
                        ).astype(np.uint32)
                    else:
                        t = tr
                    t = pad_to(t, padded)
                    dev.append(
                        (
                            jnp.asarray(v.astype(np.uint8).view(np.int8)),
                            jnp.asarray(t.view(np.int32)),
                            jnp.asarray(nn.astype(np.int32)[:, None]),
                        )
                    )
                valids.append(jnp.uint32(int(nn.astype(np.int64).sum())))
                self.eng_unit_id[base : base + Rc] = plan.unit_id[rows]
                self.eng_out_pos[base : base + Rc] = plan.out_pos[rows]
                self.eng_out_n[base : base + Rc] = plan.out_n[rows]
                base += padded
            self._dev = tuple(dev)
            self._valids = tuple(valids)
            self._cls_bases = cls_bases
            self._order = order
            self._p16 = True  # marker: engine order is class-permuted
            # plan row -> engine row (classes are padded independently)
            self._eng_of_plan = np.zeros(max(R, 1), np.int64)
            for (mode, rows, padded), cbase in zip(classes, cls_bases):
                self._eng_of_plan[rows] = cbase + np.arange(
                    rows.shape[0], dtype=np.int64
                )
        else:
            padR = -(-max(R, 1) // row_tile) * row_tile
            self.T = padR // row_tile
            vidx = pad_to(vidx_np, padR)
            self.vidx = jnp.asarray(vidx.astype(np.uint8).view(np.int8))
            tab = pad_to(plan.table, padR)
            self.table = jnp.asarray(tab)
            self.n = jnp.asarray(pad_to(plan.out_n, padR).astype(np.int32)[:, None])
            self.eng_unit_id = np.full(padR, -1, np.int64)
            self.eng_out_pos = np.zeros(padR, np.int64)
            self.eng_out_n = np.zeros(padR, np.int32)
            self.eng_unit_id[:R] = plan.unit_id
            self.eng_out_pos[:R] = plan.out_pos
            self.eng_out_n[:R] = plan.out_n
            self._order = np.arange(R, dtype=np.int64)
            self._p16 = None
            self._eng_of_plan = np.arange(max(R, 1), dtype=np.int64)
        self._row_carry = None

    def row_carry(self) -> np.ndarray:
        """(rows,) u32: sum of (gap+1) over all PRIOR rows of the same
        unit — the docid offset each row starts at within its unit.
        Pure plan state (the planner knows every decoded value), hosted
        once like vidx."""
        if self._row_carry is None:
            plan = self.plan
            assert not plan.packed, (
                "docid rebuild needs per-unit rows; plan with "
                "pack_units=False for the index path"
            )
            vals = np.take_along_axis(
                plan.table, plan_to_vidx(plan), axis=1
            ).astype(np.uint64)
            jpos = np.arange(vals.shape[1])[None, :]
            valid = jpos < plan.out_n[:, None]
            s = (vals * valid).sum(axis=1).astype(np.uint64) + plan.out_n
            carry = np.zeros(plan.rows, np.uint32)
            if plan.rows:
                csum = np.cumsum(s)
                same = plan.unit_id[1:] == plan.unit_id[:-1]
                first = np.concatenate([[0], np.where(same, 0, 1)]).astype(bool)
                # exclusive prefix within unit: csum[r-1] - csum[last row
                # of previous unit]
                unit_start_csum = np.where(
                    first, np.concatenate([[0], csum[:-1]]), 0
                )
                unit_base = np.maximum.accumulate(unit_start_csum)
                carry = (
                    np.concatenate([[0], csum[:-1]]) - unit_base
                ).astype(np.uint32)
            self._row_carry = carry
        return self._row_carry

    def decode_docids_all(self, unit_bases: np.ndarray, salt=0):
        """Decode AND rebuild docids on device: gather + per-row
        segmented prefix-sum with hosted carries (rows of one unit are
        chained through row_carry; unit_bases come from block_maxs)."""
        salt = salt if isinstance(salt, jnp.ndarray) else jnp.uint32(salt)
        eng_rows = self.eng_unit_id.shape[0]
        bases = np.zeros(eng_rows, np.uint32)
        carry = self.row_carry()
        nb = np.asarray(unit_bases, np.uint32)[self.plan.unit_id] + carry
        # scatter plan-order bases into engine order
        R = self.plan.rows
        if self._p16 is not None:
            for (mode, rows, padded), cbase in zip(
                self._classes, self._cls_bases
            ):
                bases[cbase : cbase + rows.shape[0]] = nb[rows]
        else:
            bases[:R] = nb
        gaps = self.decode_all(salt)
        n2 = self.eng_out_n.astype(np.int32)[:, None]
        return _docid_rebuild(gaps, jnp.asarray(bases), jnp.asarray(n2))

    def decode_all(self, salt=0):
        """Full decode; returns (eng_rows, N_OUT) u32 in ENGINE row
        order (width-class-permuted on TPU; gather_units maps back)."""
        salt = salt if isinstance(salt, jnp.ndarray) else jnp.uint32(salt)
        if self.use_pallas:
            decode, _ = _pallas_split_fns(
                self._spec, self.row_tile, self._interpret
            )
            outs = decode(self._dev, salt)
            if not outs:  # empty plan: nothing to decode
                return jnp.zeros((0, N_OUT), jnp.uint32)
            if len(outs) > 1:
                return jnp.concatenate(outs, axis=0)
            return outs[0]
        return _decode_flat_xla(self.vidx, self.table, self.n, salt)

    def decode_chain(self, runs: int):
        """`runs` full-stream decodes as ONE device dispatch.

        Every run is a distinct, fully-materialized decode (the salt
        carry makes each run's kernel inputs depend on the previous
        run, so nothing can be hoisted, skipped, or memoized), and
        per-dispatch runtime overhead (~ms through this stack)
        amortizes across the chain.  Small plans derive each salt from
        a u32 reduction over the previous run's ENTIRE output; plans
        >= CHAIN_SUMS_MIN_OUT_BYTES reduce a small contiguous SLICE of
        each class's output instead (the full re-read is ~1/3 of chain
        traffic at scale) — there the full-write guarantee rests on
        the Mosaic kernels being opaque to XLA, which cannot split or
        partially execute them.  Returns the final salt (fetch it to
        force completion)."""
        if self.use_pallas:
            _, chain = _pallas_split_fns(
                self._spec, self.row_tile, self._interpret
            )
            return chain(self._dev, self._valids, runs=runs)
        return _chain_flat_xla(self.vidx, self.table, self.n, runs=runs)

    def total_ints(self) -> int:
        return int(self.plan.out_n.astype(np.int64).sum())

    def gather_units(self, outs, num_units: int, unit_ns) -> List[np.ndarray]:
        host = np.asarray(outs).reshape(-1, N_OUT)
        res = [np.zeros(int(k), dtype=np.uint32) for k in unit_ns]
        plan = self.plan
        if plan.packed:
            er = self._eng_of_plan[plan.seg_row]
            for s in range(plan.seg_row.shape[0]):
                u = int(plan.seg_unit[s])
                p = int(plan.seg_pos[s])
                o = int(plan.seg_off[s])
                ln = int(plan.seg_len[s])
                res[u][p : p + ln] = host[int(er[s]), o : o + ln]
            return res
        for r in range(self.eng_unit_id.shape[0]):
            u = int(self.eng_unit_id[r])
            if u < 0:
                continue
            p = int(self.eng_out_pos[r])
            k = int(self.eng_out_n[r])
            res[u][p : p + k] = host[r, :k]
        return res


class ImageDecodeEngine:
    """Device runner over a DecodeImage (the native streaming planner's
    engine-ready class arrays).  Same kernels and chained-salted timing
    protocol as LocalDecodeEngine — the classes arrive pre-split and
    pre-packed, so construction is upload-only.  Off-TPU the same
    Pallas kernels run in interpret mode (the tests' path)."""

    def __init__(self, img: DecodeImage, row_tile: int | None = None):
        self.image = img
        on_tpu = jax.default_backend() == "tpu"
        self._interpret = not on_tpu
        R_max = max(
            img.n0.shape[0], img.n16.shape[0], img.n32.shape[0], 1
        )
        if row_tile is None:
            row_tile = min(
                GATHER_ROW_TILE,
                max(1 << int(np.ceil(np.log2(R_max))), 32),
            )
        self.row_tile = row_tile

        def pad_rows(a, rows):
            if a.shape[0] != rows:
                ext = np.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
                a = np.concatenate([a, ext])
            return a

        dev = []
        valids = []
        spec = []
        cls_bases = {}
        base = 0
        for mode, vidx, tab, nn in (
            (0, None, None, img.n0),
            (16, img.vidx16, img.tab16, img.n16),
            (32, img.vidx32, img.tab32, img.n32),
        ):
            Rc = nn.shape[0]
            padded = -(-Rc // row_tile) * row_tile if Rc else 0
            spec.append((padded, mode))
            cls_bases[mode] = base
            n2 = pad_rows(np.ascontiguousarray(nn, np.int32), padded)[:, None]
            if mode == 0 or Rc == 0:
                dev.append(
                    (
                        jnp.zeros((0,), jnp.int8),
                        jnp.zeros((0,), jnp.int32),
                        jnp.asarray(n2),
                    )
                )
            else:
                dev.append(
                    (
                        jnp.asarray(pad_rows(vidx, padded).view(np.int8)),
                        jnp.asarray(pad_rows(tab, padded).view(np.int32)),
                        jnp.asarray(n2),
                    )
                )
            valids.append(jnp.uint32(int(nn.astype(np.int64).sum())))
            base += padded
        self._dev = tuple(dev)
        self._valids = tuple(valids)
        self._spec = tuple(spec)
        self._cls_bases = cls_bases
        self.plan_bytes = img.device_bytes()

    def total_ints(self) -> int:
        return self.image.total_ints()

    def decode_all(self):
        """(eng_rows, N_OUT) u32 in engine row order (class-major:
        zero, u16, i32 — each padded to the row tile)."""
        decode, _ = _pallas_split_fns(
            self._spec, self.row_tile, self._interpret
        )
        outs = decode(self._dev, jnp.uint32(0))
        if not outs:
            return jnp.zeros((0, N_OUT), jnp.uint32)
        # decode() drops empty classes; re-expand to class-major order
        full = []
        oi = 0
        for rows, mode in self._spec:
            if rows == 0:
                continue
            full.append(outs[oi])
            oi += 1
        return jnp.concatenate(full, axis=0) if len(full) > 1 else full[0]

    def decode_chain(self, runs: int):
        _, chain = _pallas_split_fns(
            self._spec, self.row_tile, self._interpret
        )
        return chain(self._dev, self._valids, runs=runs)

    def gather_units(self, outs, num_units: int, unit_ns) -> List[np.ndarray]:
        host = np.asarray(outs).reshape(-1, N_OUT)
        img = self.image
        res = [np.zeros(int(k), dtype=np.uint32) for k in unit_ns]
        # engine row = class base + row-within-class (classes are padded
        # independently but emitted contiguously by decode_all; empty
        # classes contribute zero rows)
        b = self._cls_bases
        er = img.seg_row + np.where(
            img.seg_cls == 0, b[0], np.where(img.seg_cls == 16, b[16], b[32])
        )
        for s in range(img.seg_cls.shape[0]):
            u = int(img.seg_unit[s])
            p = int(img.seg_pos[s])
            o = int(img.seg_off[s])
            ln = int(img.seg_len[s])
            res[u][p : p + ln] = host[int(er[s]), o : o + ln]
        return res
