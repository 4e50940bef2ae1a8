"""Vroom-equivalent decoder CLI — the headline-metric harness.

Usage (mirrors vroom_env/decode.cpp:202-263):

    python -m dint_tpu.tools.decode <type> <encoded_file>
        [--dict DICT_FILE] [--runs R] [--check-collection FILE]

Loads the encoded stream + skip sidecar + dictionary, plans per-block
device decode buckets, runs one untimed warmup pass (compilation), then
R timed passes over the full stream, and prints the reference's stats
record {filename, num_sequences, num_integers, type, tot_elapsed_time,
ns_x_int, ints_x_sec} (vroom_env/statistics.hpp:7-34).
"""

from __future__ import annotations

import argparse
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..codecs import encode_batch
from ..config import BLOCK_SIZE, NUM_SELECTORS
from ..dictionary import builder as dict_builder
from ..dictionary.dictionary import (
    DecodeView,
    MultiPackedDictionary,
    PackedDictionary,
    RectangularDictionary,
)
from ..index import stream as stream_mod
from ..kernels import decode_local, pipeline
from . import common


@dataclass
class UnitLayout:
    """Per-decode-unit geometry derived from the skip sidecar."""

    starts: np.ndarray  # payload byte offsets (after any selector byte)
    byte_lens: np.ndarray
    n: np.ndarray
    ctx: np.ndarray
    b_bits: np.ndarray  # 16 or 8 per unit
    list_id: np.ndarray
    pos_in_list: np.ndarray  # output offset of the unit within its list


def units_from_meta(
    arena: np.ndarray, meta: stream_mod.StreamMeta, multi: bool
) -> UnitLayout:
    chunk = BLOCK_SIZE if multi else encode_batch.OPT_CHUNK
    L = meta.num_lists
    nb = ((meta.n.astype(np.int64) + chunk - 1) // chunk).clip(min=1)
    assert meta.block_ptr is not None, "stream lacks a skip sidecar"
    counts = np.diff(meta.block_ptr.astype(np.int64))
    assert (counts == nb).all(), "sidecar block counts disagree with n"
    list_id = np.repeat(np.arange(L, dtype=np.int64), nb)
    # unit index within its list
    first = np.concatenate([[0], np.cumsum(nb)[:-1]])
    unit_rank = np.arange(list_id.shape[0], dtype=np.int64) - first[list_id]
    pos_in_list = unit_rank * chunk
    n_unit = np.minimum(meta.n.astype(np.int64)[list_id] - pos_in_list, chunk)
    starts = meta.block_off.astype(np.int64).copy()
    list_end = (meta.payload_off + meta.payload_len).astype(np.int64)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = list_end[-1]
    # last unit of each list ends at the list's payload end
    last_of_list = np.concatenate([[0], np.cumsum(nb)])[1:] - 1
    ends[last_of_list] = list_end
    byte_lens = ends - starts
    if multi:
        sc = arena[starts].astype(np.int32)
        ctx = np.where(sc < NUM_SELECTORS, sc, sc - NUM_SELECTORS)
        b_bits = np.where(sc < NUM_SELECTORS, 16, 8)
        starts = starts + 1
        byte_lens = byte_lens - 1
    else:
        ctx = np.zeros(starts.shape[0], dtype=np.int32)
        b_bits = np.full(starts.shape[0], 16, dtype=np.int32)
    return UnitLayout(
        starts, byte_lens, n_unit.astype(np.int32), ctx.astype(np.int32),
        b_bits.astype(np.int32), list_id, pos_in_list,
    )


def jnp_ravel_first(x):
    import jax.numpy as jnp

    return jnp.ravel(x)[0]


class StreamDecoder:
    """Device decode of a full encoded stream.

    engine='local' (default): the localized serving-image path
    (kernels/decode_local.py) — plan once at load, then scatter-free
    512-domain gathers on device.  engine='raw': the general chain-scan
    path over raw tokens (kernels/decode_xla.py), kept as the
    structure-discovering baseline.
    """

    def __init__(self, arena: np.ndarray, meta: stream_mod.StreamMeta,
                 view: DecodeView, multi: bool, engine: str = "local",
                 plan_cache: str = None):
        self.meta = meta
        self.kind_engine = engine
        self.layout = units_from_meta(arena, meta, multi)
        self.cold_start_s = 0.0
        lay = self.layout
        if engine == "local":
            # streaming image build (native plan2): O(shard) scratch,
            # engine-ready class arrays — the cold-start path.  Falls
            # back to the LocalPlan pipeline without the native lib.
            t0 = time.perf_counter()
            img = None
            img_cache = (
                plan_cache.replace(".plan.", ".image.") if plan_cache
                else None
            )
            if img_cache:
                img = decode_local.load_image(img_cache)
            if img is None:
                img = decode_local.plan_stream_image(
                    arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
                    lay.b_bits, view,
                )
                if img is not None and img_cache:
                    try:
                        decode_local.save_image(img, img_cache)
                    except OSError:
                        pass
            if img is not None:
                self.engine = decode_local.ImageDecodeEngine(img)
                self.plan_bytes = img.device_bytes()
                self.cold_start_s = time.perf_counter() - t0
                return
            plan = None
            if plan_cache:
                plan = decode_local.load_plan(plan_cache)
            if plan is None:
                plan = decode_local.plan_stream(
                    arena, lay.starts, lay.byte_lens, lay.n, lay.ctx,
                    lay.b_bits, view, pack_units=True,
                )
                if plan_cache:
                    try:
                        decode_local.save_plan(plan, plan_cache)
                    except OSError:
                        pass
            self.engine = decode_local.LocalDecodeEngine(plan)
            self.plan_bytes = plan.plan_bytes()
            self.cold_start_s = time.perf_counter() - t0
            return
        buckets = []
        for bits in (16, 8):
            m = lay.b_bits == bits
            if not m.any():
                continue
            bks = pipeline.plan_buckets(
                arena,
                lay.starts[m],
                lay.byte_lens[m],
                lay.n[m],
                lay.ctx[m],
                bits,
            )
            # remap bucket indices back to global unit ids
            gids = np.flatnonzero(m)
            for bk in bks:
                bk.indices = gids[bk.indices]
            buckets.extend(bks)
        self.engine = pipeline.DecodeEngine(view, buckets)
        self.plan_bytes = 0

    def decode_all(self):
        return self.engine.decode_all()

    def timed_runs(self, runs: int) -> Tuple[float, int]:
        """(total seconds over `runs` full-stream decodes, ints per run).

        Timing discipline for this stack: the runtime memoizes identical
        executions AND completes work lazily (block_until_ready can
        return before execution), so every run is salted (distinct
        computation, identical results) and forced by fetching an output
        element to the host.
        """
        import jax
        import numpy as np

        if self.kind_engine == "local":
            total_ints = self.engine.total_ints()
            # The whole salted run-chain executes as ONE device dispatch
            # (decode_local._decode_chain): each run's salt is a u32
            # reduction over the previous run's ENTIRE output, so every
            # run is distinct, fully-materialized work the lazy/memoizing
            # runtime cannot skip, and per-dispatch overhead amortizes.
            _ = int(np.asarray(self.engine.decode_chain(runs)))  # warmup
            t0 = time.perf_counter()
            _ = int(np.asarray(self.engine.decode_chain(runs)))
            t1 = time.perf_counter()
            return t1 - t0, total_ints
        outs = self.decode_all()
        total_ints = self.engine.block_and_check(outs)
        t0 = time.perf_counter()
        for _ in range(runs):
            outs = self.decode_all()
            _ = np.asarray(outs[-1][0].ravel()[0])
        t1 = time.perf_counter()
        return t1 - t0, total_ints

    def gather_lists(self) -> List[np.ndarray]:
        """Decode and reassemble per-list int arrays (host)."""
        outs = self.decode_all()
        lay = self.layout
        lists = [
            np.zeros(int(n), dtype=np.uint32)
            for n in self.meta.n
        ]
        if self.kind_engine == "local":
            units = self.engine.gather_units(outs, len(lay.starts), lay.n)
            for uid, vals in enumerate(units):
                li = lay.list_id[uid]
                p = int(lay.pos_in_list[uid])
                lists[li][p : p + vals.shape[0]] = vals
            return lists
        for uid, row, k in self.engine.iter_unit_outputs(outs):
            li = lay.list_id[uid]
            p = int(lay.pos_in_list[uid])
            lists[li][p : p + k] = row[:k]
        return lists


class LadderStreamDecoder:
    """engine='ladder' for DINT streams: the canonical ladder serving
    image applied to the DINT wire format.

    The dictionary does its work at encode/storage time and at plan
    time: units host-decode ONCE at load (the parity-tested
    decode_units_fast_batch path), the flat value stream re-packs into
    256-value blocks at no-straddle ladder widths, and the device
    decode is the same broadcast shift/mask engine the zoo rides —
    ~0.58 image B/int vs the gather image's ~8.5 (per-row local tables
    are 98.6% unique, so the table indirection never amortizes its own
    traffic; see docs/STATUS.md).  engine='local' (the Pallas gather
    over the dictionary image) remains the default DINT-semantics
    engine and the A/B partner."""

    def __init__(self, arena, meta, view, multi: bool):
        from ..kernels import unpack_device
        from ..query import native_host

        t0 = time.perf_counter()
        self.meta = meta
        lay = units_from_meta(arena, meta, multi)
        self._list_lens = np.asarray(meta.n, np.int64)
        # fused native build: decode -> classify -> bit-pack straight
        # to lane-major class arrays, no flat intermediate (the flat
        # stream alone is 3.6 GB at 10^9 scale and every numpy pass
        # over it pays this VM's fresh-page fault tax; measured 185 s
        # -> ~40 s cold start at 908M ints)
        if os.environ.get("DINT_TPU_NATIVE_LADDER_DECODE", "1") == "1":
            res = native_host.decode_units_to_ladder(
                view, arena, lay.starts, lay.byte_lens, lay.n,
                lay.ctx, lay.b_bits,
            )
            if res is not None:
                total = int(self._list_lens.sum())
                plan = unpack_device.ladder_plan_prepacked(
                    res[0], res[1], total
                )
                self.engine = unpack_device.UnpackEngine(plan)
                self._plan = plan
                self.plan_bytes = self.engine.device_bytes
                self.cold_start_s = time.perf_counter() - t0
                return
        # flat-decode fallback paths (cross-checked oracles;
        # DINT_TPU_NATIVE_LADDER_DECODE=flat forces this native A/B
        # leg, =0 the numpy oracle)
        flat = None
        if os.environ.get("DINT_TPU_NATIVE_LADDER_DECODE", "1") in (
                "1", "flat"):
            flat = native_host.decode_units_flat(
                view, arena, lay.starts, lay.byte_lens, lay.n,
                lay.ctx, lay.b_bits,
            )
        if flat is None:
            from ..query.lazy_decode import decode_units_fast_batch

            vals, _ = decode_units_fast_batch(
                arena, lay.starts, lay.starts + lay.byte_lens, lay.n,
                view, lay.ctx, lay.b_bits,
            )
            # units_from_meta emits units list-major and in-list
            # sequential (list_id = repeat(arange(L)), pos_in_list =
            # rank * chunk), so unit order IS stream order —
            # concatenate directly (a per-unit scatter loop costs
            # minutes at 10^9 scale: ~3.5M units)
            flat = (np.concatenate(vals) if vals
                    else np.zeros(0, np.uint32))
        plan = unpack_device.ladder_plan_from_values(flat)
        self.engine = unpack_device.UnpackEngine(plan)
        self._plan = plan
        self.plan_bytes = self.engine.device_bytes
        self.cold_start_s = time.perf_counter() - t0

    def timed_runs(self, runs: int):
        elapsed = self.engine.timed_chain(runs)
        return elapsed, self._plan.total_ints

    def gather_lists(self):
        flat = self.engine.decode_all_ordered()
        cuts = np.cumsum(self._list_lens)[:-1]
        return np.split(flat, cuts)


def load_dictionary(type_name: str, dict_file: Optional[str], collection_hint=None):
    kind, policy = common.DINT_KINDS[type_name]
    if dict_file:
        if kind == "rectangular":
            return RectangularDictionary.load(dict_file)
        if kind == "multi":
            return MultiPackedDictionary.load(dict_file, policy or "pack")
        return PackedDictionary.load(dict_file, policy or "pack")
    raise ValueError("--dict required (or use the encode tool's cache file)")


def decode_stream(
    type_name: str,
    encoded_file: str,
    dict_file: Optional[str],
    runs: int = 10,
    check_collection: Optional[str] = None,
    engine: str = "local",
):
    from ..utils import jaxcfg

    jaxcfg.enable_compile_cache()
    kind, _ = common.DINT_KINDS[type_name]
    multi = kind == "multi"
    arena, meta = stream_mod.load_stream(encoded_file)
    d = load_dictionary(type_name, dict_file)
    view = d.decode_view()
    dict_mib = (view.table.nbytes + view.offsets.nbytes) / (1 << 20)
    common.log(f"Dictionary memory: {dict_mib:.3f} [MiB]")
    plan_cache = encoded_file + f".plan.v{decode_local.PLAN_VERSION}.npz"
    if engine == "ladder":
        dec = LadderStreamDecoder(arena, meta, view, multi)
    else:
        dec = StreamDecoder(arena, meta, view, multi, engine, plan_cache)
    common.log(f"decoding (engine={engine})...")
    elapsed, total_ints = dec.timed_runs(runs)
    per_run = elapsed / runs
    ns_x_int = per_run * 1e9 / max(total_ints, 1)
    rec = {
        "filename": encoded_file,
        "num_sequences": str(meta.num_lists),
        "num_integers": str(total_ints),
        "type": type_name,
        "tot_elapsed_time": f"{per_run}",
        "ns_x_int": f"{ns_x_int}",
        "ints_x_sec": str(int(1e9 / ns_x_int)) if ns_x_int > 0 else "inf",
        "runs": str(runs),
        "engine": engine,
        "plan_bytes": str(getattr(dec, "plan_bytes", 0)),
        # time-to-first-decoded-int: one-time plan/transcode wall time
        # (the reference decodes a cold mmap'd stream with zero prep;
        # this is what the streaming planner bounds)
        "cold_start_s": f"{getattr(dec, 'cold_start_s', 0.0):.3f}",
    }
    img = getattr(getattr(dec, "engine", None), "image", None)
    if img is not None:
        rec["rows"] = str(
            img.n0.shape[0] + img.n16.shape[0] + img.n32.shape[0]
        )
        rec["geometry"] = (
            f"{decode_local.W_TOKENS}/{decode_local.N_OUT}/"
            f"{decode_local.TABLE_CLS}"
        )
    if check_collection:
        got = dec.gather_lists()
        expect, _ = common.gap_lists_of(check_collection)
        assert len(got) == len(expect), (len(got), len(expect))
        for i, (g, e) in enumerate(zip(got, expect)):
            if not np.array_equal(g, e):
                raise SystemExit(f"MISMATCH in list {i}")
        rec["check"] = "ok"
        common.log("verification ok: decoded stream matches collection")
    common.stats_line(rec)
    return rec


def decode_zoo_device(type_name: str, encoded_file: str, runs: int,
                      check_collection=None):
    """Device bit-unpack decode for the fixed-width zoo codecs
    (kernels/unpack_device.py): width classes unpack as dense XLA ops
    (optpfor exceptions fold into the image at load), partial tails
    replay on the host."""
    from ..kernels import unpack_device

    arena, meta = stream_mod.load_stream(encoded_file)
    common.log("planning width classes...")
    t_plan0 = time.perf_counter()
    wire = os.environ.get("DINT_TPU_WIRE_UNPACK") == "1"
    # pef/u32/interpolative have no wire-structure device engine
    if not wire or type_name in ("pef", "u32", "interpolative"):
        # the generalized ladder image (plan_ladder): host-decode once
        # at load, re-pack at no-straddle ladder widths — the optpfor
        # folded path applied to the whole zoo (167-194 G ints/s vs
        # 35-110 for the wire-structure engines below, which remain
        # for A/B under DINT_TPU_WIRE_UNPACK=1)
        plan = unpack_device.plan_ladder(type_name, arena, meta)
        eng = unpack_device.UnpackEngine(plan)
    elif type_name in (
        "vbyte", "maskedvbyte", "streamvbyte", "varintgb", "varintg8iu"
    ):
        plan = unpack_device.plan_byteclass(type_name, arena, meta)
        eng = unpack_device.ByteClassEngine(plan)
    elif type_name == "simple16":
        plan = unpack_device.plan_simple16(arena, meta)
        eng = unpack_device.Simple16Engine(plan)
    else:
        planner = (
            unpack_device.plan_optpfor
            if type_name == "optpfor"
            else unpack_device.plan_qmx
        )
        plan = planner(arena, meta)
        eng = unpack_device.UnpackEngine(plan)
    cold_start_s = time.perf_counter() - t_plan0
    common.log(
        f"decoding (engine=device, {len(plan.classes)} width classes)..."
    )
    elapsed = eng.timed_chain(runs)
    total_ints = plan.total_ints
    per_run = elapsed / runs
    ns_x_int = per_run * 1e9 / max(total_ints, 1)
    rec = {
        "filename": encoded_file,
        "num_sequences": str(meta.num_lists),
        "num_integers": str(total_ints),
        "type": type_name,
        "tot_elapsed_time": f"{per_run}",
        "ns_x_int": f"{ns_x_int}",
        "ints_x_sec": str(int(1e9 / max(ns_x_int, 1e-12))),
        "runs": str(runs),
        "engine": "device",
        # the device image when the engine compiles one (optpfor folds
        # exceptions and re-packs at no-straddle ladder widths), else
        # the wire-faithful class arrays
        "plan_bytes": str(getattr(eng, "device_bytes", 0)
                          or plan.plan_bytes()),
        "cold_start_s": f"{cold_start_s:.3f}",
    }
    if check_collection:
        got = eng.decode_all_ordered()
        expect, _ = common.gap_lists_of(check_collection)
        if type_name == "pef":
            from ..utils import gaps as gap_mod

            expect = [gap_mod.gaps_to_docs(g) for g in expect]
        pos = 0
        for i, e in enumerate(expect):
            if not np.array_equal(got[pos : pos + e.shape[0]], e):
                raise SystemExit(f"MISMATCH in list {i}")
            pos += e.shape[0]
        rec["check"] = "ok"
        common.log("verification ok")
    common.stats_line(rec)
    return rec


def decode_zoo(type_name: str, encoded_file: str, runs: int,
               check_collection=None):
    """Host (numpy) decode of the whole-list zoo/pef types (the
    fixed-width codecs also have a device engine, decode_zoo_device)."""
    from ..index import vroom_zoo

    arena, meta = stream_mod.load_stream(encoded_file)
    total_ints = int(meta.n.astype(np.int64).sum())
    lists = [None] * meta.num_lists

    # self-delimiting byte codecs: excise every list's payload (their
    # byte lengths are sidecar state) into one contiguous buffer and
    # decode the WHOLE FILE in one vectorized pass — per-list numpy
    # fixed costs would otherwise dominate short-list collections
    offs = meta.payload_off.astype(np.int64)
    lens = meta.payload_len.astype(np.int64)
    batched_whole = (
        type_name in ("vbyte", "maskedvbyte") and meta.num_lists > 0
    )

    def one_pass():
        if batched_whole:
            from ..codecs import blocks as blocks_mod

            flat = np.concatenate(
                [
                    arena[offs[i] : offs[i] + lens[i]]
                    for i in range(meta.num_lists)
                ]
            )
            dec = blocks_mod.CODECS[type_name][1]
            vals, _ = dec(flat, 0, total_ints, blocks_mod.UNKNOWN)
            cuts = np.cumsum(meta.n.astype(np.int64))[:-1]
            parts = np.split(vals, cuts)
            for i in range(meta.num_lists):
                lists[i] = parts[i]
            return
        for i in range(meta.num_lists):
            n = int(meta.n[i])
            start = int(meta.payload_off[i])
            if type_name == "pef":
                lists[i] = vroom_zoo.decode_list_pef(
                    arena, start, int(meta.payload_len[i]), n,
                    int(meta.universe[i]),
                )
            else:
                lists[i] = vroom_zoo.decode_list_zoo(type_name, arena, start, n)

    one_pass()
    t0 = time.perf_counter()
    for _ in range(runs):
        one_pass()
    t1 = time.perf_counter()
    per_run = (t1 - t0) / runs
    ns_x_int = per_run * 1e9 / max(total_ints, 1)
    rec = {
        "filename": encoded_file,
        "num_sequences": str(meta.num_lists),
        "num_integers": str(total_ints),
        "type": type_name,
        "tot_elapsed_time": f"{per_run}",
        "ns_x_int": f"{ns_x_int}",
        "ints_x_sec": str(int(1e9 / ns_x_int)),
        "runs": str(runs),
        "engine": "host",
    }
    if check_collection:
        expect, _ = common.gap_lists_of(check_collection)
        if type_name == "pef":
            from ..utils import gaps as gap_mod

            expect = [gap_mod.gaps_to_docs(g) for g in expect]
        for i, e in enumerate(expect):
            if not np.array_equal(lists[i], e):
                raise SystemExit(f"MISMATCH in list {i}")
        rec["check"] = "ok"
        common.log("verification ok")
    common.stats_line(rec)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "type", choices=sorted(common.DINT_KINDS) + list(common.VROOM_ZOO)
    )
    ap.add_argument("encoded_file")
    ap.add_argument("--dict", dest="dict_file")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--check-collection")
    ap.add_argument(
        "--engine", choices=["local", "raw", "ladder", "device", "host"],
        default=None,
        help="DINT types: local (default; the dictionary-gather serving "
        "image) | ladder (canonical ladder image, ~0.58 vs ~8.5 device "
        "B/int — fastest at scale) | raw.  Zoo codecs: device (ladder "
        "image; the default on a TPU backend) or host (numpy)",
    )
    args = ap.parse_args(argv)
    if args.type in common.VROOM_ZOO:
        device_capable = args.type in (
            "optpfor", "qmx", "simple16",
            "vbyte", "maskedvbyte", "streamvbyte", "varintgb", "varintg8iu",
            "u32", "interpolative",  # via the ladder image
            "pef",  # ladder image with per-block docid bases
        )
        engine = args.engine
        if engine is None and device_capable:
            # TPU-first default: the device engine is the performant
            # path (35-110 G ints/s vs the host's tens of M); fall back
            # to host where no accelerator backend comes up
            try:
                import jax

                engine = "device" if jax.default_backend() == "tpu" else "host"
            except Exception:
                engine = "host"
        if engine == "device" and device_capable:
            decode_zoo_device(
                args.type, args.encoded_file, args.runs,
                args.check_collection,
            )
            return
        decode_zoo(args.type, args.encoded_file, args.runs, args.check_collection)
    else:
        decode_stream(
            args.type, args.encoded_file, args.dict_file, args.runs,
            args.check_collection, args.engine or "local",
        )


if __name__ == "__main__":
    main()
