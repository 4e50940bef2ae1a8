"""Large-scale pipeline shakedown (BASELINE configs 4/5 rehearsal).

Synthesizes a Gov2-shaped collection (default ~10^8 postings), then
runs every build stage with timings: dictionary training (chunked
statistics merging), native encode, native serving-image planning, and
a TPU decode of the resulting stream.  Spot-checks decode exactness on
a sample of lists against the scalar oracle.

Stages are create-or-load cached under .scale/ so reruns resume.

Usage: python scripts/scale_test.py [--ints 1e8] [--decode]
(--decode needs the TPU; run it alone, without PYTHONPATH — see
scripts/kernel_ablate.py header.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")


def _vmhwm_gb() -> float:
    """Peak RSS of this process so far (VmHWM), in GiB."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    return int(line.split()[1]) / (1 << 20)
    except OSError:
        pass
    return 0.0


def log_stage(name, t0):
    dt = time.perf_counter() - t0
    print(f"[scale] {name}: {dt:.1f}s (peak rss {_vmhwm_gb():.1f} GiB)",
          flush=True)
    return time.perf_counter()


def serve_stage(base, args):
    """BASELINE config 5 analog at synthetic scale: multi_packed_dint
    index build + create_wand_data + WAND top-10, host and device-batch
    engines, over a sampled query log."""
    from dint_tpu.index import dint_index
    from dint_tpu.query import boolean, device_batch, ranked
    from dint_tpu.query.term_decode import TermDecoder
    from dint_tpu.tools import queries as qtool

    t = time.perf_counter()
    idx_file = os.path.join(CACHE, "scale.idx.mpd.bin")
    if not os.path.exists(idx_file + ".npz"):  # save() writes .npz parts
        idx = dint_index.build_index(base, kind="multi", cache_dir=CACHE)
        idx.save(idx_file)
        t = log_stage("multi_packed_dint index build", t)
    idx = dint_index.DintIndex.load(idx_file)
    t = log_stage("index load", t)

    if not os.path.exists(base + ".sizes"):
        from dint_tpu.io import collection as coll_mod

        sizes = np.zeros(idx.num_docs, np.int64)
        for docs, freqs in coll_mod.open_freq_collection(base):
            np.add.at(sizes, docs.astype(np.int64), freqs.astype(np.int64))
        # clamp exactly like doc_sharded_stage writes the SAME cache
        # file (docs no posting touches keep a sane norm_len and the
        # artifact is identical whichever stage creates it first)
        coll_mod.write_sizes_file(base, np.maximum(sizes, 1).astype(np.uint32))
        t = log_stage("synthesize .sizes", t)

    wand_file = os.path.join(CACHE, "scale.wand")
    if not os.path.exists(wand_file + ".npz"):
        w = ranked.build_wand_data(base)
        w.save(wand_file)
        t = log_stage("create_wand_data", t)
    wdata = ranked.WandData.load(wand_file)

    qlog = os.path.join(CACHE, "scale.queries")
    if not os.path.exists(qlog):
        rng = np.random.default_rng(23)
        with open(qlog, "w") as f:
            for _ in range(args.queries):
                k = int(rng.integers(1, 5))
                f.write(" ".join(str(int(x)) for x in
                                 rng.integers(0, idx.num_lists, k)) + "\n")
    queries_list = boolean.parse_query_log(qlog)
    dec = TermDecoder(idx)

    stats, shape, dev_extra = qtool.run_op_device(
        idx, dec, wdata, queries_list, "wand", 3, 10
    )
    print(f"[scale] device wand batch {shape}: "
          f"{stats['avg']:.1f}us avg, q95 {stats['q95']:.1f}us/query "
          f"{dev_extra}")
    t = log_stage("device wand batch", t)
    # host skip-aware wand on a subset (the real algorithm walks
    # pivots in Python; monster unions with uniform weights prune
    # weakly, so the full 512-query log would take minutes)
    sub = queries_list[:64]
    stats = qtool.run_op(idx, dec, wdata, sub, "wand", 1, 10)
    print(f"[scale] host wand ({len(sub)} queries, decode-inclusive): "
          f"avg {stats['avg']:.1f}us, q50 {stats['q50']:.1f}us, "
          f"q95 {stats['q95']:.1f}us")
    tot = dec._lazy_totals
    print(f"[scale] host wand pruning (all timed queries): "
          f"{tot['docs_blocks']} doc blocks decoded, "
          f"{tot['postings_scored']} postings scored")
    t = log_stage("host wand subset", t)
    # exhaustive host ranked_or on the same subset for the honest
    # pruned-vs-exhaustive comparison
    stats = qtool.run_op(idx, dec, wdata, sub, "ranked_or", 1, 10)
    print(f"[scale] host ranked_or ({len(sub)} queries): "
          f"avg {stats['avg']:.1f}us, q50 {stats['q50']:.1f}us")
    t = log_stage("host ranked_or subset", t)
    stats, shape, _ = qtool.run_op_device(
        idx, dec, wdata, queries_list, "and", 3, 10
    )
    print(f"[scale] device AND batch {shape}: {stats['avg']:.1f}us avg")
    stats = qtool.run_op(idx, dec, wdata, queries_list, "and", 3, 10)
    print(f"[scale] host AND: p50 {stats['q50']:.1f}us, avg {stats['avg']:.1f}us")
    log_stage("boolean", t)

    # exactness spot-check: device ranked vs host oracle on a sample
    sample = queries_list[:20]
    got = device_batch.ranked_or_batch(idx, dec, wdata, sample, k=10)
    for q, g in zip(sample, got):
        want = ranked.ranked_or(idx, dec, wdata, q, k=10)
        np.testing.assert_allclose(g, want, rtol=1e-3)
    print("[scale] device ranked top-10 matches host oracle on 20 queries")


def reexec_in_cpu_mesh_child(n_devices: int) -> bool:
    """Re-run this script in a child with a forced n-device CPU mesh
    (the dryrun_multichip recipe) so sharded stages run from any shell.

    Returns True in the PARENT (child already ran; caller returns),
    False in the child (caller proceeds onto the mesh)."""
    import re
    import subprocess

    if os.environ.get("_DINT_SCALE_SHARDED_CHILD") == "1":
        return False
    env = dict(os.environ)
    env["_DINT_SCALE_SHARDED_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    xla = env.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" in xla:
        # override a conflicting inherited value instead of keeping it
        # (the mesh assert below would fire otherwise)
        xla = re.sub(
            r"--?xla_force_host_platform_device_count=\d+", want, xla
        )
    else:
        xla = (xla + " " + want).strip()
    env["XLA_FLAGS"] = xla
    r = subprocess.run([sys.executable] + sys.argv, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"sharded-stage child failed rc={r.returncode}")
    return True


def serve_sharded_stage(args):
    """VERDICT #8 at scale: the real 90.8M-posting multi_packed index
    served doc-sharded across a virtual n-device mesh (shard_map +
    all_gather top-k merge, parallel/serve.py), exact parity with the
    host ranked_or oracle.  Self-provisions its CPU mesh in a child
    process (the dryrun_multichip recipe) so it runs from any shell."""
    needed = [
        os.path.join(CACHE, "scale.idx.mpd.bin.npz"),
        os.path.join(CACHE, "scale.wand.npz"),
        os.path.join(CACHE, "scale.queries"),
    ]
    missing = [f for f in needed if not os.path.exists(f)]
    if missing:
        raise SystemExit(
            "--serve-sharded needs the artifacts a --serve run creates; "
            f"missing: {missing}.  Run `python scripts/scale_test.py "
            "--serve` first."
        )

    if reexec_in_cpu_mesh_child(args.shards):
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from dint_tpu.index import dint_index
    from dint_tpu.parallel import serve
    from dint_tpu.query import boolean, ranked
    from dint_tpu.query.term_decode import TermDecoder

    devs = np.array(jax.devices()[: args.shards])
    assert devs.size == args.shards, (devs, args.shards)
    mesh = Mesh(devs, ("dp",))

    t = time.perf_counter()
    idx = dint_index.DintIndex.load(os.path.join(CACHE, "scale.idx.mpd.bin"))
    wdata = ranked.WandData.load(os.path.join(CACHE, "scale.wand"))
    queries_list = boolean.parse_query_log(os.path.join(CACHE, "scale.queries"))
    qs = queries_list[: args.sharded_queries]
    dec = TermDecoder(idx)
    t = log_stage("sharded: load index + wand + queries", t)

    vals, ids = serve.serve_ranked_sharded(mesh, idx, dec, wdata, qs, k=10)
    t = log_stage(
        f"sharded: {len(qs)} queries doc-sharded over {args.shards} devices "
        f"(rows + shard_map dispatch)", t
    )
    for qi, q in enumerate(qs):
        want = ranked.ranked_or(idx, dec, wdata, q, k=10)
        got = np.asarray(vals[qi][: want.shape[0]])
        assert got.shape == want.shape and np.allclose(got, want, rtol=1e-4), (
            qi, q, got, want,
        )
    log_stage("sharded: host ranked_or oracle parity", t)
    print(
        f"[scale] sharded serve ok: {len(qs)} queries, top-10 exact parity "
        f"with the host oracle on the {idx.num_lists}-list index"
    )


def doc_sharded_stage(args):
    """Doc-sharded construction + serving at scale: the collection
    partitions into per-doc-range shard collections, each shard builds
    a SELF-CONTAINED single_packed index (own dictionaries), and the
    shard set serves queries with global BM25 statistics — exact
    parity with ranked_or on an unsharded index.  The multi-host
    topology: no host ever holds the whole index.  Reuses the
    serve-sharded child re-exec recipe for the CPU mesh."""
    base = os.path.join(CACHE, "scale_collection")
    if not (os.path.exists(base + ".docs") and os.path.exists(base + ".freqs")):
        raise SystemExit(
            "--build-doc-sharded needs the scale collection; run "
            "`python scripts/scale_test.py` (matching --ints/--cache-dir) "
            "first."
        )
    # self-prep the serving artifacts when absent (a --serve run also
    # creates them, but the 10^9 rehearsal goes straight to doc-sharded)
    tprep = time.perf_counter()
    from dint_tpu.io import collection as coll_mod
    from dint_tpu.query import ranked as ranked_mod

    if not os.path.exists(base + ".sizes"):
        view = coll_mod.open_freq_collection(base)
        sizes = np.zeros(view.num_docs, np.int64)
        for docs, freqs in view:
            np.add.at(sizes, docs.astype(np.int64), freqs.astype(np.int64))
        coll_mod.write_sizes_file(base, np.maximum(sizes, 1).astype(np.uint32))
        tprep = log_stage("doc-sharded: synthesize .sizes", tprep)
    wand_file = os.path.join(CACHE, "scale.wand")
    if not os.path.exists(wand_file + ".npz"):
        ranked_mod.build_wand_data(base).save(wand_file)
        tprep = log_stage("doc-sharded: create_wand_data", tprep)
    qlog = os.path.join(CACHE, "scale.queries")
    if not os.path.exists(qlog):
        nl = len(coll_mod.open_freq_collection(base))
        rng = np.random.default_rng(23)
        with open(qlog, "w") as f:
            for _ in range(args.queries):
                k = int(rng.integers(1, 5))
                f.write(" ".join(str(int(x)) for x in
                                 rng.integers(0, nl, k)) + "\n")

    if reexec_in_cpu_mesh_child(args.shards):
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from dint_tpu.index import dint_index
    from dint_tpu.parallel import build as pbuild
    from dint_tpu.parallel import serve
    from dint_tpu.query import boolean, ranked
    from dint_tpu.query.term_decode import TermDecoder

    devs = np.array(jax.devices()[: args.shards])
    assert devs.size == args.shards, (devs, args.shards)
    mesh = Mesh(devs, ("dp",))

    out_dir = os.path.join(CACHE, "doc_shards")
    t = time.perf_counter()
    if not os.path.exists(os.path.join(out_dir, "catalog.npz")):
        sharded = pbuild.build_doc_sharded(
            base, out_dir, args.shards, kind="single"
        )
        t = log_stage(
            f"doc-sharded: partition + {args.shards} self-contained "
            "shard builds (own dicts)", t
        )
    sharded = pbuild.DocShardedIndex.load(out_dir)
    if len(sharded.shards) != args.shards:
        raise SystemExit(
            f"cached shard set has {len(sharded.shards)} shards but "
            f"--shards={args.shards}; delete {out_dir} to rebuild"
        )
    t = log_stage("doc-sharded: load shard set", t)
    print(
        "[scale] shard postings: "
        + " ".join(str(int(s.list_n.astype(np.int64).sum()))
                   for s in sharded.shards)
    )

    # unsharded oracle index (same kind) + wand data
    oracle_file = os.path.join(CACHE, "scale.idx.spd.bin")
    if not os.path.exists(oracle_file + ".npz"):
        idx = dint_index.build_index(base, kind="single", cache_dir=CACHE)
        idx.save(oracle_file)
        t = log_stage("doc-sharded: unsharded oracle index build", t)
    idx = dint_index.DintIndex.load(oracle_file)
    wdata = ranked.WandData.load(os.path.join(CACHE, "scale.wand"))
    queries_list = boolean.parse_query_log(os.path.join(CACHE, "scale.queries"))
    qs = queries_list[: args.sharded_queries]
    dec = TermDecoder(idx)
    t = log_stage("doc-sharded: oracle load", t)

    vals, ids = serve.serve_ranked_doc_sharded(
        mesh, sharded, wdata.norm_lens, qs, k=10
    )
    t = log_stage(
        f"doc-sharded: {len(qs)} queries served from {args.shards} "
        "self-contained shards (decode + shard_map dispatch)", t
    )
    for qi, q in enumerate(qs):
        want = ranked.ranked_or(idx, dec, wdata, q, k=10)
        got = np.asarray(vals[qi][: want.shape[0]])
        assert got.shape == want.shape and np.allclose(got, want, rtol=1e-4), (
            qi, q, got, want,
        )
    t = log_stage("doc-sharded: host ranked_or oracle parity", t)
    # decode spot-check: random terms reconstructed from the shard set
    # (shard-local docids + doc_lo offsets) must equal the collection
    view = coll_mod.open_freq_collection(base)
    lens = np.asarray(idx.list_n, np.int64)
    rng = np.random.default_rng(7)
    picks = rng.choice(np.flatnonzero(lens > 0),
                       size=min(25, int((lens > 0).sum())), replace=False)
    shard_decs = [TermDecoder(sh) for sh in sharded.shards]
    for t_id in picks:
        t_id = int(t_id)
        parts = [
            sd.decode_docids([t_id])[t_id].astype(np.int64)
            + int(sharded.doc_lo[j])
            for j, sd in enumerate(shard_decs)
        ]
        got = np.concatenate([p for p in parts if p.size])
        want = np.asarray(view.docs.sequence(t_id + 1), np.int64)
        np.testing.assert_array_equal(got, want, err_msg=f"term {t_id}")
        fparts = [
            sd.decode_freqs([t_id])[t_id]
            for j, sd in enumerate(shard_decs)
        ]
        gotf = np.concatenate([p for p in fparts if p.size])
        np.testing.assert_array_equal(
            gotf, np.asarray(view.freqs.sequence(t_id)), err_msg=f"term {t_id}"
        )
    log_stage(f"doc-sharded: decode spot-check {picks.size} terms "
              "(docs+freqs exact)", t)
    print(
        f"[scale] doc-sharded ok: {len(qs)} queries, top-10 exact parity; "
        f"no shard holds more than "
        f"{max(int(s.list_n.astype(np.int64).sum()) for s in sharded.shards)} "
        f"of {int(idx.list_n.astype(np.int64).sum())} postings"
    )


def pef_index_stage(args):
    """The PEF index family at scale (BASELINE config: PEF eps-opt is
    the reference README's fourth row): build an opt/uniform
    freq_index over the scale collection with the native partitioning
    DP, report size stats, verify decode exactness on a sample, and
    run WAND with oracle parity over the skipping enumerators."""
    from dint_tpu.index import freq_index
    from dint_tpu.query import boolean, ranked

    base = os.path.join(CACHE, "scale_collection")
    if not os.path.exists(base + ".docs"):
        raise SystemExit("needs the scale collection; run the build "
                         "stages first (matching --ints/--cache-dir)")
    t = time.perf_counter()
    idx_file = os.path.join(CACHE, f"scale.{args.pef_kind}.idx")
    if not os.path.exists(idx_file + ".npz"):
        idx = freq_index.build_freq_index(base, args.pef_kind)
        t = log_stage(f"pef-index: build_freq_index({args.pef_kind})", t)
        idx.save(idx_file)
        t = log_stage("pef-index: save", t)
    idx = freq_index.FreqIndexEF.load(idx_file)
    t = log_stage("pef-index: load", t)
    st = idx.size_stats()
    print(f"[scale] pef-index size: {st}")

    # decode exactness on a sample of lists (full verify at 10^9 would
    # re-read the whole collection; the sample covers every list shape)
    from dint_tpu.io import collection as coll_mod

    view = coll_mod.open_freq_collection(base)
    lens = np.asarray(idx.list_n, np.int64)
    rng = np.random.default_rng(17)
    picks = rng.choice(np.flatnonzero(lens > 0),
                       size=min(50, int((lens > 0).sum())), replace=False)
    for t_id in picks:
        t_id = int(t_id)
        np.testing.assert_array_equal(
            idx.list_docids(t_id),
            np.asarray(view.docs.sequence(t_id + 1), np.uint64),
            err_msg=f"term {t_id} docs")
        np.testing.assert_array_equal(
            idx.list_freqs(t_id),
            np.asarray(view.freqs.sequence(t_id), np.uint64),
            err_msg=f"term {t_id} freqs")
    t = log_stage(f"pef-index: decode spot-check {picks.size} terms "
                  "(docs+freqs exact)", t)

    # ranked queries over the skipping enumerators, oracle parity
    wand_file = os.path.join(CACHE, "scale.wand")
    qlog = os.path.join(CACHE, "scale.queries")
    if os.path.exists(wand_file + ".npz") and os.path.exists(qlog):
        wdata = ranked.WandData.load(wand_file)
        qs = boolean.parse_query_log(qlog)[:16]
        dec = freq_index.EFTermDecoder(idx)
        for q in qs:
            want = ranked.ranked_or(idx, dec, wdata, q, k=10)
            got = ranked.wand(idx, dec, wdata, q, k=10)
            assert got.shape == want.shape and np.allclose(
                got, want, rtol=1e-4), q
        c = dec.lazy_cache
        log_stage(
            f"pef-index: wand == ranked_or on {len(qs)} queries "
            f"(enumerator moves {c.moves}, postings scored "
            f"{c.postings_scored})", t)
    print("[scale] pef-index OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ints", type=float, default=1e8)
    ap.add_argument("--num-lists", type=int, default=20000)
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--serve-sharded", action="store_true")
    ap.add_argument("--build-doc-sharded", action="store_true")
    ap.add_argument("--build-pef-index", action="store_true")
    ap.add_argument("--pef-kind", default="opt",
                    choices=["ef", "single", "uniform", "opt"])
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--sharded-queries", type=int, default=32)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cache-dir", default=None,
                    help="override the .scale cache (e.g. .scale1e9 for "
                         "the 10^9 rehearsal: --ints 1e9 --cache-dir "
                         ".scale1e9, then --build-doc-sharded with the "
                         "same flags)")
    args = ap.parse_args()
    if args.cache_dir:
        global CACHE
        CACHE = os.path.abspath(args.cache_dir)

    # sharded-serve child (and parent, once artifacts exist): jump
    # straight to the stage — re-running the synth/count/encode checks
    # here would pass over ~10^8 postings again for nothing
    if args.serve_sharded:
        serve_sharded_stage(args)
        return
    if args.build_pef_index:
        pef_index_stage(args)
        return
    if args.build_doc_sharded:
        doc_sharded_stage(args)
        return

    from dint_tpu.io import collection, synth

    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, "scale_collection")
    avg_len = args.ints / args.num_lists
    num_docs = int(args.ints // 4)

    t = time.perf_counter()
    if not os.path.exists(base + ".docs"):
        docs, freqs = synth.make_collection(
            args.num_lists, num_docs, seed=11, avg_len=avg_len
        )
        collection.write_freq_collection(base, docs, freqs, num_docs)
        del docs, freqs
    t = log_stage("synthesize+write", t)

    coll = collection.open_freq_collection(base)
    total = int(sum(len(d) for d, _ in coll))
    print(f"[scale] collection: {args.num_lists} lists, {total} postings")
    t = log_stage("count", t)

    stream = os.path.join(CACHE, "scale.single_rect_dint.bin")
    dict_file = os.path.join(
        CACHE, "dict.scale_collection.docs.rectangular.DSF-65536-16"
    )
    if not os.path.exists(stream):
        from dint_tpu.tools import encode

        encode.encode_collection(
            "single_rect_dint", base + ".docs", stream, cache_dir=CACHE
        )
    t = log_stage("dict-train + encode", t)

    if args.serve:
        serve_stage(base, args)
        return

    if not args.decode:
        print("[scale] build stages done; rerun with --decode on the TPU")
        return

    from dint_tpu.tools import decode as dtool

    rec = dtool.decode_stream(
        "single_rect_dint", stream, dict_file, runs=args.runs,
        check_collection=base + ".docs",
    )
    assert rec.get("check") == "ok"
    t = log_stage(
        f"gather decode (timed, full check): {rec['ints_x_sec']} ints/s, "
        f"image {int(rec['plan_bytes'])/(1<<20):.0f} MiB, "
        f"cold_start {rec['cold_start_s']}s", t)

    # the canonical ladder image over the same stream (the at-scale
    # serving winner: ~0.58 vs ~8.5 device B/int — see bench.py), full
    # collection check (every list, every int)
    lrec = dtool.decode_stream(
        "single_rect_dint", stream, dict_file, runs=args.runs,
        check_collection=base + ".docs", engine="ladder",
    )
    assert lrec.get("check") == "ok"
    t = log_stage(
        f"ladder decode (timed, full check): {lrec['ints_x_sec']} ints/s, "
        f"image {int(lrec['plan_bytes'])/(1<<20):.0f} MiB", t)

    print("[scale] OK", rec["ints_x_sec"], "ints/s")


if __name__ == "__main__":
    main()
