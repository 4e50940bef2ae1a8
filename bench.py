"""Headline benchmark: vroom-style raw sequential decode on one TPU chip.

Mirrors BASELINE config 2 ("vroom raw decode: encode/decode docs with
single_rect_dint") on a deterministic synthetic collection (the
reference's bundled .docs/.freqs blobs are absent from the snapshot —
/root/reference/.MISSING_LARGE_BLOBS).  Artifacts (collection, trained
dictionary, encoded stream) are cached under .bench/ with the
reference's create-or-load discipline, so repeat runs only time decode.

Two engines run under the identical chained-salted protocol and the
headline is the fastest one proven exact this run: the Pallas
dictionary-gather serving image (engine=local, ~8.5 device B/int) and
the canonical ladder image (engine=ladder, ~0.58 B/int — full
collection check, every int).  Both rates and the ladder image size
are recorded in the JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by 1.5e9 ints/s — a mid-range estimate of the
reference's single-core CPU DINT decode rate (the repo publishes no
speed numbers; the WSDM'19 paper reports DINT-family decode in the
~1-2 G ints/s range on an i7-7700).  The driver target of >=10x the
reference CPU therefore corresponds to vs_baseline >= 10.
"""

import json
import os
import sys
import time

# The session environment pins JAX_PLATFORMS=axon; fresh processes can
# fail to init that alias — auto-choose instead (lands on the TPU).
if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = ""

# Watchdog: the TPU relay can go down for hours, and a hung device
# init blocks inside native code where no Python signal handler can
# run.  The parent process therefore re-execs itself as a CHILD doing
# the real work and supervises it with a wall-clock budget; on timeout
# it kills the child and prints an honest error line.
_WATCHDOG_SECS = int(os.environ.get("DINT_BENCH_BUDGET_SECS", 20 * 60))

if __name__ == "__main__" and os.environ.get("DINT_BENCH_CHILD") != "1":
    import signal
    import subprocess

    env = dict(os.environ, DINT_BENCH_CHILD="1")
    # New session so the timeout kill reaches the WHOLE process group:
    # a hung chip init spawns the axon relay helper, and an orphaned
    # helper would hold the device (one TPU process at a time) long
    # after the child itself is dead.
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        env=env,
        start_new_session=True,
    )

    def _killpg():
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()
        p.wait()

    try:
        rc = p.wait(timeout=_WATCHDOG_SECS)
    except subprocess.TimeoutExpired:
        _killpg()
        print(
            json.dumps(
                {
                    "metric": "vroom_decode_ints_per_sec_per_chip",
                    "value": 0,
                    "unit": "ints/s",
                    "vs_baseline": 0,
                    "error": "watchdog: TPU unavailable or hung "
                             f"({_WATCHDOG_SECS}s budget)",
                }
            ),
            flush=True,
        )
        sys.exit(3)
    except BaseException:
        # Ctrl-C / SIGTERM on the parent: the child runs in its own
        # session, so the terminal's SIGINT never reaches it — kill the
        # whole child group before re-raising or it would keep holding
        # the device (one TPU process at a time).
        _killpg()
        raise
    # success path outside the try: sys.exit must not trip the
    # BaseException sweep above (ADVICE r2) — the child is already
    # reaped by p.wait.
    sys.exit(rc)

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench")
FORMAT_VERSION = 2  # bump when stream/sidecar formats change (invalidates cache)

NUM_LISTS = 6000
NUM_DOCS = 4_000_000
AVG_LEN = 5000.0
SEED = 2026
# 2000 timed runs chained inside ONE device dispatch: the pallas gather
# kernel is HBM-bandwidth-bound at ~0.22ms per full-stream pass (~76 G
# ints/s steady-state) while the axon relay costs ~23ms fixed per
# dispatch, so the run count sets how much of the steady-state rate the
# metric sees (each chained run is a full, serialized, salted decode —
# nothing overlaps or memoizes; total timed work stays < 1s).
RUNS = 2000
REFERENCE_CPU_INTS_PER_SEC = 1.5e9


def build_artifacts():
    import numpy as np

    from dint_tpu.io import collection, synth

    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, "bench_collection")
    if not os.path.exists(base + ".docs"):
        print("bench: synthesizing collection...", file=sys.stderr)
        docs, freqs = synth.make_collection(
            NUM_LISTS, NUM_DOCS, seed=SEED, avg_len=AVG_LEN
        )
        collection.write_freq_collection(base, docs, freqs, NUM_DOCS)
    stream = os.path.join(CACHE, f"bench.single_rect_dint.v{FORMAT_VERSION}.bin")
    dict_file = os.path.join(
        CACHE, "dict.bench_collection.docs.rectangular.DSF-65536-16"
    )
    if not os.path.exists(stream):
        print("bench: encoding stream (one-time)...", file=sys.stderr)
        from dint_tpu.tools import encode

        encode.encode_collection(
            "single_rect_dint", base + ".docs", stream, cache_dir=CACHE
        )
    return stream, dict_file


def build_multi_artifacts():
    """The bpi-champion config (multi_packed_dint, reference
    README.md:114) — benched alongside the headline so BENCH artifacts
    record both (VERDICT r2 item 3)."""
    base = os.path.join(CACHE, "bench_collection")
    stream = os.path.join(CACHE, f"bench.multi_packed_dint.v{FORMAT_VERSION}.bin")
    dict_file = os.path.join(
        CACHE, "dict.bench_collection.docs.multi_packed.DSF-65536-16"
    )
    if not os.path.exists(stream):
        print("bench: encoding multi stream (one-time)...", file=sys.stderr)
        from dint_tpu.tools import encode

        encode.encode_collection(
            "multi_packed_dint", base + ".docs", stream, cache_dir=CACHE
        )
    return stream, dict_file


def spot_check(stream, dict_file, sample=50, type_name="single_rect_dint"):
    """Decode once through the timed engine and verify a sample of
    lists int-for-int against the source collection — the headline
    number is only reported over a kernel proven exact this run."""
    import numpy as np

    from dint_tpu.index import stream as stream_mod
    from dint_tpu.kernels import decode_local
    from dint_tpu.tools import decode as dtool
    from dint_tpu.utils import gaps as gap_mod
    from dint_tpu.io import collection

    arena, meta = stream_mod.load_stream(stream)
    d = dtool.load_dictionary(type_name, dict_file)
    dec = dtool.StreamDecoder(
        arena, meta, d.decode_view(), type_name == "multi_packed_dint",
        plan_cache=stream + f".plan.v{decode_local.PLAN_VERSION}.npz",
    )
    lists = dec.gather_lists()
    base = os.path.join(CACHE, "bench_collection")
    docs_iter = list(collection.open_freq_collection(base))
    rng = np.random.default_rng(3)
    picks = rng.choice(len(lists), size=min(sample, len(lists)), replace=False)
    for i in picks:
        want = gap_mod.docs_to_gaps(docs_iter[i][0])
        np.testing.assert_array_equal(lists[i], want, err_msg=f"list {i}")
    print(f"bench: spot-check ok ({len(picks)} lists exact)", file=sys.stderr)


def main():
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        stream, dict_file = build_artifacts()
        base = os.path.join(CACHE, "bench_collection")
        from dint_tpu.tools import decode

        rec = decode.decode_stream(
            "single_rect_dint", stream, dict_file, runs=RUNS
        )
        spot_check(stream, dict_file)
        # the canonical ladder image over the same stream (the
        # production serving default at scale: ~0.58 vs ~8.5 device
        # B/int): timed under the identical chained protocol, verified
        # against the FULL collection (every list, every int) — the
        # headline is the fastest engine proven exact this run.
        ladder_rate = ladder_bpi = None
        try:
            lrec = decode.decode_stream(
                "single_rect_dint", stream, dict_file, runs=RUNS,
                check_collection=base + ".docs", engine="ladder",
            )
            assert lrec.get("check") == "ok"
            ladder_rate = float(lrec["ints_x_sec"])
            ladder_bpi = (int(lrec["plan_bytes"])
                          / float(lrec["num_integers"]))
        except Exception as e:  # noqa: BLE001
            print(f"bench: ladder leg failed: {e!r}", file=sys.stderr)
        # bpi-champion config (recorded, not the driver metric):
        # failures here must not zero the headline.  Both engines run —
        # the gather image (DINT-semantics A/B partner) and the ladder
        # image (the serving default, full collection check) — and the
        # reported multi rate is the fastest one proven exact.
        multi_rate = multi_gather_rate = None
        try:
            mstream, mdict = build_multi_artifacts()
            mrec = decode.decode_stream(
                "multi_packed_dint", mstream, mdict, runs=RUNS
            )
            spot_check(mstream, mdict, type_name="multi_packed_dint")
            multi_gather_rate = float(mrec["ints_x_sec"])
            multi_rate = multi_gather_rate
            mlrec = decode.decode_stream(
                "multi_packed_dint", mstream, mdict, runs=RUNS,
                check_collection=base + ".docs", engine="ladder",
            )
            assert mlrec.get("check") == "ok"
            multi_rate = max(multi_rate, float(mlrec["ints_x_sec"]))
        except Exception as e:  # noqa: BLE001
            print(f"bench: multi_packed leg failed: {e!r}", file=sys.stderr)
        # pure HBM store-bandwidth probe (kernels/store_probe.py): the
        # wall for ANY engine that materializes u32 output, measured
        # under the identical chained-salted protocol.  The bench-size
        # decode rate rides on-chip/relay residency of its small
        # working set; this probe is the honest context for it, and the
        # at-scale number (scale_rate below) is the HBM-resident truth.
        store_gbps = None
        try:
            from dint_tpu.kernels import store_probe

            out_bytes = int(float(rec["num_integers"])) * 4
            store_gbps = store_probe.probe_store_gbps(
                total_bytes=out_bytes, runs=RUNS)
        except Exception as e:  # noqa: BLE001
            print(f"bench: store probe failed: {e!r}", file=sys.stderr)
    local_rate = float(rec["ints_x_sec"])
    ints_per_sec = max(local_rate, ladder_rate or 0.0)
    n_ints = float(rec["num_integers"])

    def eff_gbps(rate, plan_bytes):
        # effective traffic per decoded int: image read + 4 B output
        # write (the metric's meaning: vroom_env/decode.cpp:74-92 —
        # one full serialized decode per chained run)
        return round(rate * (plan_bytes / n_ints + 4.0) / 1e9, 1)

    scale_rate = None
    scale_file = os.path.join(REPO, "bench_artifacts", "scale_908M.json")
    if os.path.exists(scale_file):
        with open(scale_file) as f:
            scale_rate = float(json.load(f)["ladder"]["ints_per_s"])
    out = {
        "metric": "vroom_decode_ints_per_sec_per_chip",
        "value": ints_per_sec,
        "unit": "ints/s",
        "vs_baseline": ints_per_sec / REFERENCE_CPU_INTS_PER_SEC,
        # bench_rate = this 16.7M-int stream (partially on-chip/relay
        # resident); scale_rate = the committed 908M-posting HBM-
        # resident measurement (bench_artifacts/scale_908M.json, full
        # collection check) — the serving-scale headline
        "bench_rate": ints_per_sec,
        "scale_rate": scale_rate,
        "gather_engine_ints_per_sec": local_rate,
        "gather_image_B_per_int": round(
            int(rec["plan_bytes"]) / float(rec["num_integers"]), 3),
        "gather_effective_GBps": eff_gbps(
            local_rate, int(rec["plan_bytes"])),
        # time-to-first-int (one-time plan/transcode; the reference's
        # cold mmap decode has zero prep — this tracks the gap)
        "gather_cold_start_s": float(rec.get("cold_start_s", 0)),
    }
    if store_gbps is not None:
        out["store_GBps_probe"] = round(store_gbps, 1)
        # output-write-only bound implied by the probe
        out["store_wall_ints_per_sec"] = round(store_gbps * 1e9 / 4.0)
    if scale_rate is not None:
        out["scale_vs_baseline"] = scale_rate / REFERENCE_CPU_INTS_PER_SEC
    if ladder_rate is not None:
        out["ladder_engine_ints_per_sec"] = ladder_rate
        out["ladder_image_B_per_int"] = round(ladder_bpi, 3)
        out["ladder_cold_start_s"] = float(lrec.get("cold_start_s", 0))
        out["ladder_effective_GBps"] = eff_gbps(
            ladder_rate, int(lrec["plan_bytes"]))
    if multi_rate is not None:
        out["multi_packed_ints_per_sec"] = multi_rate
        out["multi_packed_vs_baseline"] = (
            multi_rate / REFERENCE_CPU_INTS_PER_SEC
        )
        out["multi_packed_gather_ints_per_sec"] = multi_gather_rate
    print(json.dumps(out))


if __name__ == "__main__":
    main()
