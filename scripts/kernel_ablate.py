"""Ablation harness for the local decode kernel (real-TPU timings).

Loads the cached bench serving plan and times decode-kernel variants
with the chained-salt + fetch-forced discipline (see
tools/decode.py::timed_runs for why: the runtime memoizes identical
executions and completes work lazily).  Every variant is checked
bit-exact against the shipping engine before it is timed.

Historical variants (one-hot orientation, int8 planes, radix splits,
band-selector Pallas) live in git history; current set:

  v_ship    the shipping XLA engine (scan of transposed int8 one-hot
            gather tiles over hosted vidx)
  v_pallas  the fused Pallas gather (decode_pallas.decode_gather_pallas)

Usage:  python scripts/kernel_ablate.py [--runs 20] [--variants ...]

NOTE: do NOT launch with PYTHONPATH=/root/repo — the env var is
inherited by the axon TPU relay's helper process and breaks chip init
(silent CPU fallback).  sys.path.insert is process-local.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dint_tpu.kernels import decode_local as dl  # noqa: E402
from dint_tpu.kernels.decode_local import N_OUT, TABLE_CLS  # noqa: E402
from dint_tpu.utils import jaxcfg  # noqa: E402

PLAN = "/root/repo/.bench/bench.single_rect_dint.v2.bin.plan.v2.npz"


def chained_runs(fn, runs):
    """Timed salted chain; returns seconds per run."""
    outs = fn(jnp.uint32(1))
    salt = (jnp.ravel(outs)[0] & jnp.uint32(1)) + jnp.uint32(2)
    _ = int(np.asarray(salt))
    t0 = time.perf_counter()
    salt = jnp.uint32(1)
    for k in range(runs):
        outs = fn(salt)
        salt = (jnp.ravel(outs)[0] & jnp.uint32(1)) + jnp.uint32(k + 1)
    _ = int(np.asarray(salt))
    return (time.perf_counter() - t0) / runs


def time_ship(eng, ref, total, runs):
    dt = chained_runs(lambda s: eng.decode_all(s), runs)
    print(f"{'v_ship':14s} {dt*1e3:8.2f} ms/run  "
          f"{total/dt/1e9:6.3f} G ints/s")


def time_pallas(eng, ref, total, runs):
    from dint_tpu.kernels import decode_pallas as dp

    # build plan-order arrays directly (the engine now stores split
    # width-class device arrays); the legacy fused variants take
    # i32/u32 arrays
    from dint_tpu.kernels import decode_local as dl

    plan = eng.plan
    vidx = dl.plan_to_vidx(plan).astype(np.int32)
    table = plan.table.view(np.int32)
    n = plan.out_n.astype(np.int32)
    R = vidx.shape[0]
    RB = dp.ROW_BLOCK
    padR = ((R + RB - 1) // RB) * RB
    if padR != R:
        def z(a):
            pad = np.zeros((padR - R,) + a.shape[1:], a.dtype)
            return np.concatenate([a, pad])
        vidx, table, n = z(vidx), z(table), z(n)
    vi = jnp.asarray(vidx)
    tbl = jnp.asarray(table.view(np.int32))
    nn = jnp.asarray(n)

    for label, fn in (("v_pallas", dp.decode_gather_pallas),
                      ("v_pallas_grid", dp.decode_gather_pallas_grid)):
        got = np.asarray(
            fn(vi, tbl, nn, jnp.uint32(0))
        ).view(np.uint32)[: ref.size // N_OUT].reshape(ref.shape)
        if not np.array_equal(got, ref):
            bad = np.argwhere(got != ref)
            print(f"{label}: MISMATCH at {bad[:3]}")
            continue
        dt = chained_runs(lambda s, f=fn: f(vi, tbl, nn, s), runs)
        print(f"{label:14s} {dt*1e3:8.2f} ms/run  "
              f"{total/dt/1e9:6.3f} G ints/s  EXACT")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--variants", default="v_ship,v_pallas")
    ap.add_argument("--plan", default=PLAN)
    args = ap.parse_args()

    jaxcfg.enable_compile_cache()
    assert jax.default_backend() == "tpu", (
        f"ablation must run on the TPU, got {jax.default_backend()} "
        "(is another process holding the chip?)"
    )
    plan = dl.load_plan(args.plan)
    assert plan is not None, f"no plan at {args.plan}"
    eng = dl.LocalDecodeEngine(plan)
    total = eng.total_ints()
    print(f"rows={plan.rows} row_tile={eng.row_tile} ints={total}")

    # plan-order reference via the portable XLA gather (the engine's
    # decode_all is in class-permuted engine order)
    vidx = dl.plan_to_vidx(plan).astype(np.uint8).view(np.int8)
    import jax.numpy as jnp
    ref = np.asarray(
        dl._decode_flat_xla(
            jnp.asarray(vidx), jnp.asarray(plan.table),
            jnp.asarray(plan.out_n.astype(np.int32)[:, None]), jnp.uint32(0),
        )
    ).reshape(-1, N_OUT)

    for name in args.variants.split(","):
        dict(v_ship=time_ship, v_pallas=time_pallas)[name](
            eng, ref, total, args.runs
        )


if __name__ == "__main__":
    main()
