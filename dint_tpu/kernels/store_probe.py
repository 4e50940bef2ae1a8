"""Pure HBM store-bandwidth probe (VERDICT r4 weak #2).

Every decode engine here materializes u32 output, so the speed-of-light
for "decoded ints/s" is bounded by how fast the chip can WRITE the
output array alone.  This probe measures exactly that under the same
chained-salted protocol as the decode benchmarks (bench.py): a Pallas
kernel whose only work is writing a salt-derived pattern over an
output array of the requested size, chained `runs` times inside one
dispatch with a value-cancelling salt fed from a tiny dependent read
of the previous output (the runtime memoizes identical executions and
completes work lazily — CLAUDE.md environment rules).

The reported GB/s beside a decode rate answers "how close to the
store wall is this engine": ints/s * 4 B / store_GBps = fraction of
pure-store speed-of-light spent on output writes alone.

Anchor for the metric's meaning: the reference's vroom decode loop
reports ns/int over a decode that writes the same u32 output
(/root/reference/vroom_env/decode.cpp:74-92).
"""

from __future__ import annotations

import functools
import time


ROW_LANES = 256


@functools.lru_cache(maxsize=None)
def _probe_fns(R: int, rt: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(salt_ref, out_ref):
        i = pl.program_id(0)
        # write-only tile: a cheap VPU pattern involving the salt (the
        # value must depend on the salt so chained runs are distinct
        # executions; no reads besides the SMEM scalar)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rt, ROW_LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rt, ROW_LANES), 0)
        out_ref[...] = lane + row * 7 + salt_ref[0] + i

    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        kernel,
        grid=(R // rt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rt, ROW_LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, ROW_LANES), jnp.int32),
    )

    @functools.partial(jax.jit, static_argnames=("runs",))
    def chain(*, runs: int):
        def body(salt, _):
            out = call(salt[None])
            # tiny dependent read sequences the chain without re-reading
            # the whole output (the slice-feed flavor bench decode uses
            # for large plans)
            nxt = jnp.sum(out[:128, :], dtype=jnp.int32) + salt + 1
            return nxt, None

        salt, _ = jax.lax.scan(body, jnp.int32(1), None, length=runs)
        return salt

    return chain


def probe_store_gbps(total_bytes: int = 64 << 20, runs: int = 2000,
                     row_tile: int = 1024) -> float:
    """Measured pure-store bandwidth in GB/s for an output of
    ``total_bytes`` (default 64 MiB = the bench stream's output size
    class), chained ``runs`` times in one dispatch."""
    import numpy as np

    R = max(total_bytes // (4 * ROW_LANES), row_tile)
    R = (R // row_tile) * row_tile
    chain = _probe_fns(R, row_tile)
    chain(runs=2)  # compile + warm
    t0 = time.perf_counter()
    out = chain(runs=runs)
    np.asarray(out)  # force completion with a host fetch
    dt = time.perf_counter() - t0
    bytes_written = R * ROW_LANES * 4 * runs
    return bytes_written / dt / 1e9
