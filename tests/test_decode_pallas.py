"""Pallas fused gather kernel vs the XLA engine (bit-exactness gate)."""

import jax.numpy as jnp
import numpy as np

from dint_tpu.codecs import dint
from dint_tpu.kernels import decode_local, decode_pallas
from tests.test_batch_encode_decode import setup  # noqa: F401


def test_pallas_gather_matches_xla(setup):  # noqa: F811
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    rng = np.random.default_rng(33)
    lists = [g for g in gap_lists if 0 < len(g) <= 3000][:12]
    for _ in range(3):
        n = int(rng.integers(40, 800))
        g = rng.integers(0, 1 << 22, n).astype(np.uint32)
        g[rng.random(n) < 0.3] = 0
        lists.append(g)
    # run-heavy list (exercises 16-zero entries)
    lists.append(
        np.where(rng.random(5000) < 0.8, 0, rng.integers(0, 300, 5000))
        .astype(np.uint32)
    )
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
        [16] * len(bufs), view,
    )
    R = plan.rows
    RB = decode_pallas.ROW_BLOCK
    padR = ((R + RB - 1) // RB) * RB

    def pad(a):
        if a.shape[0] == padR:
            return a
        z = np.zeros((padR - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, z])

    vidx = pad(decode_local.plan_to_vidx(plan))
    table = pad(plan.table)
    out_n = pad(plan.out_n)

    for salt in (0, 7, 0x9E3779B9):
        want = np.asarray(
            decode_local.decode_gather_rows(
                jnp.asarray(vidx), jnp.asarray(table), jnp.asarray(out_n),
                jnp.uint32(salt),
            )
        )
        got = np.asarray(
            decode_pallas.decode_gather_pallas(
                jnp.asarray(vidx), jnp.asarray(table.view(np.int32)),
                jnp.asarray(out_n), jnp.uint32(salt), interpret=True,
            )
        ).view(np.uint32)
        np.testing.assert_array_equal(got, want, err_msg=f"salt={salt}")


def test_lane_gather_kernel_interpret(setup):  # noqa: F811
    """The shipping VPU lane-gather kernel (decode_local._pallas_gather_
    kernel) vs the one-hot XLA formulation, in interpret mode on CPU."""
    gap_lists, ds, _ = setup
    lt = ds.lookup_table()
    view = ds.decode_view()
    lists = [g for g in gap_lists if 0 < len(g) <= 2000][:8]
    bufs = [dint.encode_opt_single(lt, g) for g in lists]
    starts = np.cumsum([0] + [len(b) for b in bufs])[:-1]
    arena = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ns = [len(g) for g in lists]
    plan = decode_local.plan_stream(
        arena, starts, [len(b) for b in bufs], ns, [0] * len(bufs),
        [16] * len(bufs), view,
    )
    rt = 32
    padR = -(-plan.rows // rt) * rt

    def pad(a):
        if a.shape[0] == padR:
            return a
        z = np.zeros((padR - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, z])

    vidx = pad(decode_local.plan_to_vidx(plan))
    table = pad(plan.table)
    out_n = pad(plan.out_n)
    vidx8 = jnp.asarray(vidx.astype(np.uint8).view(np.int8))
    tab_i32 = jnp.asarray(table.view(np.int32))
    n2 = jnp.asarray(out_n.astype(np.int32)[:, None])
    decode, _ = decode_local._pallas_decode_fns(padR, rt, interpret=True)
    for salt in (0, 13, 0xDEADBEEF):
        want = np.asarray(
            decode_local.decode_gather_rows(
                jnp.asarray(vidx), jnp.asarray(table), jnp.asarray(out_n),
                jnp.uint32(salt),
            )
        )
        got = np.asarray(decode(vidx8, tab_i32, n2, jnp.uint32(salt)))
        np.testing.assert_array_equal(got, want, err_msg=f"salt={salt}")
