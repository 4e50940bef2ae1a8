"""Pallas fused decode kernel vs the XLA kernel (bit-exactness gate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dint_tpu.codecs import dint
from dint_tpu.kernels import decode_local, decode_pallas
from tests.test_batch_encode_decode import setup  # noqa: F401


def _plan_for(view, lists):
    bufs = [dint.encode_opt_single(view_lt, g) for view_lt, g in lists]
    raise NotImplementedError


def test_pallas_matches_xla_kernel(setup):  # noqa: F811
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

    def pad(a, fill=0):
        if a.shape[0] == padR:
            return a
        p = np.full((padR - a.shape[0],) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, p])

    tokens = pad(plan.tokens)
    meta = pad(plan.meta)
    table = pad(plan.table)
    out_n = pad(plan.out_n)
    # host-side position-indexed meta (what the engine ships)
    meta_pos = np.take_along_axis(meta, tokens, axis=1).astype(np.int32)

    for salt in (0, 7, 0x9E3779B9):
        want = np.asarray(
            decode_local.decode_local_rows(
                jnp.asarray(tokens), jnp.asarray(meta), jnp.asarray(table),
                jnp.asarray(out_n), jnp.uint32(salt),
            )
        )
        got = np.asarray(
            decode_pallas.decode_rows_pallas(
                jnp.asarray(meta_pos),
                jnp.asarray(table.view(np.int32)),
                jnp.asarray(out_n),
                jnp.uint32(salt),
                interpret=True,
            )
        ).view(np.uint32)
        np.testing.assert_array_equal(got, want, err_msg=f"salt={salt}")
