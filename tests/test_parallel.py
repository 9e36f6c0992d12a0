"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest


def test_eight_virtual_devices():
    import jax

    assert jax.device_count() >= 8


def test_sharded_align_step():
    import jax.numpy as jnp

    from lesv_tpu.config import AlignConfig
    from lesv_tpu.parallel.mesh import make_mesh, sharded_align_step
    from lesv_tpu.sim import mutate_read

    mesh = make_mesh(8)
    B, Q, S, W = 16, 64, 128, 64
    rng = np.random.default_rng(0)
    s = rng.integers(0, 4, (B, S), dtype=np.uint8)
    q = np.zeros((B, Q), np.uint8)
    qlen = np.zeros(B, np.int32)
    for i in range(B):
        m = mutate_read(rng, s[i, :Q], err=0.05)[:Q]
        q[i, : len(m)] = m
        qlen[i] = len(m)
    slen = np.minimum(qlen + 8, S - 1)
    step = sharded_align_step(mesh, W, "diag", AlignConfig())
    score, end_b, ok, n_ok, total = step(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen), jnp.asarray(slen))
    assert int(n_ok) == B
    assert int(total) == int(np.where(np.asarray(ok), np.asarray(score), 0).sum())


def test_graft_entry():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.asarray(out[2]).all(), "all example lanes must align"


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
