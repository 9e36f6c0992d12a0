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


def test_multi_device_fill_dispatch():
    """align_pairs round-robins fill chunks over all local devices and
    the dispatch/finish split is bit-identical to the host oracle."""
    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops import align_batch as ab

    assert len(ab._fill_devices()) >= 8
    rng = np.random.default_rng(3)
    pairs = []
    for _ in range(24):
        n = int(rng.integers(150, 700))
        q = rng.integers(0, 4, n).astype(np.uint8)
        s = q.copy()
        mut = rng.random(n) < 0.08
        s[mut] = (s[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        pairs.append((q, s))
    cfg = AlignConfig()
    for free_end in (False, True):
        dev = ab._align_pairs_jax(pairs, cfg, free_end)
        ora = ab._align_pairs_np(pairs, cfg, free_end)
        for a, b in zip(dev, ora):
            assert (a is None) == (b is None)
            if a is not None:
                assert a.score == b.score


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


def test_sharded_seed_chain_step():
    """The mesh-sharded seeding + chain-DP step (replicated index, reads
    sharded) chains every phase-aligned exact read on an 8-device mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
