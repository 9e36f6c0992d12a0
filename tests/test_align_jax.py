"""Device kernel vs numpy oracle: scores and op paths must agree."""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_jax import (
    OP_PAD,
    banded_align_batch,
    guide_of,
)
from lesv_tpu.ops.align_np import (
    banded_global_align,
    extension_align,
    global_align_bruteforce,
)
from lesv_tpu.sim import mutate_read


def _run(pairs, Qmax, Smax, W, mode, cfg, free_end=False):
    B = len(pairs)
    q = np.zeros((B, Qmax), np.uint8)
    s = np.zeros((B, Smax), np.uint8)
    qlen = np.zeros(B, np.int32)
    slen = np.zeros(B, np.int32)
    for i, (qi, si) in enumerate(pairs):
        q[i, : len(qi)] = qi
        s[i, : len(si)] = si
        qlen[i] = len(qi)
        slen[i] = len(si)
    return banded_align_batch(q, s, qlen, slen, W, mode, cfg,
                              free_end=free_end)


@pytest.mark.parametrize("mode", ["diag", "full"])
@pytest.mark.parametrize("seed", range(3))
def test_kernel_matches_bruteforce(seed, mode):
    rng = np.random.default_rng(seed)
    cfg = AlignConfig()
    W = 128
    pairs = []
    for _ in range(6):
        n = int(rng.integers(40, 120))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.15)
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    if mode == "full":
        W = 128
        assert all(len(s) + 1 <= W for _, s in pairs)
    out = _run(pairs, Qmax, Smax, W, mode, cfg)
    for i, (q, s) in enumerate(pairs):
        gold = global_align_bruteforce(q, s, cfg)
        assert out["ok"][i], f"lane {i} failed"
        assert out["score"][i] == gold.score, (i, out["score"][i], gold.score)
        ops = out["ops"][i][: out["nops"][i]]
        assert (ops != OP_PAD).all()
        assert (ops != 2).sum() == len(q)
        assert (ops != 1).sum() == len(s)


def test_kernel_full_mode_long_deletion():
    """Asymmetric DEL segment: 100bp query vs 2100bp subject window."""
    rng = np.random.default_rng(11)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 2100).astype(np.uint8)
    q = np.concatenate([s[:50], s[2050:]])  # 2000bp DEL
    out = _run([(q, s)], 128, 4096, 4096, "full", cfg)
    assert out["ok"][0]
    ops = out["ops"][0][: out["nops"][0]]
    from lesv_tpu.ops.cigar import op_runs

    opv, lens = op_runs(ops)
    assert 2000 in list(lens[opv == 2])


def test_kernel_diag_matches_np_guide():
    """diag mode == np oracle with the unclipped diagonal guide."""
    rng = np.random.default_rng(5)
    cfg = AlignConfig()
    W = 128
    pairs = []
    for _ in range(8):
        n = int(rng.integers(100, 400))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.1)
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    out = _run(pairs, Qmax, Smax, W, "diag", cfg)
    for i, (q, s) in enumerate(pairs):
        guide = np.arange(len(q) + 1) - W // 2
        gold = banded_global_align(q, s, W, guide=guide, cfg=cfg)
        assert gold is not None and out["ok"][i]
        assert out["score"][i] == gold.score
        ops = out["ops"][i][: out["nops"][i]]
        assert np.array_equal(ops, gold.ops), f"lane {i} path mismatch"


def test_kernel_free_end_matches_extension_oracle():
    rng = np.random.default_rng(21)
    cfg = AlignConfig()
    W = 128
    pairs = []
    for _ in range(4):
        s = rng.integers(0, 4, 500).astype(np.uint8)
        q = np.concatenate([
            mutate_read(rng, s[:300], err=0.1),
            rng.integers(0, 4, 150).astype(np.uint8),
        ])
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    out = _run(pairs, Qmax, Smax, W, "diag", cfg, free_end=True)
    for i, (q, s) in enumerate(pairs):
        gold = extension_align(q, s, W, cfg=cfg)
        assert gold is not None and out["ok"][i]
        assert out["score"][i] == gold.score
        assert out["qe"][i] == gold.qe and out["se"][i] == gold.se


def test_align_pairs_wrapper():
    from lesv_tpu.ops.align_batch import align_pairs

    rng = np.random.default_rng(3)
    cfg = AlignConfig()
    pairs = []
    golds = []
    for _ in range(10):
        n = int(rng.integers(60, 900))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.12)
        pairs.append((q, s))
        golds.append(None)
    # add an asymmetric deletion segment
    s = rng.integers(0, 4, 1500).astype(np.uint8)
    q = np.concatenate([s[:60], s[1440:]])
    pairs.append((q, s))
    out = align_pairs(pairs, cfg)
    for i, ((q, s), a) in enumerate(zip(pairs, out)):
        assert a is not None, i
        a.validate(q, s)
        assert a.qe == len(q) and a.se == len(s)


def test_traceback_device_matches_host():
    """The device-side traceback scan (align_jax.traceback_device) must
    reproduce the host traceback walk bit for bit on random fills."""
    import jax
    import jax.numpy as jnp

    from lesv_tpu.ops.align_jax import (
        banded_align_kernel,
        traceback_batch,
        traceback_device,
    )

    rng = np.random.default_rng(13)
    cfg = AlignConfig()
    for mode, W, free_end in [("diag", 64, False), ("full", 128, False),
                              ("diag", 64, True)]:
        B, Qmax = 8, 192
        Smax = Qmax + W if mode == "diag" else W - 1
        q = np.zeros((B, Qmax), np.uint8)
        s = np.zeros((B, Smax), np.uint8)
        qlen = np.zeros(B, np.int32)
        slen = np.zeros(B, np.int32)
        for i in range(B):
            ls = int(rng.integers(40, Smax))
            si = rng.integers(0, 4, ls, dtype=np.uint8)
            qi = mutate_read(rng, si, err=0.15)[: Qmax]
            q[i, : len(qi)] = qi
            s[i, : ls] = si
            qlen[i] = len(qi)
            slen[i] = ls
        dirs, score, end_i, end_b, ok = jax.jit(
            lambda a, b, c, d: banded_align_kernel(
                a, b, c, d, W, mode, cfg, free_end=free_end)
        )(jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen),
          jnp.asarray(slen))
        dirs_np = np.asarray(dirs)
        end_i_np = np.asarray(end_i)
        end_b_np = np.asarray(end_b)
        ok_np = np.asarray(ok)
        h_ops, h_n, h_reach = traceback_batch(
            dirs_np, end_i_np, end_b_np, ok_np, W, mode, layout="lane")
        T = dirs_np.shape[1] + W + 2
        d_ops, d_n, d_reach = jax.jit(
            lambda dd, ei, eb, okv: traceback_device(
                dd, ei, eb, okv, W, mode, "lane", T)
        )(dirs, end_i, end_b, ok)
        d_ops = np.asarray(d_ops)
        d_n = np.asarray(d_n)
        d_reach = np.asarray(d_reach)
        assert (h_reach == d_reach).all(), (mode, W, free_end)
        for b in range(B):
            if not h_reach[b]:
                continue
            n = int(h_n[b])
            assert int(d_n[b]) == n, (mode, b)
            assert (h_ops[b, :n] == d_ops[b, :n]).all(), (mode, b)
