"""Device kernel vs numpy oracle: scores and op paths must agree."""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_jax import (
    OP_PAD,
    banded_align_batch,
    diagonal_guide,
    linear_guide,
)
from lesv_tpu.ops.align_np import (
    banded_global_align,
    extension_align,
    global_align_bruteforce,
)
from lesv_tpu.sim import mutate_read


def _pack_batch(pairs, Qmax, Smax, W, guide_fn):
    B = len(pairs)
    q = np.zeros((B, Qmax), np.uint8)
    s = np.zeros((B, Smax), np.uint8)
    qlen = np.zeros(B, np.int32)
    slen = np.zeros(B, np.int32)
    guide = np.zeros((B, Qmax + 1), np.int32)
    for i, (qi, si) in enumerate(pairs):
        q[i, : len(qi)] = qi
        s[i, : len(si)] = si
        qlen[i] = len(qi)
        slen[i] = len(si)
        guide[i] = guide_fn(len(qi), len(si), Qmax, W)
    return q, s, qlen, slen, guide


@pytest.mark.parametrize("seed", range(4))
def test_kernel_matches_oracle_global(seed):
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
    out = _run(pairs, Qmax, Smax, W, cfg)
    for i, (q, s) in enumerate(pairs):
        gold = global_align_bruteforce(q, s, cfg)
        assert out["ok"][i], f"lane {i} failed"
        assert out["score"][i] == gold.score, (i, out["score"][i], gold.score)
        ops = out["ops"][i][: out["nops"][i]]
        assert (ops != OP_PAD).all()
        # op path consumes exactly q and s
        assert (ops != 2).sum() == len(q)
        assert (ops != 1).sum() == len(s)


def _run(pairs, Qmax, Smax, W, cfg, free_end=False,
         guide_fn=None):
    guide_fn = guide_fn or (lambda ql, sl, Q, W_: linear_guide(ql, sl, Q, W_))
    q, s, qlen, slen, guide = _pack_batch(pairs, Qmax, Smax, W, guide_fn)
    return banded_align_batch(q, s, qlen, slen, guide, W, cfg,
                              free_end=free_end)


def test_kernel_long_gap():
    rng = np.random.default_rng(11)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 300).astype(np.uint8)
    q = np.concatenate([s[:100], s[200:]])  # 100bp DEL
    W = 256
    out = _run([(q, s)], len(q), len(s), W, cfg)
    gold = global_align_bruteforce(q, s, cfg)
    assert out["ok"][0] and out["score"][0] == gold.score
    ops = out["ops"][0][: out["nops"][0]]
    # one 100-long deletion run
    from lesv_tpu.ops.cigar import op_runs

    opv, lens = op_runs(ops)
    assert list(lens[opv == 2]) == [100]


def test_kernel_matches_banded_oracle_mixed_lengths():
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
    out = _run(pairs, Qmax, Smax, W, cfg)
    for i, (q, s) in enumerate(pairs):
        gold = banded_global_align(q, s, W, cfg=cfg)
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
        # query matches only the first 300 bases, then diverges
        q = np.concatenate([
            mutate_read(rng, s[:300], err=0.1),
            rng.integers(0, 4, 150).astype(np.uint8),
        ])
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    out = _run(pairs, Qmax, Smax, W, cfg, free_end=True,
               guide_fn=lambda ql, sl, Q, W_: diagonal_guide(ql, sl, Q, W_))
    for i, (q, s) in enumerate(pairs):
        gold = extension_align(q, s, W, cfg=cfg)
        assert gold is not None and out["ok"][i]
        assert out["score"][i] == gold.score
        assert out["qe"][i] == gold.qe and out["se"][i] == gold.se
