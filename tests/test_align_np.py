"""Alignment-engine oracle tests: banded DP vs brute-force full DP."""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_np import (
    OP_D,
    OP_I,
    OP_M,
    banded_global_align,
    expand_ops,
    global_align_bruteforce,
)
from lesv_tpu.sim import mutate_read


def _score_of(ops, q, s, cfg):
    """Recompute score from an op path (affine, best of the two gap costs
    per run)."""
    sc = 0
    qi = si = 0
    i = 0
    ops = list(ops)
    n = len(ops)
    while i < n:
        op = ops[i]
        j = i
        while j < n and ops[j] == op:
            j += 1
        run = j - i
        if op == OP_M:
            for _ in range(run):
                sc += cfg.match if q[qi] == s[si] else -cfg.mismatch
                qi += 1
                si += 1
        else:
            sc -= min(cfg.gap_open1 + run * cfg.gap_ext1,
                      cfg.gap_open2 + run * cfg.gap_ext2)
            if op == OP_I:
                qi += run
            else:
                si += run
        i = j
    return sc


@pytest.mark.parametrize("seed", range(5))
def test_banded_matches_bruteforce_small(seed):
    rng = np.random.default_rng(seed)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 60).astype(np.uint8)
    q = mutate_read(rng, s, err=0.15)
    gold = global_align_bruteforce(q, s, cfg)
    got = banded_global_align(q, s, band=200, cfg=cfg)
    assert got is not None
    gold.validate(q, s)
    got.validate(q, s)
    assert got.score == gold.score
    # and the op path must actually achieve that score
    assert _score_of(got.ops, q, s, cfg) == got.score


def test_banded_with_long_gap():
    """A 40bp deletion: dual-affine must keep it one gap run."""
    rng = np.random.default_rng(7)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 200).astype(np.uint8)
    q = np.concatenate([s[:80], s[120:]])  # 40bp deletion
    gold = global_align_bruteforce(q, s, cfg)
    got = banded_global_align(q, s, band=120, cfg=cfg)
    assert got is not None and got.score == gold.score
    # one deletion run of length 40
    runs = []
    i = 0
    ops = list(got.ops)
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        runs.append((ops[i], j - i))
        i = j
    dels = [r for op, r in runs if op == OP_D]
    assert dels == [40]


def test_banded_with_insertion():
    rng = np.random.default_rng(9)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 200).astype(np.uint8)
    ins = rng.integers(0, 4, 55).astype(np.uint8)
    q = np.concatenate([s[:100], ins, s[100:]])
    gold = global_align_bruteforce(q, s, cfg)
    got = banded_global_align(q, s, band=140, cfg=cfg)
    assert got is not None and got.score == gold.score
    ins_runs = []
    i = 0
    ops = list(got.ops)
    while i < len(ops):
        j = i
        while j < len(ops) and ops[j] == ops[i]:
            j += 1
        if ops[i] == OP_I:
            ins_runs.append(j - i)
        i = j
    assert 55 in ins_runs


@pytest.mark.parametrize("seed", range(3))
def test_banded_medium_noisy(seed):
    rng = np.random.default_rng(100 + seed)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 500).astype(np.uint8)
    q = mutate_read(rng, s, err=0.12)
    gold = global_align_bruteforce(q, s, cfg)
    got = banded_global_align(q, s, band=160, cfg=cfg)
    assert got is not None
    got.validate(q, s)
    assert got.score == gold.score


def test_expand_ops_strings():
    q = np.array([0, 1, 2, 3], np.uint8)  # ACGT
    s = np.array([0, 2, 3], np.uint8)     # A GT
    ops = np.array([OP_M, OP_I, OP_M, OP_M], np.uint8)
    dq, ds = expand_ops(ops, q, s, 0, 0)
    assert dq == "ACGT" and ds == "A-GT"
