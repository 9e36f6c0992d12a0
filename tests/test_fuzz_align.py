"""Property/fuzz tests: the alignment engine must uphold the reference's
runtime invariants (SURVEY §3.5) on adversarial inputs — every returned
alignment consumes exactly its spans (validate_aligned_string), op paths
reproduce their scores, ends are 8bp exact matches after trimming."""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_batch import align_pairs
from lesv_tpu.ops.align_np import OP_M
from lesv_tpu.ops.anchored import anchored_extend
from lesv_tpu.ops.cigar import match_mask
from lesv_tpu.ops.pairseed import pair_chains
from lesv_tpu.sim import mutate_read


def _random_pair(rng):
    kind = rng.integers(0, 6)
    n = int(rng.integers(1, 800))
    s = rng.integers(0, 4, n).astype(np.uint8)
    if kind == 0:      # clean copy
        q = s.copy()
    elif kind == 1:    # noisy
        q = mutate_read(rng, s, err=float(rng.uniform(0.02, 0.25)))
    elif kind == 2:    # big deletion
        cut = int(rng.integers(0, n))
        cut2 = int(rng.integers(cut, n))
        q = np.concatenate([s[:cut], s[cut2:]])
    elif kind == 3:    # big insertion
        ins = rng.integers(0, 4, int(rng.integers(1, 500))).astype(np.uint8)
        at = int(rng.integers(0, n))
        q = np.concatenate([s[:at], ins, s[at:]])
    elif kind == 4:    # unrelated
        q = rng.integers(0, 4, int(rng.integers(1, 400))).astype(np.uint8)
    else:              # tiny
        q = s[: int(rng.integers(1, 5))].copy()
    return q, s


@pytest.mark.parametrize("seed", range(3))
def test_align_pairs_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = AlignConfig()
    pairs = [_random_pair(rng) for _ in range(30)]
    pairs = [(q, s) for q, s in pairs if len(q) and len(s)]
    outs = align_pairs(pairs, cfg)
    for (q, s), a in zip(pairs, outs):
        if a is None:
            continue
        a.validate(q, s)
        # op path must achieve the reported score (affine best-of-two)
        sc = 0
        i = 0
        ops = a.ops
        qi, si = a.qb, a.sb
        n = len(ops)
        while i < n:
            j = i
            while j < n and ops[j] == ops[i]:
                j += 1
            run = j - i
            if ops[i] == OP_M:
                for t in range(run):
                    sc += cfg.match if q[qi + t] == s[si + t] else -cfg.mismatch
                qi += run
                si += run
            else:
                sc -= min(cfg.gap_open1 + run * cfg.gap_ext1,
                          cfg.gap_open2 + run * cfg.gap_ext2)
                if ops[i] == 1:
                    qi += run
                else:
                    si += run
            i = j
        assert sc == a.score, (len(q), len(s), sc, a.score)


@pytest.mark.parametrize("seed", range(2))
def test_anchored_fuzz_invariants(seed):
    rng = np.random.default_rng(2000 + seed)
    cfg = AlignConfig()
    for _ in range(8):
        n = int(rng.integers(2_000, 8_000))
        s = rng.integers(0, 4, n).astype(np.uint8)
        # random structural edit
        if rng.integers(0, 2):
            cut = int(rng.integers(100, n - 600))
            L = int(rng.integers(50, 500))
            q = np.concatenate([s[:cut], s[cut + L:]])
        else:
            ins = rng.integers(0, 4, int(rng.integers(50, 500))).astype(np.uint8)
            at = int(rng.integers(100, n - 100))
            q = np.concatenate([s[:at], ins, s[at:]])
        q = mutate_read(rng, q, err=0.1)
        chains = pair_chains(q, s)
        if not chains:
            continue
        a = anchored_extend(q, s, chains[0].anchors, 12, cfg)
        if a is None:
            continue
        a.validate(q, s)
        # 8bp exact-match ends
        mm = match_mask(a.ops, q, s, a.qb, a.sb)
        assert mm[:8].all() and mm[-8:].all()
