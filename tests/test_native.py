"""Native C++ kernels vs numpy fallbacks."""

import numpy as np
import pytest

from lesv_tpu import native
from lesv_tpu.config import ChainConfig


def test_native_builds():
    assert native.available(), "native lib failed to build (g++ present?)"


def test_chain_score_matches_numpy(rng):
    import lesv_tpu.ops.chain as chain_mod

    cfg = ChainConfig()
    n = 500
    soff = np.sort(rng.integers(0, 100_000, n))
    qoff = np.maximum(0, soff - 50_000 + rng.integers(-500, 500, n))
    order = np.lexsort((qoff, soff))
    qoff, soff = qoff[order].astype(np.int64), soff[order].astype(np.int64)
    fn, pn = native.chain_score(qoff, soff, 15, cfg.max_dist_qry,
                                cfg.max_dist_ref, cfg.max_band_width)
    # numpy reference (bypass native)
    import os

    os.environ["LESV_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        f0, p0 = chain_mod.chain_score_np(qoff, soff, 15, cfg)
    finally:
        os.environ.pop("LESV_TPU_NO_NATIVE")
        native._tried = False
        native._lib = None
    assert np.array_equal(fn, f0)
    assert np.array_equal(pn, p0)


def test_extend_matches(rng):
    s = rng.integers(0, 4, 1000).astype(np.uint8)
    q = s[100:600].copy()
    qoff = np.array([50, 200], np.int64)
    soff = qoff + 100
    qo, so, lens = native.extend_matches(q, s, 12, qoff, soff)
    # perfect copy: extends to full overlap
    assert qo[0] == 0 and so[0] == 100
    assert lens[0] == 500


def test_fccns_link_dp_matches_numpy(rng):
    n_cols = 50
    n_links = 200
    link_col = np.sort(rng.integers(0, n_cols, n_links)).astype(np.int64)
    pred_col = np.minimum(link_col - 1,
                          rng.integers(-1, n_cols // 2, n_links)).astype(np.int64)
    link_w = rng.random(n_links)
    cov_pen = rng.random(n_cols)
    sn, bn = native.fccns_link_dp(link_col, pred_col, link_w, cov_pen, n_cols)
    score = np.full(n_cols, -np.inf)
    best = np.full(n_cols, -1, np.int64)
    for li in range(n_links):
        c, pc = int(link_col[li]), int(pred_col[li])
        sc = link_w[li] - cov_pen[c]
        if pc >= 0:
            sc += score[pc]
        if sc > score[c]:
            score[c] = sc
            best[c] = pc
    assert np.allclose(sn, score)
    assert np.array_equal(bn, best)


def test_native_fill_matches_oracle():
    """Native banded_fill must reproduce the numpy/jnp kernel exactly."""
    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops.align_np import banded_global_align, extension_align
    from lesv_tpu.sim import mutate_read

    rng2 = np.random.default_rng(5)
    cfg = AlignConfig()
    for trial in range(12):
        # subject must exceed the band (the oracle clamps W to S+1)
        n = int(rng2.integers(150, 400))
        s = rng2.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng2, s, err=0.12)
        W = 128
        r = native.banded_align_one(q, s, W, True, cfg.match, cfg.mismatch,
                                    cfg.gap_open1, cfg.gap_ext1,
                                    cfg.gap_open2, cfg.gap_ext2, False)
        guide = np.arange(len(q) + 1) - W // 2
        gold = banded_global_align(q, s, W, guide=guide, cfg=cfg)
        assert (r is None) == (gold is None)
        if r is None:
            continue
        ops, score, qe, se = r
        assert score == gold.score
        assert np.array_equal(ops, gold.ops)
    # free-end extension
    for trial in range(6):
        s = rng2.integers(0, 4, 400).astype(np.uint8)
        q = np.concatenate([mutate_read(rng2, s[:250], err=0.1),
                            rng2.integers(0, 4, 100).astype(np.uint8)])
        W = 128
        r = native.banded_align_one(q, s, W, True, cfg.match, cfg.mismatch,
                                    cfg.gap_open1, cfg.gap_ext1,
                                    cfg.gap_open2, cfg.gap_ext2, True)
        gold = extension_align(q, s, W, cfg=cfg)
        assert r is not None and gold is not None
        ops, score, qe, se = r
        assert score == gold.score and qe == gold.qe and se == gold.se


def test_native_fill_full_mode():
    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops.align_np import global_align_bruteforce

    rng2 = np.random.default_rng(9)
    cfg = AlignConfig()
    s = rng2.integers(0, 4, 300).astype(np.uint8)
    q = np.concatenate([s[:40], s[260:]])  # 220bp DEL
    r = native.banded_align_one(q, s, len(s) + 1, False, cfg.match,
                                cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
                                cfg.gap_open2, cfg.gap_ext2, False)
    gold = global_align_bruteforce(q, s, cfg)
    assert r is not None
    ops, score, qe, se = r
    assert score == gold.score
