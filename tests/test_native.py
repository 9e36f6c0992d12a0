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
