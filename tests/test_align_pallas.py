"""Pallas TPU fill (interpret mode) vs the XLA scan kernel.

The Pallas kernel must reproduce the XLA kernel's scores/endpoints and
produce a direction tensor whose traceback yields identical op paths —
it shares the cell recurrences with align_np/align_jax (the ksw2-extd2
cost model of the reference, /root/reference/src/algo/ksw2_extd2_sse.c).
Runs on CPU via interpret=True; on real TPU the same kernel is selected
automatically by banded_align_batch.
"""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_jax import (
    banded_align_batch,
    traceback_batch,
)
from lesv_tpu.ops.align_pallas import (
    pallas_banded_align_kernel,
    pallas_supported,
)
from lesv_tpu.sim import mutate_read


def _batch(pairs, Qmax, Smax):
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
    return q, s, qlen, slen


def _pallas_run(q, s, qlen, slen, W, mode, cfg, free_end,
                force_i16=None):
    import jax.numpy as jnp

    dirs, score, end_i, end_b, ok = pallas_banded_align_kernel(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen),
        jnp.asarray(slen), W, mode, cfg, free_end=free_end,
        interpret=True, force_i16=force_i16)
    dirs = np.asarray(dirs)
    score = np.asarray(score)
    end_i = np.asarray(end_i)
    end_b = np.asarray(end_b)
    ok = np.asarray(ok)
    ops, nops, reached = traceback_batch(
        dirs, end_i, end_b, ok, W, mode, layout="rwb")
    return {"score": score, "ok": ok & (reached > 0), "ops": ops,
            "nops": nops, "end_i": end_i, "end_b": end_b}


@pytest.mark.parametrize("mode", ["diag", "full"])
@pytest.mark.parametrize("free_end", [False, True])
@pytest.mark.parametrize("i16", [False, True])
def test_pallas_matches_xla(mode, free_end, i16):
    rng = np.random.default_rng(7)
    cfg = AlignConfig()
    W = 128
    pairs = []
    for k in range(8):
        n = int(rng.integers(40, 120))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.15)
        if k == 3:  # truncated query: free_end should stop early
            q = q[: len(q) // 2]
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    q, s, qlen, slen = _batch(pairs, Qmax, Smax)
    assert pallas_supported(len(pairs), Qmax, Smax, W)
    if i16:
        from lesv_tpu.ops.align_pallas import _i16_ok

        assert _i16_ok(Qmax, W, cfg.match, cfg.mismatch, cfg.gap_open1,
                       cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2)

    got = _pallas_run(q, s, qlen, slen, W, mode, cfg, free_end,
                      force_i16=i16)
    want = banded_align_batch(q, s, qlen, slen, W, mode, cfg,
                              free_end=free_end)
    np.testing.assert_array_equal(got["ok"], want["ok"])
    np.testing.assert_array_equal(got["score"], want["score"])
    np.testing.assert_array_equal(got["end_i"], want["qe"])
    for i in range(len(pairs)):
        if not want["ok"][i]:
            continue
        a = got["ops"][i][: got["nops"][i]]
        b = want["ops"][i][: want["nops"][i]]
        np.testing.assert_array_equal(a, b)


def test_pallas_long_deletion_full_mode():
    """2000bp DEL in full mode with a large band — the SV-critical case."""
    rng = np.random.default_rng(11)
    cfg = AlignConfig()
    s = rng.integers(0, 4, 2100).astype(np.uint8)
    q = np.concatenate([s[:50], s[2050:]])
    pairs = [(q, s)] * 8
    qb, sb, qlen, slen = _batch(pairs, 128, 4096)
    W = 4096
    if not pallas_supported(8, 128, 4096, W):
        pytest.skip("band too wide for VMEM gate")
    got = _pallas_run(qb, sb, qlen, slen, W, "full", cfg, False)
    want = banded_align_batch(qb, sb, qlen, slen, W, "full", cfg)
    np.testing.assert_array_equal(got["score"], want["score"])
    np.testing.assert_array_equal(
        got["ops"][0][: got["nops"][0]],
        want["ops"][0][: want["nops"][0]])


def test_pallas_odd_w_full_mode():
    """Full mode uses W = S+1 (odd, non-pow2) — the dominant small
    bucket after the batch restructure (e.g. W=65 at B=1024)."""
    rng = np.random.default_rng(9)
    cfg = AlignConfig()
    pairs = []
    for _ in range(8):
        n = int(rng.integers(20, 64))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.2)[:64]
        pairs.append((q, s))
    q, s, qlen, slen = _batch(pairs, 64, 64)
    W = 65
    assert pallas_supported(8, 64, 64, W)
    got = _pallas_run(q, s, qlen, slen, W, "full", cfg, False)
    want = banded_align_batch(q, s, qlen, slen, W, "full", cfg)
    np.testing.assert_array_equal(got["ok"], want["ok"])
    np.testing.assert_array_equal(got["score"], want["score"])
    for i in range(8):
        if not want["ok"][i]:
            continue
        np.testing.assert_array_equal(
            got["ops"][i][: got["nops"][i]],
            want["ops"][i][: want["nops"][i]])


def test_pallas_i16_gate_and_deep_scores():
    """i16 variant at the gate edge: long noisy queries push DP values
    toward the i16 bound; ops/scores must stay bit-identical to the XLA
    i32 kernel.  Shapes past the bound must be rejected by the gate."""
    from lesv_tpu.ops.align_pallas import _i16_ok

    cfg = AlignConfig()
    a = (cfg.match, cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
         cfg.gap_open2, cfg.gap_ext2)
    assert _i16_ok(1024, 256, *a)
    assert not _i16_ok(4096, 512, *a)    # 5*4096 mismatch floor > i16 thr

    rng = np.random.default_rng(21)
    W = 256
    pairs = []
    for _ in range(8):
        n = int(rng.integers(900, 1024))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.35)[:1024]    # deep negative cells
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    assert _i16_ok(Qmax, W, *a)
    q, s, qlen, slen = _batch(pairs, Qmax, Smax)
    got = _pallas_run(q, s, qlen, slen, W, "diag", cfg, False,
                      force_i16=True)
    want = banded_align_batch(q, s, qlen, slen, W, "diag", cfg)
    np.testing.assert_array_equal(got["ok"], want["ok"])
    np.testing.assert_array_equal(got["score"], want["score"])
    for i in range(8):
        if not want["ok"][i]:
            continue
        np.testing.assert_array_equal(
            got["ops"][i][: got["nops"][i]],
            want["ops"][i][: want["nops"][i]])


def test_pallas_multi_row_tiles():
    """Queries long enough to span several QT row tiles."""
    rng = np.random.default_rng(3)
    cfg = AlignConfig()
    W = 256
    pairs = []
    for _ in range(8):
        n = int(rng.integers(1500, 2500))
        s = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate_read(rng, s, err=0.12)
        pairs.append((q, s))
    Qmax = max(len(q) for q, _ in pairs)
    Smax = max(len(s) for _, s in pairs)
    q, s, qlen, slen = _batch(pairs, Qmax, Smax)
    got = _pallas_run(q, s, qlen, slen, W, "diag", cfg, False)
    want = banded_align_batch(q, s, qlen, slen, W, "diag", cfg)
    np.testing.assert_array_equal(got["ok"], want["ok"])
    np.testing.assert_array_equal(got["score"], want["score"])
    for i in range(8):
        if not want["ok"][i]:
            continue
        np.testing.assert_array_equal(
            got["ops"][i][: got["nops"][i]],
            want["ops"][i][: want["nops"][i]])


def test_i16_fallback_propagates_non_lowering_errors(monkeypatch):
    """Only Mosaic lowering failures may trigger the i16->i32 fallback;
    anything else (OOM, tunnel errors, kernel bugs) must propagate."""
    import lesv_tpu.ops.align_pallas as ap

    assert ap._is_lowering_error(
        NotImplementedError("Mosaic lowering: unsupported 16-bit rotate"))
    assert not ap._is_lowering_error(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating"))
    assert not ap._is_lowering_error(ValueError("shape mismatch"))

    monkeypatch.setattr(ap, "_I16_BROKEN", False)

    def boom(*a, **kw):
        raise RuntimeError("tunnel collapsed")

    monkeypatch.setattr(ap, "_pallas_fill_jit", boom)
    cfg = AlignConfig()
    q = np.zeros((8, 64), np.uint8)
    s = np.zeros((8, 128), np.uint8)
    ql = np.full(8, 64, np.int32)
    sl = np.full(8, 64, np.int32)
    import jax.numpy as jnp
    with pytest.raises(RuntimeError, match="tunnel collapsed"):
        ap.pallas_banded_align_kernel(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(ql),
            jnp.asarray(sl), 64, "diag", cfg, interpret=True)
    assert not ap._I16_BROKEN
