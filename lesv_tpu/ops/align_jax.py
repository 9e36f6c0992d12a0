"""Batched banded dual-affine alignment — the device compute core.

Identical recurrences to :mod:`lesv_tpu.ops.align_np` (tests compare them
cell-for-cell), restructured for XLA/TPU:

* a `lax.scan` over query rows; each step is pure vector work of shape
  (batch, band) — no antidiagonals, the within-row gap dependency is a
  cumulative max (`lax.cummax`) over (H + j*gap_ext);
* per-row direction bytes (3-bit source + 4 extension flags) are stacked
  into a (rows, batch, band) uint8 tensor;
* traceback is a second batched `lax.scan` walking the direction bytes —
  each step is one gather + a few selects per lane, fully vectorized over
  the batch.

Segments of many (query, subject) pairs are padded into shape buckets by
the host wrapper in :mod:`lesv_tpu.ops.align_batch`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lesv_tpu.config import AlignConfig

NEG = -(2**28)

OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 255


def _shift_band(row: jnp.ndarray, d: jnp.ndarray, W: int) -> jnp.ndarray:
    """Value of the previous row at band position b + d (per batch d)."""
    # pad on both sides with NEG, then dynamic-slice at offset W + d ... but
    # d varies per batch element: use gather via take_along_axis.
    B = row.shape[0]
    padded = jnp.pad(row, ((0, 0), (W, W)), constant_values=NEG)
    idx = jnp.arange(W)[None, :] + W + d[:, None]
    return jnp.take_along_axis(padded, idx, axis=1)


def banded_align_kernel(
    q: jnp.ndarray,        # (B, Qmax) uint8 codes (pad arbitrary)
    s: jnp.ndarray,        # (B, Smax) uint8 codes
    qlen: jnp.ndarray,     # (B,) int32
    slen: jnp.ndarray,     # (B,) int32
    guide: jnp.ndarray,    # (B, Qmax+1) int32 band starts, clipped
    W: int,
    cfg: AlignConfig,
    free_end: bool = False,
):
    """Fill + traceback for a batch of banded global (or extension)
    alignments.

    Returns dict with: score (B,), ok (B,), ops (B, T) uint8 (255 = pad,
    ops in forward order), qe/se (B,) end coordinates (== qlen/slen for
    global; argmax cell for free_end), nops (B,).
    """
    B, Qmax = q.shape
    Smax = s.shape[1]
    go1, ge1, go2, ge2 = cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2
    match, mism = cfg.match, cfg.mismatch

    js0 = guide[:, 0:1] + jnp.arange(W)[None, :]          # (B, W)
    in0 = js0 <= slen[:, None]
    E1 = jnp.where(js0 > 0, -go1 - js0 * ge1, NEG).astype(jnp.int32)
    E2 = jnp.where(js0 > 0, -go2 - js0 * ge2, NEG).astype(jnp.int32)
    H = jnp.where(js0 == 0, 0, jnp.maximum(E1, E2)).astype(jnp.int32)
    H = jnp.where(in0, H, NEG)
    E1 = jnp.where(in0, E1, NEG)
    E2 = jnp.where(in0, E2, NEG)
    F1 = jnp.full((B, W), NEG, jnp.int32)
    F2 = jnp.full((B, W), NEG, jnp.int32)
    dir0 = (jnp.where(E1 >= E2, 1, 2).astype(jnp.uint8) | np.uint8(0x18))

    jr = jnp.arange(W)[None, :]

    def row_step(carry, xs):
        H, E1, E2, F1, F2, best, best_i, best_b = carry
        i, qc, gprev, gcur = xs  # i: 1-based row, qc: (B,) query char
        d = gcur - gprev
        js = gcur[:, None] + jr                        # (B, W) subject col j
        inb = (js <= slen[:, None]) & (js >= 0)
        Hd = _shift_band(H, d - 1, W)
        Hu = _shift_band(H, d, W)
        F1u = _shift_band(F1, d, W)
        F2u = _shift_band(F2, d, W)
        sj = jnp.take_along_axis(
            s, jnp.clip(js - 1, 0, Smax - 1), axis=1)
        sub = jnp.where(sj == qc[:, None], match, -mism)
        diag = jnp.where(js >= 1, Hd + sub, NEG)
        F1n = jnp.maximum(Hu - (go1 + ge1), F1u - ge1)
        F2n = jnp.maximum(Hu - (go2 + ge2), F2u - ge2)
        F1ext = F1n == F1u - ge1
        F2ext = F2n == F2u - ge2
        Hpre = jnp.maximum(diag, jnp.maximum(F1n, F2n))
        # within-row gaps: E[j] = max_{k<j}(Hpre[k] + k*ge) - go - j*ge
        base1 = jnp.where(Hpre > NEG // 2, Hpre + js * ge1, NEG)
        run1 = jax.lax.cummax(base1, axis=1)
        E1n = jnp.concatenate(
            [jnp.full((B, 1), NEG, run1.dtype), run1[:, :-1]], axis=1)
        E1n = jnp.where(E1n > NEG // 2, E1n - go1 - js * ge1, NEG)
        base2 = jnp.where(Hpre > NEG // 2, Hpre + js * ge2, NEG)
        run2 = jax.lax.cummax(base2, axis=1)
        E2n = jnp.concatenate(
            [jnp.full((B, 1), NEG, run2.dtype), run2[:, :-1]], axis=1)
        E2n = jnp.where(E2n > NEG // 2, E2n - go2 - js * ge2, NEG)
        E1ext = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             E1n[:, 1:] == E1n[:, :-1] - ge1], axis=1)
        E2ext = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             E2n[:, 1:] == E2n[:, :-1] - ge2], axis=1)
        Hn = jnp.maximum(Hpre, jnp.maximum(E1n, E2n))
        Hn = jnp.where(inb, Hn, NEG)
        src = jnp.where(Hn == diag, 0,
              jnp.where(Hn == E1n, 1,
              jnp.where(Hn == E2n, 2,
              jnp.where(Hn == F1n, 3, 4)))).astype(jnp.uint8)
        dirs = (src
                | (E1ext.astype(jnp.uint8) << 3)
                | (E2ext.astype(jnp.uint8) << 4)
                | (F1ext.astype(jnp.uint8) << 5)
                | (F2ext.astype(jnp.uint8) << 6))
        # rows past qlen: carry state through unchanged
        active = (i <= qlen)[:, None]
        H2 = jnp.where(active, Hn, H)
        E12 = jnp.where(active, E1n, E1)
        E22 = jnp.where(active, E2n, E2)
        F12 = jnp.where(active, F1n, F1)
        F22 = jnp.where(active, F2n, F2)
        if free_end:
            bm = jnp.argmax(jnp.where(active, Hn, NEG), axis=1)
            vm = jnp.take_along_axis(Hn, bm[:, None], axis=1)[:, 0]
            upd = active[:, 0] & (vm > best)
            best = jnp.where(upd, vm, best)
            best_i = jnp.where(upd, i, best_i)
            best_b = jnp.where(upd, bm.astype(jnp.int32), best_b)
        return (H2, E12, E22, F12, F22, best, best_i, best_b), dirs

    rows = jnp.arange(1, Qmax + 1, dtype=jnp.int32)
    qcs = q.T.astype(jnp.uint8)          # (Qmax, B)
    gprev = guide[:, :-1].T              # (Qmax, B)
    gcur = guide[:, 1:].T
    best0 = H[:, 0] if free_end else jnp.full(B, NEG, jnp.int32)
    carry0 = (H, E1, E2, F1, F2,
              best0.astype(jnp.int32),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    (H, E1, E2, F1, F2, best, best_i, best_b), dir_rows = jax.lax.scan(
        row_step, carry0, (rows, qcs, gprev, gcur))
    dirs = jnp.concatenate([dir0[None], dir_rows], axis=0)  # (Qmax+1, B, W)

    # end cell
    gq = jnp.take_along_axis(guide, qlen[:, None], axis=1)[:, 0]
    if free_end:
        end_i, end_b = best_i, best_b
        score = best
    else:
        end_i = qlen
        end_b = slen - gq
        # H at the final row was overwritten only while active; since scan
        # freezes state after qlen rows, H now holds row qlen.
        score = jnp.take_along_axis(
            H, jnp.clip(end_b, 0, W - 1)[:, None], axis=1)[:, 0]
    ok = (end_b >= 0) & (end_b < W) & (score > NEG // 2)

    # ---- traceback ----
    T = Qmax + Smax + 8
    dirs_flat = dirs.transpose(1, 0, 2).reshape(B, (Qmax + 1) * W)
    bidx = jnp.arange(B)

    def tb_step(carry, t):
        i, b, st, n, done = carry
        gi = jnp.take_along_axis(guide, jnp.clip(i, 0, Qmax)[:, None], axis=1)[:, 0]
        at_origin = (i <= 0) & (gi + b <= 0)
        done2 = done | at_origin
        byte = dirs_flat[bidx, jnp.clip(i, 0, Qmax) * W + jnp.clip(b, 0, W - 1)]
        src = (byte & 7).astype(jnp.int32)
        # state 0: adopt src; if diag emit M and move
        st_eff = jnp.where(st == 0, src, st)
        gim1 = jnp.take_along_axis(
            guide, jnp.clip(i - 1, 0, Qmax)[:, None], axis=1)[:, 0]
        d = gi - gim1
        is_m = st_eff == 0
        is_e = (st_eff == 1) | (st_eff == 2)
        is_f = (st_eff == 3) | (st_eff == 4)
        op = jnp.where(is_m, OP_M, jnp.where(is_e, OP_D, OP_I)).astype(jnp.uint8)
        op = jnp.where(done2, OP_PAD, op)
        # moves
        ni = jnp.where(is_m | is_f, i - 1, i)
        nb = jnp.where(is_m, b + d - 1,
             jnp.where(is_e, b - 1,
             jnp.where(is_f, b + d, b)))
        eext = jnp.where(st_eff == 1, byte & 0x08, byte & 0x10) != 0
        fext = jnp.where(st_eff == 3, byte & 0x20, byte & 0x40) != 0
        nst = jnp.where(is_m, 0,
              jnp.where(is_e, jnp.where(eext, st_eff, 0),
              jnp.where(fext, st_eff, 0)))
        ni = jnp.where(done2, i, ni)
        nb = jnp.where(done2, b, nb)
        nst = jnp.where(done2, st, nst)
        n2 = jnp.where(done2, n, n + 1)
        return (ni, nb, nst, n2, done2), op

    carry0 = (end_i.astype(jnp.int32), end_b.astype(jnp.int32),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              ~ok)
    (fi, fb, fst, nops, done), ops_rev = jax.lax.scan(
        tb_step, carry0, jnp.arange(T))
    ops_rev = ops_rev.T                     # (B, T), reversed op order
    ok = ok & done                          # traceback must reach the origin
    # reverse per lane: op t of output = ops_rev[nops-1-t]
    tidx = jnp.arange(T)[None, :]
    src_idx = nops[:, None] - 1 - tidx
    ops_fwd = jnp.where(
        src_idx >= 0,
        jnp.take_along_axis(ops_rev, jnp.clip(src_idx, 0, T - 1), axis=1),
        OP_PAD)
    se = jnp.where(free_end,
                   jnp.take_along_axis(
                       guide, jnp.clip(end_i, 0, Qmax)[:, None], axis=1)[:, 0]
                   + end_b,
                   slen)
    return {
        "score": score,
        "ok": ok,
        "ops": ops_fwd,
        "nops": nops,
        "qe": end_i,
        "se": se,
    }


@functools.partial(jax.jit, static_argnames=("W", "free_end", "match",
                                             "mismatch", "go1", "ge1",
                                             "go2", "ge2"))
def _kernel_jit(q, s, qlen, slen, guide, W, free_end,
                match, mismatch, go1, ge1, go2, ge2):
    cfg = AlignConfig(match=match, mismatch=mismatch, gap_open1=go1,
                      gap_ext1=ge1, gap_open2=go2, gap_ext2=ge2)
    return banded_align_kernel(q, s, qlen, slen, guide, W, cfg,
                               free_end=free_end)


def banded_align_batch(q, s, qlen, slen, guide, W: int,
                       cfg: AlignConfig | None = None,
                       free_end: bool = False):
    """Convenience wrapper: numpy in, numpy out (jitted per (shape, W))."""
    cfg = cfg or AlignConfig()
    out = _kernel_jit(
        jnp.asarray(q, jnp.uint8), jnp.asarray(s, jnp.uint8),
        jnp.asarray(qlen, jnp.int32), jnp.asarray(slen, jnp.int32),
        jnp.asarray(guide, jnp.int32), W, free_end,
        cfg.match, cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
        cfg.gap_open2, cfg.gap_ext2)
    return {k: np.asarray(v) for k, v in out.items()}


def linear_guide(qlen: int, slen: int, Qmax: int, W: int) -> np.ndarray:
    """Host helper: the guide used by align_np.banded_global_align."""
    g = (np.arange(Qmax + 1) * slen) // max(qlen, 1) - W // 2
    return np.clip(g, 0, max(slen + 1 - W, 0)).astype(np.int32)


def diagonal_guide(qlen: int, slen: int, Qmax: int, W: int) -> np.ndarray:
    """Guide for extension alignment (slope-1 main diagonal)."""
    g = np.arange(Qmax + 1) - W // 2
    return np.clip(g, 0, max(slen + 1 - W, 0)).astype(np.int32)
