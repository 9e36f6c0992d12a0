"""Batched banded dual-affine alignment — the device compute core.

Identical recurrences to :mod:`lesv_tpu.ops.align_np` (tests compare them
cell-for-cell), restructured for XLA/TPU:

* a `lax.scan` over query rows; each step is pure vector work of shape
  (batch, band) with **static** band shifts — two modes:
  - ``diag``: band follows the main diagonal, guide g(i) = i - W/2
    (unclipped), so the row-to-row shift is the constant +1;
  - ``full``: W covers the whole subject (rectangular DP), shift 0;
  no gathers appear anywhere in the fill loop (gathers are the TPU
  performance killer — they lower to one-hot matmuls);
* the within-row gap dependency is a cumulative max (`lax.cummax`) over
  (H + j*gap_ext) — no antidiagonal wavefront needed;
* per-row direction bytes (3-bit source + 4 extension flags) are returned
  as a (rows+1, batch, band) uint8 tensor; traceback runs on the host,
  vectorized across lanes (:func:`traceback_batch`).

Segments of many (query, subject) pairs are padded into shape buckets by
:mod:`lesv_tpu.ops.align_batch`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lesv_tpu.config import AlignConfig

NEG = -(2**28)

OP_M, OP_I, OP_D, OP_PAD = 0, 1, 2, 255


def guide_of(mode: str, Qmax: int, W: int) -> np.ndarray:
    """The (static) band start per row: g(i) such that band slot b holds
    subject column j = g(i) + b."""
    if mode == "full":
        return np.zeros(Qmax + 1, np.int64)
    return np.arange(Qmax + 1, dtype=np.int64) - W // 2


def banded_align_kernel(
    q: jnp.ndarray,        # (B, Qmax) uint8 codes (pad arbitrary)
    s: jnp.ndarray,        # (B, Smax) uint8 codes
    qlen: jnp.ndarray,     # (B,) int32
    slen: jnp.ndarray,     # (B,) int32
    W: int,
    mode: str,             # "diag" | "full"
    cfg: AlignConfig,
    free_end: bool = False,
):
    """Fill pass. Returns (dirs, score, end_i, end_b, ok)."""
    assert mode in ("diag", "full")
    B, Qmax = q.shape
    Smax = s.shape[1]
    go1, ge1, go2, ge2 = cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2
    match, mism = cfg.match, cfg.mismatch
    W2 = W // 2
    d = 1 if mode == "diag" else 0

    br = jnp.arange(W, dtype=jnp.int32)[None, :]          # band slots

    def js_of(i: int | jnp.ndarray):
        g = (i - W2) if mode == "diag" else 0
        return g + br                                      # (1|B, W)

    js0 = jnp.broadcast_to(js_of(0), (B, W))
    in0 = (js0 >= 0) & (js0 <= slen[:, None])
    E1 = jnp.where(js0 > 0, -go1 - js0 * ge1, NEG).astype(jnp.int32)
    E2 = jnp.where(js0 > 0, -go2 - js0 * ge2, NEG).astype(jnp.int32)
    H = jnp.where(js0 == 0, 0, jnp.maximum(E1, E2)).astype(jnp.int32)
    H = jnp.where(in0, H, NEG)
    E1 = jnp.where(in0, E1, NEG)
    E2 = jnp.where(in0, E2, NEG)
    F1 = jnp.full((B, W), NEG, jnp.int32)
    F2 = jnp.full((B, W), NEG, jnp.int32)
    dir0 = (jnp.where(E1 >= E2, 1, 2).astype(jnp.uint8) | np.uint8(0x18))

    # s window state for diag mode: win[b] = s[g(i)-1+b] at row i;
    # per row the window shifts by d and one element enters at the right.
    # Precompute entering elements with static slicing:
    #   at row i (1-based) window must be s[(i-W2-1) : (i-W2-1)+W]
    #   -> new rightmost element s[i - W2 - 2 + W] ... enter s_in[i]
    if mode == "diag":
        pad_l = W2 + 1
        s_pad = jnp.pad(s, ((0, 0), (pad_l, Qmax + W)), constant_values=255)
        # win0 = s[-W2-1 : -W2-1+W]
        win0 = jax.lax.slice(s_pad, (0, 0), (B, W))
        # entering element for row i: s[(i-W2-1)+W-1] = s_pad[:, i + W - 1]
        s_in = jax.lax.slice(s_pad, (0, W), (B, W + Qmax)).T  # (Qmax, B)
    else:
        s_pad = jnp.pad(s, ((0, 0), (1, W)), constant_values=255)
        win0 = jax.lax.slice(s_pad, (0, 0), (B, W))
        s_in = jnp.zeros((Qmax, B), jnp.uint8)  # unused

    def shift1(row):
        # value at slot b of prev row seen from slot b with shift +1
        return jnp.concatenate(
            [row[:, 1:], jnp.full((B, 1), NEG, row.dtype)], axis=1)

    def shiftm1(row):
        return jnp.concatenate(
            [jnp.full((B, 1), NEG, row.dtype), row[:, :-1]], axis=1)

    def row_step(carry, xs):
        H, E1, E2, F1, F2, win, best, best_i, best_b = carry
        i, qc, sin = xs
        js = js_of(i)                                      # (1, W) int32
        js = jnp.broadcast_to(js, (B, W))
        inb = (js >= 0) & (js <= slen[:, None])
        if d == 1:
            Hd = H                      # H[i-1, j-1] : shift d-1 = 0
            Hu = shift1(H)              # H[i-1, j]   : shift 1
            F1u = shift1(F1)
            F2u = shift1(F2)
            win2 = jnp.concatenate([win[:, 1:], sin[:, None]], axis=1)
        else:
            Hd = shiftm1(H)             # shift -1
            Hu = H
            F1u = F1
            F2u = F2
            win2 = win
        sj = win2                       # s[j-1] at slot b
        sub = jnp.where(sj == qc[:, None], match, -mism)
        diag = jnp.where((js >= 1) & (Hd > NEG // 2), Hd + sub, NEG)
        F1n = jnp.maximum(Hu - (go1 + ge1), F1u - ge1)
        F2n = jnp.maximum(Hu - (go2 + ge2), F2u - ge2)
        F1ext = F1n == F1u - ge1
        F2ext = F2n == F2u - ge2
        Hpre = jnp.maximum(diag, jnp.maximum(F1n, F2n))
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
            [jnp.ones((B, 1), bool), E1n[:, 1:] == E1n[:, :-1] - ge1], axis=1)
        E2ext = jnp.concatenate(
            [jnp.ones((B, 1), bool), E2n[:, 1:] == E2n[:, :-1] - ge2], axis=1)
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
        active = (i <= qlen)[:, None]
        H2 = jnp.where(active, Hn, H)
        E12 = jnp.where(active, E1n, E1)
        E22 = jnp.where(active, E2n, E2)
        F12 = jnp.where(active, F1n, F1)
        F22 = jnp.where(active, F2n, F2)
        if free_end:
            Hv = jnp.where(active & inb, Hn, NEG)
            bm = jnp.argmax(Hv, axis=1).astype(jnp.int32)
            vm = jnp.max(Hv, axis=1)
            upd = active[:, 0] & (vm > best)
            best = jnp.where(upd, vm, best)
            best_i = jnp.where(upd, i, best_i)
            best_b = jnp.where(upd, bm, best_b)
        return (H2, E12, E22, F12, F22, win2, best, best_i, best_b), dirs

    rows = jnp.arange(1, Qmax + 1, dtype=jnp.int32)
    qcs = q.T                            # (Qmax, B)
    best0 = H[:, W2] if (free_end and mode == "diag") else (
        H[:, 0] if free_end else jnp.full(B, NEG, jnp.int32))
    carry0 = (H, E1, E2, F1, F2, win0,
              best0.astype(jnp.int32),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    (H, E1, E2, F1, F2, _, best, best_i, best_b), dir_rows = jax.lax.scan(
        row_step, carry0, (rows, qcs, s_in))
    # lane-major layout (B, Qmax+1, W): the host traceback reads it
    # per-lane, and a device-side transpose avoids a host copy
    dirs = jnp.concatenate([dir0[None], dir_rows], axis=0).transpose(1, 0, 2)

    if free_end:
        end_i, end_b = best_i, best_b
        score = best
    else:
        end_i = qlen
        gq = (qlen - W2) if mode == "diag" else jnp.zeros_like(qlen)
        end_b = slen - gq
        score = jnp.take_along_axis(
            H, jnp.clip(end_b, 0, W - 1)[:, None], axis=1)[:, 0]
    ok = (end_b >= 0) & (end_b < W) & (score > NEG // 2)
    return dirs, score, end_i, end_b, ok


@functools.partial(jax.jit, static_argnames=("W", "mode", "free_end",
                                             "match", "mismatch", "go1",
                                             "ge1", "go2", "ge2"))
def _kernel_jit(q, s, qlen, slen, W, mode, free_end,
                match, mismatch, go1, ge1, go2, ge2):
    cfg = AlignConfig(match=match, mismatch=mismatch, gap_open1=go1,
                      gap_ext1=ge1, gap_open2=go2, gap_ext2=ge2)
    return banded_align_kernel(q, s, qlen, slen, W, mode, cfg,
                               free_end=free_end)


@functools.partial(
    jax.jit,
    static_argnames=("W", "mode", "free_end", "match", "mismatch", "go1",
                     "ge1", "go2", "ge2", "use_p", "interp", "Rq", "Bs",
                     "B_live"))
def _fill_slice_jit(q, s, qlen, slen, W, mode, free_end, match, mismatch,
                    go1, ge1, go2, ge2, use_p, interp, Rq, Bs, B_live):
    """Fill + dead-lane/row slicing as ONE dispatch (each eager op costs
    a tunnel round trip; the slice shapes are static ladder values)."""
    cfg = AlignConfig(match=match, mismatch=mismatch, gap_open1=go1,
                      gap_ext1=ge1, gap_open2=go2, gap_ext2=ge2)
    if use_p:
        from lesv_tpu.ops.align_pallas import pallas_banded_align_kernel

        # force_i16=False: the i16 probe's lowering-failure fallback
        # (try/except in pallas_banded_align_kernel) cannot fire here —
        # the Mosaic error would surface at THIS jit's compile, outside
        # that try.  i32 is always legal; the i16 variant stays a
        # standalone-path/test feature until libtpu legalizes it.
        dirs, score, end_i, end_b, ok = pallas_banded_align_kernel(
            q, s, qlen, slen, W, mode, cfg, free_end=free_end,
            interpret=interp, force_i16=False)
        if B_live < q.shape[0]:
            ok = ok & (jnp.arange(q.shape[0]) < B_live)
        dirs = dirs[: min(Rq, dirs.shape[0]), :, :Bs]
    else:
        dirs, score, end_i, end_b, ok = banded_align_kernel(
            q, s, qlen, slen, W, mode, cfg, free_end=free_end)
        dirs = dirs[:Bs, : min(Rq, dirs.shape[1]), :]
    return (dirs, score[:Bs], end_i[:Bs], end_b[:Bs], ok[:Bs])


@functools.partial(
    jax.jit,
    static_argnames=("W", "mode", "free_end", "match", "mismatch", "go1",
                     "ge1", "go2", "ge2", "use_p", "interp", "Rq", "Bs",
                     "B_live"))
def _fill_tb_jit(q, s, qlen, slen, W, mode, free_end, match, mismatch,
                 go1, ge1, go2, ge2, use_p, interp, Rq, Bs, B_live):
    """Fill + dead-lane/row slicing + DEVICE traceback as ONE dispatch.

    The readback shrinks from the (rows x W x lanes) dirs tensor to a
    (lanes x T) ops array — the dirs d2h transfer was the dominant cost
    of every big fill on the tunneled device."""
    import jax.numpy as jnp

    dirs, score, end_i, end_b, ok = _fill_slice_jit(
        q, s, qlen, slen, W, mode, free_end, match, mismatch, go1, ge1,
        go2, ge2, use_p, interp, Rq, Bs, B_live)
    layout = "rwb" if use_p else "lane"
    R = dirs.shape[0] if use_p else dirs.shape[1]
    T = R + W + 2
    ops, nops, reached = traceback_device(
        dirs, end_i.astype(jnp.int32), end_b.astype(jnp.int32), ok, W,
        mode, layout, T)
    return ops, nops, reached, score, end_i, end_b, ok


def traceback_device(dirs, end_i, end_b, ok, W: int, mode: str,
                     layout: str, T: int):
    """Device-side traceback (traced): a `lax.scan` of point gathers
    over the dirs tensor — the d2h dirs fetch (tens of MB per chunk at
    ~25 MB/s through the tunnel) collapses to a (B, T) ops fetch.

    Bit-identical to :func:`traceback_batch`'s per-lane walk (same
    state machine over the 3-bit source + 4 extension flags).  Returns
    (ops (B, T) uint8 FORWARD order with OP_PAD tail, nops (B,),
    reached (B,))."""
    import jax.numpy as jnp

    if layout == "rwb":
        R, _, B = dirs.shape
    elif layout == "lane":
        B, R, _ = dirs.shape
    else:  # row-major (R, B, W)
        R, B, _ = dirs.shape
    W2 = W // 2
    d = 1 if mode == "diag" else 0
    df = dirs.reshape(-1)
    lanes = jnp.arange(B, dtype=jnp.int32)
    i0 = end_i.astype(jnp.int32)
    b0 = end_b.astype(jnp.int32)

    def g_of(i):
        return (i - W2) if mode == "diag" else jnp.zeros_like(i)

    def step(carry, _):
        i, b, st, n, done = carry
        at_origin = (i <= 0) & (g_of(i) + b <= 0)
        done = done | at_origin
        ic = jnp.clip(i, 0, R - 1)
        bc = jnp.clip(b, 0, W - 1)
        if layout == "rwb":
            flat = (ic * W + bc) * B + lanes
        elif layout == "lane":
            flat = lanes * (R * W) + ic * W + bc
        else:
            flat = (ic * B + lanes) * W + bc
        byte = jnp.take(df, flat).astype(jnp.int32)
        src = byte & 7
        st_eff = jnp.where(st == 0, src, st)
        is_m = st_eff == 0
        is_e = (st_eff == 1) | (st_eff == 2)
        is_f = (st_eff == 3) | (st_eff == 4)
        op = jnp.where(is_m, OP_M,
                       jnp.where(is_e, OP_D, OP_I)).astype(jnp.uint8)
        act = ~done
        out_op = jnp.where(act, op, np.uint8(OP_PAD))
        eext = jnp.where(st_eff == 1, byte & 0x08, byte & 0x10) != 0
        fext = jnp.where(st_eff == 3, byte & 0x20, byte & 0x40) != 0
        ni = jnp.where(is_m | is_f, i - 1, i)
        nb = jnp.where(is_m, b + d - 1, jnp.where(is_e, b - 1, b + d))
        nst = jnp.where(is_m, 0,
              jnp.where(is_e, jnp.where(eext, st_eff, 0),
                        jnp.where(fext, st_eff, 0))).astype(st.dtype)
        oob = (nb < 0) | (nb >= W) | (ni < 0)
        i2 = jnp.where(act, ni, i)
        b2 = jnp.where(act, nb, b)
        st2 = jnp.where(act, nst, st)
        n2 = jnp.where(act, n + 1, n)
        reached_now = (i2 <= 0) & (g_of(i2) + b2 <= 0)
        bad = act & oob & ~reached_now
        done = done | bad
        n2 = jnp.where(bad, 0, n2)
        return (i2, b2, st2, n2, done), out_op

    carry0 = (i0, b0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              ~ok)
    (i, b, _, n, _), ops_rev = jax.lax.scan(step, carry0, None, length=T)
    reached = (i <= 0) & (g_of(i) + b <= 0) & ok & (n > 0)
    # reverse each lane's prefix into forward order on device
    t_idx = jnp.arange(T, dtype=jnp.int32)[:, None]
    src_idx = jnp.clip(n[None, :] - 1 - t_idx, 0, T - 1)
    ops_fwd = jnp.where(t_idx < n[None, :],
                        jnp.take_along_axis(ops_rev, src_idx, axis=0),
                        np.uint8(OP_PAD))
    return ops_fwd.T, n, reached


def traceback_batch(dirs: np.ndarray, end_i: np.ndarray, end_b: np.ndarray,
                    ok: np.ndarray, W: int, mode: str,
                    layout: str = "lane"):
    """Host traceback, vectorized across lanes.

    ``dirs`` is lane-major (B, Qmax+1, W) (``layout="lane"``),
    row-major (Rpad, B, W) (``layout="row"``), or band-major
    (Rpad, W, B) from the Pallas fill (``layout="rwb"``).
    Returns (ops (B, T) uint8 forward order with OP_PAD tail, nops (B,),
    reached_origin (B,)).
    """
    if layout == "lane":
        B, R, _ = dirs.shape
    elif layout == "row":
        R, B, _ = dirs.shape
    else:
        R, _, B = dirs.shape
    Qmax = R - 1
    W2 = W // 2
    d = 1 if mode == "diag" else 0
    # max path length: i steps + horizontal steps <= i + (g(i)+b)
    gmax = (end_i - W2 if mode == "diag" else np.zeros_like(end_i)) + end_b
    T = int(np.maximum(end_i + np.maximum(gmax, 0), 1).max()) + 2

    from lesv_tpu import native

    r = native.traceback_batch(dirs, end_i.astype(np.int64),
                               end_b.astype(np.int64),
                               ok.astype(np.uint8), W, mode == "diag", T,
                               layout=layout)
    if r is not None:
        return r
    i = end_i.astype(np.int64).copy()
    b = end_b.astype(np.int64).copy()
    st = np.zeros(B, np.int64)
    n = np.zeros(B, np.int64)
    done = ~ok.copy()
    ops_rev = np.full((B, T), OP_PAD, np.uint8)
    lanes = np.arange(B)
    for t in range(T):
        if done.all():
            break
        g = (i - W2) if mode == "diag" else np.zeros_like(i)
        at_origin = (i <= 0) & (g + b <= 0)
        done |= at_origin
        if layout == "lane":
            byte = dirs[lanes, np.clip(i, 0, Qmax), np.clip(b, 0, W - 1)]
        elif layout == "row":
            byte = dirs[np.clip(i, 0, Qmax), lanes, np.clip(b, 0, W - 1)]
        else:
            byte = dirs[np.clip(i, 0, Qmax), np.clip(b, 0, W - 1), lanes]
        src = (byte & 7).astype(np.int64)
        st_eff = np.where(st == 0, src, st)
        is_m = st_eff == 0
        is_e = (st_eff == 1) | (st_eff == 2)
        is_f = (st_eff == 3) | (st_eff == 4)
        op = np.where(is_m, OP_M, np.where(is_e, OP_D, OP_I)).astype(np.uint8)
        act = ~done
        ops_rev[lanes[act], n[act]] = op[act]
        eext = np.where(st_eff == 1, byte & 0x08, byte & 0x10) != 0
        fext = np.where(st_eff == 3, byte & 0x20, byte & 0x40) != 0
        ni = np.where(is_m | is_f, i - 1, i)
        nb = np.where(is_m, b + d - 1, np.where(is_e, b - 1, b + d))
        nst = np.where(is_m, 0,
              np.where(is_e, np.where(eext, st_eff, 0),
              np.where(fext, st_eff, 0)))
        oob = (nb < 0) | (nb >= W) | (ni < 0)
        i = np.where(act, ni, i)
        b = np.where(act, nb, b)
        st = np.where(act, nst, st)
        n = np.where(act, n + 1, n)
        # a lane that left the band (without reaching origin) fails
        g2 = (i - W2) if mode == "diag" else np.zeros_like(i)
        reached = (i <= 0) & (g2 + b <= 0)
        bad = act & oob & ~reached
        done |= bad
        n[bad] = 0
    g = (i - W2) if mode == "diag" else np.zeros_like(i)
    reached = (i <= 0) & (g + b <= 0) & ok & (n > 0)
    # reverse into forward order
    ops = np.full((B, T), OP_PAD, np.uint8)
    for lane in np.flatnonzero(reached):
        k = n[lane]
        ops[lane, :k] = ops_rev[lane, :k][::-1]
    return ops, n, reached


def _use_pallas(B: int, Qmax: int, Smax: int, W: int,
                free_end: bool) -> bool:
    """Pallas gate: "auto" uses the fused kernel on TPU when the band
    fits VMEM; "0" forces the XLA scan; "interp" forces the Pallas
    branch in interpreter mode on any backend (integration testing)."""
    import os

    flag = os.environ.get("LESV_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag != "interp" and jax.default_backend() == "cpu":
        return False
    from lesv_tpu.ops.align_pallas import pallas_supported

    return pallas_supported(B, Qmax, Smax, W, free_end)


@functools.partial(jax.jit, static_argnames=("W", "mode", "layout", "T"))
def _mesh_tb_jit(dirs, end_i, end_b, ok, W, mode, layout, T):
    """Device traceback over an (already computed) dirs tensor — the
    follow-up program for the mesh-sharded fill path."""
    import jax.numpy as jnp

    return traceback_device(dirs, end_i.astype(jnp.int32),
                            end_b.astype(jnp.int32), ok, W, mode,
                            layout, T)


def banded_align_dispatch(q, s, qlen, slen, W: int, mode: str,
                          cfg: AlignConfig | None = None,
                          free_end: bool = False, device=None):
    """Dispatch the fill (async); returns an opaque pending handle.

    ``device``: optional jax device to run on (multi-chip round-robin —
    the data-parallel use of all local chips, SURVEY §2.6).  Dispatches
    do not block, so fills for many buckets/devices run concurrently
    with host work until :func:`banded_align_finish` reads them back."""
    cfg = cfg or AlignConfig()
    q = np.asarray(q, np.uint8)
    s = np.asarray(s, np.uint8)
    qlen = np.asarray(qlen, np.int32)
    slen = np.asarray(slen, np.int32)
    B = q.shape[0]
    # live lanes are a prefix (padding lanes have qlen == 0); the dirs
    # transfer back to the host dominates on tunneled devices, so dead
    # lanes and dead query rows are sliced off ON DEVICE before the
    # readback (pow2 ladders keep the slice-executable count bounded)
    # coarse ladders: every distinct slice shape is a separately
    # (remotely) compiled executable, so 3 lane widths and x4 row steps
    nz = np.flatnonzero(qlen > 0)
    n_live = int(nz[-1]) + 1 if len(nz) else 1
    Bs = 8 if n_live <= 8 else 128 if n_live <= 128 else 1024
    Rq = 16
    while Rq < int(qlen.max(initial=0)) + 1:
        Rq *= 4

    def put(x):
        a = jnp.asarray(x)
        return jax.device_put(a, device) if device is not None else a

    use_p = _use_pallas(B, q.shape[1], s.shape[1], W, free_end)
    import os

    interp = os.environ.get("LESV_TPU_PALLAS") == "interp"
    # device-side traceback: on by default off-CPU (the host traceback
    # stays for the CPU backend, where dirs never cross a wire)
    dev_tb = (os.environ.get("LESV_TPU_DEV_TB", "1") != "0"
              and jax.default_backend() != "cpu")
    mesh = None
    if device is None:
        from lesv_tpu.parallel import mesh as meshmod

        mesh = meshmod.active_mesh()
    if mesh is not None and B >= mesh.size:
        # production multi-device path: the chunk is ONE SPMD program,
        # batch sharded over the mesh (shard_map; replaces round-robin)
        mult = mesh.size * (8 if use_p else 1)
        Bp = -(-B // mult) * mult
        if Bp != B:
            q = np.pad(q, ((0, Bp - B), (0, 0)))
            s = np.pad(s, ((0, Bp - B), (0, 0)))
            qlen = np.pad(qlen, (0, Bp - B), constant_values=1)
            slen = np.pad(slen, (0, Bp - B), constant_values=1)
        dirs, score, end_i, end_b, ok = meshmod.mesh_fill(
            mesh, jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen),
            jnp.asarray(slen), W, mode, cfg, free_end, use_p,
            interpret=interp)
        if Bp != B:
            ok = ok & (jnp.arange(Bp) < B)
        if use_p:
            layout = "rwb"
            Bs2 = dirs.shape[2]
            dirs = dirs[: min(Rq, dirs.shape[0])]   # rows not sharded
        else:
            layout = "lane"
            Bs2 = dirs.shape[0]
            dirs = dirs[:, : min(Rq, dirs.shape[1])]
        if dev_tb:
            R = dirs.shape[0] if use_p else dirs.shape[1]
            ops_d, nops_d, reach_d = _mesh_tb_jit(
                dirs, end_i, end_b, ok, W=W, mode=mode, layout=layout,
                T=R + W + 2)
            for x in (ops_d, nops_d, reach_d, score, end_i, end_b, ok):
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
            return dict(devtb=(ops_d, nops_d, reach_d), score=score,
                        end_i=end_i, end_b=end_b, ok=ok, B=min(n_live, Bs2),
                        B_orig=B, W=W, mode=mode, free_end=free_end,
                        slen=slen[:Bs2])
    else:
        if use_p:
            Bp = -(-B // 8) * 8
            if Bp != B:
                q = np.pad(q, ((0, Bp - B), (0, 0)))
                s = np.pad(s, ((0, Bp - B), (0, 0)))
                qlen = np.pad(qlen, (0, Bp - B), constant_values=1)
                slen = np.pad(slen, (0, Bp - B), constant_values=1)
            layout = "rwb"
        else:
            Bp = B
            layout = "lane"
        Bs2 = min(Bs, Bp)
        if dev_tb:
            ops_d, nops_d, reach_d, score, end_i, end_b, ok = _fill_tb_jit(
                put(q), put(s), put(qlen), put(slen), W, mode, free_end,
                cfg.match, cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
                cfg.gap_open2, cfg.gap_ext2, use_p, interp, Rq, Bs2, B)
            for x in (ops_d, nops_d, reach_d, score, end_i, end_b, ok):
                if hasattr(x, "copy_to_host_async"):
                    x.copy_to_host_async()
            return dict(devtb=(ops_d, nops_d, reach_d), score=score,
                        end_i=end_i, end_b=end_b, ok=ok,
                        B=min(n_live, Bs2), B_orig=B, W=W, mode=mode,
                        free_end=free_end, slen=slen[:Bs2])
        dirs, score, end_i, end_b, ok = _fill_slice_jit(
            put(q), put(s), put(qlen), put(slen), W, mode, free_end,
            cfg.match, cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
            cfg.gap_open2, cfg.gap_ext2, use_p, interp, Rq, Bs2, B)
    # start the device->host copies now: they overlap the dispatch work
    # of later chunks (banded_align_finish's np.asarray then finds the
    # data already on the host)
    for x in (dirs, score, end_i, end_b, ok):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return dict(dirs=dirs, score=score, end_i=end_i, end_b=end_b, ok=ok,
                layout=layout, B=min(n_live, Bs2), B_orig=B, W=W,
                mode=mode, free_end=free_end, slen=slen[:Bs2])



def banded_align_finish(pend: dict):
    """Block on a pending fill, run the host traceback, return the
    banded_align_batch result dict."""
    from lesv_tpu.utils import profiling

    B, W, mode, free_end = (pend["B"], pend["W"], pend["mode"],
                            pend["free_end"])
    if "devtb" in pend:
        with profiling.trace("align/fetch_ops"):
            ops_d, nops_d, reach_d = pend["devtb"]
            ops = np.asarray(ops_d)
            nops = np.asarray(nops_d).astype(np.int64)
            reached = np.asarray(reach_d)
            score = np.asarray(pend["score"])[:B]
            end_i = np.asarray(pend["end_i"])
            end_b = np.asarray(pend["end_b"])
            ok = np.asarray(pend["ok"])
    else:
        with profiling.trace("align/fetch"):
            dirs = np.asarray(pend["dirs"])
            score = np.asarray(pend["score"])[:B]
            end_i = np.asarray(pend["end_i"])
            end_b = np.asarray(pend["end_b"])
            ok = np.asarray(pend["ok"])
        with profiling.trace("align/traceback"):
            ops, nops, reached = traceback_batch(
                dirs, end_i, end_b, ok, W, mode, layout=pend["layout"])
    end_i = end_i[:B]
    end_b = end_b[:B]
    ok = ok[:B]
    ops, nops, reached = ops[:B], nops[:B], reached[:B]
    W2 = W // 2 if mode == "diag" else 0
    se = (end_i - W2 if mode == "diag" else np.zeros_like(end_i)) + end_b
    out = {
        "score": score,
        "ok": ok & reached,
        "ops": ops,
        "nops": nops,
        "qe": end_i,
        "se": np.where(free_end, se, pend["slen"][:B]),
    }
    # dead trailing lanes were sliced off before the device readback;
    # restore the caller's batch width (ok=False for them)
    Bo = pend["B_orig"]
    if Bo > B:
        pad = Bo - B
        out = {
            "score": np.pad(out["score"], (0, pad)),
            "ok": np.pad(out["ok"], (0, pad)),
            "ops": np.pad(out["ops"], ((0, pad), (0, 0)),
                          constant_values=255),
            "nops": np.pad(out["nops"], (0, pad)),
            "qe": np.pad(out["qe"], (0, pad)),
            "se": np.pad(out["se"], (0, pad)),
        }
    return out


def banded_align_batch(q, s, qlen, slen, W: int, mode: str,
                       cfg: AlignConfig | None = None,
                       free_end: bool = False):
    """numpy in, numpy out: fill on device, traceback on host."""
    return banded_align_finish(
        banded_align_dispatch(q, s, qlen, slen, W, mode, cfg, free_end))
