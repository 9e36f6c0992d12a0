"""Pallas TPU kernel for the banded dual-affine alignment fill.

Same recurrences and direction-byte encoding as
:func:`lesv_tpu.ops.align_jax.banded_align_kernel` (the XLA `lax.scan`
formulation, itself cell-identical to the :mod:`lesv_tpu.ops.align_np`
oracle — the ksw2-extd2 cost model of the reference,
`/root/reference/src/algo/ksw2_extd2_sse.c`), restructured as a single
fused kernel.

Layout (measured on v5e): the band lives on the SUBLANE axis and the
batch on the LANE axis, i.e. all DP state is (W, BT).  The recurrence
needs ~20 shifted reads of the band per row (5 neighbour shifts +
2 log2(W)-step prefix-max scans for the within-row affine-gap
dependency); a lane roll costs ~10 elementwise ops on this hardware
while a sublane roll costs ~1, so band-on-sublanes is ~3x faster than
band-on-lanes end to end.

* grid = (batch tiles, query-row tiles); DP state persists in VMEM
  scratch across the row tiles of one batch tile;
* per-row sequence access (query char, subject byte entering the sliding
  band window) indexes the leading (sublane) axis of pre-shifted
  (Rpad, B) arrays — Mosaic allows dynamic leading-dim reads, unlike
  dynamic lane slices;
* direction bytes stream straight to HBM in (row, band, batch) layout —
  no post-fill transpose (the XLA path pays a full HBM round trip);
* row tiles past the tile's longest query are skipped.

The traceback stays on the host (:func:`lesv_tpu.ops.align_jax
.traceback_batch` handles this layout via strides).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lesv_tpu.config import AlignConfig

# Bench-only ablation switches, read ONCE at import (they are jit-cache
# keys by construction: changing them mid-process has no effect).
#   LESV_TPU_ABLATE=noscan|nodirs  -- produce WRONG results for timing
#   LESV_TPU_SHIFT=concat          -- slice+concat shifts instead of rolls
# Ablations corrupt alignment output; tools/kbench.py is the only
# sanctioned user.  A loud banner guards against a leaked env var.
_ABLATE = os.environ.get("LESV_TPU_ABLATE", "")
_SHIFT = os.environ.get("LESV_TPU_SHIFT", "")
_ROW_UNROLL = os.environ.get("LESV_TPU_ROW_UNROLL", "1")
_QT_CAP = int(os.environ.get("LESV_TPU_QT_CAP", "0"))
if _ABLATE:
    print(
        f"lesv_tpu: WARNING: LESV_TPU_ABLATE={_ABLATE!r} is set — the "
        "Pallas alignment kernel will produce WRONG results (bench-only "
        "ablation mode).",
        file=sys.stderr, flush=True)

NEG = -(2**28)
NEG16 = -16384          # i16 sentinel (see _i16_ok for the bound proof)
_INF32 = np.int32(2**30)


def _tile_shape(B: int, W: int, free_end: bool,
                esz: int = 4) -> tuple[int, int]:
    """(BT, QT): batch-tile and query-row-tile sizes.

    VMEM budget: batch rides the LANE axis, which the hardware pads to
    128 lanes, so all per-tile buffers cost 128 lanes regardless of BT.
    The row body keeps ~12 live (W, 128) temporaries on the Mosaic
    stack on top of the declared scratch/blocks.  ``esz`` is the DP
    state element size (4 for i32, 2 for the i16 variant)."""
    BT = 128 if B >= 128 else max(8, -(-B // 8) * 8)
    L = 128
    n_state = 8 if free_end else 6
    n_out = 3 if free_end else 1
    fixed = ((n_state + 14) * W * L * esz   # scratch + live temporaries
             + 2 * n_out * W * L * esz      # out blocks (dbl-buffered)
             + W * L * 4)                   # win0
    budget = 12 * 1024 * 1024 - fixed       # 16M scoped limit, ~4M slack
    QT = budget // (2 * W * L + 16 * L)     # dirs (dbl) + q/e (i32, dbl)
    QT = max(8, min(256, (QT // 8) * 8))
    return BT, QT


def _i16_ok(Qmax: int, W: int, match: int, mism: int, go1: int, ge1: int,
            go2: int, ge2: int) -> bool:
    """True when the i16 kernel is bit-identical to the i32 kernel.

    The DP is a max over paths, so every valid in-band cell has
    H >= -(mism*Qmax + gpath) (all-mismatch diagonal plus one gap run of
    length <= Qmax + W at the cheaper of the two affine costs); E/F
    registers sit at most gmax_reg = max(go + ge*(W+1)) below an H value
    on any traceback-relevant chain.  Three conditions make i16 exact:

    1. THR separation: every traceback-relevant register value clears
       THR = NEG16 + gmax_reg + 16, so the mask tests agree with i32's
       NEG//2 tests wherever the traceback can look.
    2. No wraparound: masked F registers drift down ge per row from
       NEG16 (or from a real value that lost its H source), bounded by
       hmin + go + Qmax*ge + gmax_reg; that must stay above i16 min,
       otherwise modular arithmetic could poison a max.
    3. Positive side: match*Qmax + ge*(W+1) within range.

    Cells the traceback cannot visit may hold different bytes than the
    i32 kernel (deep drifted values clamp at THR differently) — scores,
    endpoints, and decoded op paths are identical (tests assert this)."""
    ge = max(ge1, ge2)
    gmax_reg = max(go1 + ge1 * (W + 1), go2 + ge2 * (W + 1))
    L = Qmax + W
    gpath = min(go1 + ge1 * L, go2 + ge2 * L)
    hmin = mism * Qmax + gpath
    real_reg_min = hmin + gmax_reg + max(go1 + ge1, go2 + ge2)
    if real_reg_min >= 16384 - gmax_reg - 64:       # THR separation
        return False
    if 16384 + go1 + go2 + Qmax * ge + gmax_reg + 128 >= 32768:
        return False                                # sentinel drift wrap
    if hmin + go1 + go2 + Qmax * ge + gmax_reg + 128 >= 32768:
        return False                                # real drift wrap
    if match * Qmax + ge * (W + 1) >= 16000:        # positive overflow
        return False
    return True


def pallas_supported(B: int, Qmax: int, Smax: int, W: int,
                     free_end: bool = False) -> bool:
    """Shape gate: per-tile buffers must fit VMEM comfortably."""
    if W > 1024 or Qmax > (1 << 20):
        return False
    L = 128
    n_state = 8 if free_end else 6
    n_out = 3 if free_end else 1
    fixed = (n_state + 14 + 2 * n_out + 1) * W * L * 4
    return fixed + 8 * (2 * W * L + 16 * L) < 12 * 1024 * 1024


def _fill_kernel(qlen_ref, slen_ref, q_ref, e_ref, win0_ref, dirs_ref,
                 hfin_ref, *refs,
                 QT: int, W: int, Qmax: int, mode: str, free_end: bool,
                 match: int, mism: int, go1: int, ge1: int, go2: int,
                 ge2: int, i16: bool = False):
    if free_end:
        (bv_ref, br_ref,
         h_s, e1_s, e2_s, f1_s, f2_s, win_s, bv_s, br2_s) = refs
    else:
        h_s, e1_s, e2_s, f1_s, f2_s, win_s = refs
        bv_ref = br_ref = bv_s = br2_s = None
    iq = pl.program_id(1)
    BT = h_s.shape[1]
    W2 = W // 2
    diag_mode = mode == "diag"
    # i16 variant: same recurrences at half the register pressure; the
    # _i16_ok gate guarantees no value can leave i16 range, so cells are
    # bit-identical to the i32 kernel.  jge rebases by the row constant
    # (i-W2)*ge, which cancels between the scan and the reconstruction,
    # so only bw*ge (bounded by ge*(W+1)) enters the arithmetic.
    dt = jnp.int16 if i16 else jnp.int32
    NEG = NEG16 if i16 else -(2**28)
    ge = max(ge1, ge2)
    gmax = max(go1 + ge1 * (W + 1), go2 + ge2 * (W + 1))
    THR = (NEG16 + gmax + 16) if i16 else NEG // 2

    bw = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 0)   # band slot
    bwge1 = (bw * ge1).astype(dt)
    bwge2 = (bw * ge2).astype(dt)
    qlen = qlen_ref[:, :]                                  # (1, BT)
    slen = slen_ref[:, :]

    i0 = iq * QT
    qmax_tile = jnp.max(qlen)

    @pl.when(iq == 0)
    def _init():
        # row 0: H/E/F boundary + dir0 byte.  Computed in i32 (masks on
        # i16 data would need unsupported i1 relayouts), cast at store.
        js0 = (bw - W2) if diag_mode else bw
        in0 = (js0 >= 0) & (js0 <= slen)
        e1 = jnp.where(js0 > 0, -go1 - js0 * ge1, NEG)
        e2 = jnp.where(js0 > 0, -go2 - js0 * ge2, NEG)
        h = jnp.where(js0 == 0, 0, jnp.maximum(e1, e2))
        h = jnp.where(in0, h, NEG)
        e1 = jnp.where(in0, e1, NEG)
        e2 = jnp.where(in0, e2, NEG)
        h_s[:, :] = h.astype(dt)
        e1_s[:, :] = e1.astype(dt)
        e2_s[:, :] = e2.astype(dt)
        f1_s[:, :] = jnp.full((W, BT), NEG, dt)
        f2_s[:, :] = jnp.full((W, BT), NEG, dt)
        win_s[:, :] = win0_ref[:, :]
        dir0 = jnp.where(e1 >= e2, 1, 2) | 0x18
        dirs_ref[0] = dir0.astype(jnp.uint8)
        if free_end:
            bv_s[:, :] = jnp.full((W, BT), NEG, dt)
            br2_s[:, :] = jnp.zeros((W, BT), dt)

    @pl.when(i0 <= qmax_tile)
    def _tile():
        # i16: Mosaic has no 16-bit sublane rotate on current libtpu, but
        # static slice+concatenate lowers fine and folds the edge mask
        # into the fill rows.  i32 keeps the measured-faster roll form.
        _ablate = _ABLATE

        if i16 or _SHIFT == "concat":
            def shift_p1(x):    # x[b+1]
                return jnp.concatenate(
                    [x[1:], jnp.full((1, BT), NEG, x.dtype)], axis=0)

            def shift_m1(x):    # x[b-1]
                return jnp.concatenate(
                    [jnp.full((1, BT), NEG, x.dtype), x[:-1]], axis=0)

            def cummax(x):
                # inclusive prefix max along the band (sublanes)
                if _ablate == "noscan":     # timing ablation: WRONG results
                    return x
                k = 1
                while k < W:
                    x = jnp.maximum(x, jnp.concatenate(
                        [jnp.full((k, BT), NEG, x.dtype), x[:-k]], axis=0))
                    k *= 2
                return x
        else:
            def shift_p1(x):    # x[b+1]  (circular roll W-1 == roll -1)
                r = pltpu.roll(x, W - 1, axis=0)
                return jnp.where(bw == W - 1, NEG, r)

            def shift_m1(x):    # x[b-1]
                r = pltpu.roll(x, 1, axis=0)
                return jnp.where(bw == 0, NEG, r)

            def cummax(x):
                # inclusive prefix max along the band (sublanes)
                if _ablate == "noscan":     # timing ablation: WRONG results
                    return x
                k = 1
                while k < W:
                    x = jnp.maximum(
                        x, jnp.where(bw >= k,
                                     pltpu.roll(x, k, axis=0), NEG))
                    k *= 2
                return x

        # i16: all vector comparisons must run on 16-bit operands (i1
        # masks cannot relayout between 32- and 16-bit tilings), so the
        # index/length vectors get one-time 16-bit copies.  Values fit:
        # the _i16_ok gate bounds Qmax + W well under 2**15.  The VPU
        # also has no ordered 16-bit compare — emulate via max + eq.
        bwv = bw.astype(dt)
        qlenv = qlen.astype(dt)
        slenv = slen.astype(dt)
        if i16:
            def _ge(a, b):      # a >= b
                return jnp.maximum(a, b) == a

            def _gt(a, b):      # a > b  (max != b  <=>  not b >= a)
                return jnp.maximum(a, b) != b

            def _le(a, b):      # a <= b
                return jnp.maximum(a, b) == b
        else:
            def _ge(a, b):
                return a >= b

            def _gt(a, b):
                return a > b

            def _le(a, b):
                return a <= b

        def row(li, _):
            H = h_s[:, :]
            E1 = e1_s[:, :]
            E2 = e2_s[:, :]
            F1 = f1_s[:, :]
            F2 = f2_s[:, :]
            swin = win_s[:, :]
            i = i0 + li
            # Mosaic supports only i1/i32 scalars: make the 16-bit row
            # counter a (1, BT) vector (broadcast in i32, then pack)
            iv = jnp.full((1, BT), i, jnp.int32).astype(dt)
            qc = q_ref[pl.ds(li, 1), :]                    # (1, BT)
            if diag_mode:
                # advance the window: swin becomes s_pad[i : i+W]
                ent = e_ref[pl.ds(li, 1), :]
                swin = jnp.where(bw == W - 1, ent,
                                 pltpu.roll(swin, W - 1, axis=0))
                win_s[:, :] = swin
            js = ((iv - W2) + bwv) if diag_mode else bwv
            inb = _ge(js, 0) & _le(js, slenv)
            if diag_mode:
                Hd = H
                Hu = shift_p1(H)
                F1u = shift_p1(F1)
                F2u = shift_p1(F2)
            else:
                Hd = shift_m1(H)
                Hu = H
                F1u = F1
                F2u = F2
            sub = jnp.where(swin == qc, match, -mism).astype(dt)
            # (js >= 1) is implied: the diag source cell was itself
            # NEG-masked out of band at its own row when js-1 < 0
            diag = jnp.where(_ge(js, 1) & _gt(Hd, THR), Hd + sub,
                             dt(NEG))
            F1e = F1u - dt(ge1)
            F2e = F2u - dt(ge2)
            F1n = jnp.maximum(Hu - dt(go1 + ge1), F1e)
            F2n = jnp.maximum(Hu - dt(go2 + ge2), F2e)
            F1ext = F1n == F1e
            F2ext = F2n == F2e
            Hpre = jnp.maximum(diag, jnp.maximum(F1n, F2n))
            # scan bases rebased by the row constant (i-W2)*ge — it
            # cancels in E = roll(cummax(base)) - go - jge, so only
            # bw*ge enters (this is what keeps the i16 variant in range)
            hpre_ok = _gt(Hpre, THR)
            base1 = jnp.where(hpre_ok, Hpre + bwge1, dt(NEG))
            run1 = cummax(base1)
            E1n = shift_m1(run1)
            E1n = jnp.where(_gt(E1n, THR), E1n - dt(go1) - bwge1,
                            dt(NEG))
            base2 = jnp.where(hpre_ok, Hpre + bwge2, dt(NEG))
            run2 = cummax(base2)
            E2n = shift_m1(run2)
            E2n = jnp.where(_gt(E2n, THR), E2n - dt(go2) - bwge2,
                            dt(NEG))
            E1ext = (bwv == 0) | (E1n == shift_m1(E1n) - dt(ge1))
            E2ext = (bwv == 0) | (E2n == shift_m1(E2n) - dt(ge2))
            Hn = jnp.maximum(Hpre, jnp.maximum(E1n, E2n))
            Hn = jnp.where(inb, Hn, dt(NEG))
            if _ablate == "nodirs":         # timing ablation: WRONG results
                dirsb = Hn.astype(jnp.uint8)
            else:
                src = jnp.where(Hn == diag, dt(0),
                      jnp.where(Hn == E1n, dt(1),
                      jnp.where(Hn == E2n, dt(2),
                      jnp.where(Hn == F1n, dt(3), dt(4)))))
                dirsb = (src
                         | (E1ext.astype(dt) << 3)
                         | (E2ext.astype(dt) << 4)
                         | (F1ext.astype(dt) << 5)
                         | (F2ext.astype(dt) << 6)).astype(jnp.uint8)

            @pl.when(i >= 1)
            def _store():
                dirs_ref[li] = dirsb

            active = _ge(iv, 1) & _le(iv, qlenv)           # (1, BT)
            h_s[:, :] = jnp.where(active, Hn, H)
            e1_s[:, :] = jnp.where(active, E1n, E1)
            e2_s[:, :] = jnp.where(active, E2n, E2)
            f1_s[:, :] = jnp.where(active, F1n, F1)
            f2_s[:, :] = jnp.where(active, F2n, F2)
            if free_end:
                bv = bv_s[:, :]
                upd = active & _gt(Hn, bv)
                bv_s[:, :] = jnp.where(upd, Hn, bv)
                br2_s[:, :] = jnp.where(upd, iv, br2_s[:, :])
            return 0

        # static bound (row tiles are sized so nq*QT rows pad Qmax+1 by
        # < 8*nq): Mosaic supports full unroll only, so small QT tiles
        # fully unroll (amortizes the per-row loop overhead that
        # dominates small-W fills)
        jax.lax.fori_loop(0, QT, row, 0,
                          unroll=QT if _ROW_UNROLL == "full" else 1)

    hfin_ref[:, :] = h_s[:, :]
    if free_end:
        bv_ref[:, :] = bv_s[:, :]
        br_ref[:, :] = br2_s[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("W", "mode", "free_end", "match", "mismatch", "go1",
                     "ge1", "go2", "ge2", "interpret", "i16"))
def _pallas_fill_jit(q, s, qlen, slen, W, mode, free_end, match, mismatch,
                     go1, ge1, go2, ge2, interpret=False, i16=False):
    """Launch the fill; returns (dirs (Rpad, W, B) u8, Hfin (B, W),
    bestv (B, W), bestr (B, W)) — H/best in i32 with the NEG sentinel
    regardless of the kernel's internal dtype."""
    B, Qmax = q.shape
    W2 = W // 2
    dt = jnp.int16 if i16 else jnp.int32
    BT, QT = _tile_shape(B, W, free_end, esz=2 if i16 else 4)
    assert B % BT == 0
    if _QT_CAP:
        QT = min(QT, _QT_CAP)
    nq = -(-(Qmax + 1) // QT)
    # shrink QT to the tightest multiple of 8 covering Qmax+1 in nq
    # tiles: the kernel's row loop then has the STATIC bound QT
    # (unrollable) at < 8*nq rows of padding waste
    QT = -(-(-(-(Qmax + 1) // nq)) // 8) * 8
    Rpad = nq * QT
    nb = B // BT

    # padded subject (mirrors align_jax s_pad): window for row i is
    # s_pad[:, i : i+W] (diag) / s_pad[:, 0:W] (full)
    pad_l = W2 + 1 if mode == "diag" else 1
    sw = pad_l + max(W, s.shape[1],
                     Qmax + W + 2 if mode == "diag" else 0)
    s_pad = jnp.full((B, sw), 255, jnp.uint8)
    s_pad = jax.lax.dynamic_update_slice(s_pad, s, (0, pad_l))
    if mode == "diag":
        win0 = jax.lax.dynamic_slice(s_pad, (0, 0), (B, W))
        # subject byte entering the window at row i: s_pad[:, i+W-1]
        e_in = jax.lax.dynamic_slice(
            jnp.pad(s_pad, ((0, 0), (0, Rpad + W)), constant_values=255),
            (0, W - 1), (B, Rpad))
    else:
        win0 = jax.lax.dynamic_slice(
            jnp.pad(s_pad, ((0, 0), (0, W)), constant_values=255),
            (0, 0), (B, W))
        e_in = jnp.zeros((B, Rpad), jnp.uint8)
    if mode == "diag":
        # pre-window one step before row 0 (the kernel advances before
        # using the window at every row, including the dummy row 0)
        win0 = jnp.concatenate(
            [jnp.full((B, 1), 255, jnp.uint8), win0[:, : W - 1]], axis=1)
    # q char consumed at row i: q[:, i-1]  ->  qs[:, i] = q[:, i-1]
    qs = jnp.pad(q, ((0, 0), (1, 0)))
    qs = jnp.pad(qs, ((0, 0), (0, Rpad - qs.shape[1])))

    kern = functools.partial(
        _fill_kernel, QT=QT, W=W, Qmax=Qmax, mode=mode, free_end=free_end,
        match=match, mism=mismatch, go1=go1, ge1=ge1, go2=go2, ge2=ge2,
        i16=i16)
    grid = (nb, nq)
    n_out = 3 if free_end else 1
    # outs: hfin [+ bestv, bestr], all dt (best row fits i16 when gated)
    out_shape = tuple(
        [jax.ShapeDtypeStruct((Rpad, W, B), jnp.uint8)]
        + [jax.ShapeDtypeStruct((W, B), dt)] * n_out)
    # scratch: h/e1/e2/f1/f2 (dt), win (seq codes, i32) [+ bestv, bestr]
    scratch = ([pltpu.VMEM((W, BT), dt) for _ in range(5)]
               + [pltpu.VMEM((W, BT), jnp.int32)]
               + ([pltpu.VMEM((W, BT), dt)] * 2 if free_end else []))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BT), lambda ib, iq: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda ib, iq: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, BT), lambda ib, iq: (iq, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QT, BT), lambda ib, iq: (iq, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, BT), lambda ib, iq: (0, ib),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((QT, W, BT), lambda ib, iq: (iq, 0, ib),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((W, BT), lambda ib, iq: (0, ib),
                            memory_space=pltpu.VMEM)] * n_out),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(qlen[None, :], slen[None, :], qs.T.astype(jnp.int32),
      e_in.T.astype(jnp.int32), win0.T.astype(jnp.int32))

    def widen(x):
        # i16 -> i32 with sentinel remap: values at/below THR are masked
        # (real values clear THR by construction, see _i16_ok)
        if not i16:
            return x
        ge = max(ge1, ge2)
        gmax = max(go1 + ge1 * (W + 1), go2 + ge2 * (W + 1))
        thr = NEG16 + gmax + 16
        x32 = x.astype(jnp.int32)
        return jnp.where(x32 > thr, x32, NEG)

    if free_end:
        dirs, hfin, bestv, bestr = out
        return (dirs, widen(hfin).T, widen(bestv).T,
                bestr.astype(jnp.int32).T)
    dirs, hfin = out
    return dirs, widen(hfin).T, None, None


_I16_BROKEN = False     # set if Mosaic rejects the i16 lowering


def _is_lowering_error(e: Exception) -> bool:
    """True for Mosaic/Pallas *lowering* failures (the only failures the
    i16->i32 fallback may swallow); OOMs, tunneling errors, and genuine
    kernel bugs must propagate."""
    msg = f"{type(e).__name__}: {e}"
    needles = ("Mosaic", "mosaic", "lowering", "Lowering",
               "Unsupported", "not implemented", "NotImplemented")
    blockers = ("RESOURCE_EXHAUSTED", "out of memory", "Out of memory")
    return any(n in msg for n in needles) and not any(
        b in msg for b in blockers)


def pallas_banded_align_kernel(q, s, qlen, slen, W: int, mode: str,
                               cfg: AlignConfig, free_end: bool = False,
                               interpret: bool = False,
                               force_i16: bool | None = None):
    """Drop-in fill matching `align_jax.banded_align_kernel` outputs,
    except ``dirs`` is (Rpad, W, B) with Rpad >= Qmax+1 (row, band,
    batch).  Small-score buckets run the i16 kernel (half the VPU
    register pressure, bit-identical — see _i16_ok); set ``force_i16``
    to pin either variant (tests)."""
    global _I16_BROKEN
    B, Qmax = q.shape
    W2 = W // 2
    i16 = _i16_ok(Qmax, W, cfg.match, cfg.mismatch, cfg.gap_open1,
                  cfg.gap_ext1, cfg.gap_open2,
                  cfg.gap_ext2) and not _I16_BROKEN
    if force_i16 is not None:
        i16 = force_i16
    try:
        dirs, hfin, bestv, bestr = _pallas_fill_jit(
            q, s, qlen, slen, W, mode, free_end, cfg.match, cfg.mismatch,
            cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2,
            interpret=interpret, i16=i16)
    except Exception as e:
        if not i16 or force_i16 or not _is_lowering_error(e):
            raise
        _I16_BROKEN = True      # Mosaic i16 lowering unavailable: fall back
        print(f"lesv_tpu: i16 Pallas lowering failed ({type(e).__name__}); "
              "falling back to the i32 kernel for this process",
              file=sys.stderr, flush=True)
        dirs, hfin, bestv, bestr = _pallas_fill_jit(
            q, s, qlen, slen, W, mode, free_end, cfg.match, cfg.mismatch,
            cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2,
            interpret=interpret, i16=False)
    if free_end:
        best = jnp.max(bestv, axis=1)
        hit = bestv == best[:, None]
        rows = jnp.where(hit, bestr, _INF32)
        rmin = jnp.min(rows, axis=1)
        end_b = jnp.argmax(hit & (bestr == rmin[:, None]), axis=1)
        end_b = end_b.astype(jnp.int32)
        # "nothing beats the origin" reproduces the scan kernel exactly:
        # best stays at H(0, origin)=0, end=(0, 0)
        none = best <= 0
        score = jnp.where(none, 0, best)
        end_i = jnp.where(none, 0, rmin)
        end_b = jnp.where(none, 0, end_b)
    else:
        end_i = qlen
        gq = (qlen - W2) if mode == "diag" else jnp.zeros_like(qlen)
        end_b = slen - gq
        score = jnp.take_along_axis(
            hfin, jnp.clip(end_b, 0, W - 1)[:, None], axis=1)[:, 0]
    ok = (end_b >= 0) & (end_b < W) & (score > NEG // 2)
    return dirs, score, end_i, end_b, ok
