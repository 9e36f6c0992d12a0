"""Pallas TPU kernel for the batched chain DP scan.

Same recurrence as :func:`lesv_tpu.ops.chain_jax._chain_scan_kernel`
(the J-lookback formulation of the reference chain scoring,
`/root/reference/src/algo/chain_dp.c:109-170`), restructured for the
hardware: the XLA `lax.scan` shifts four (J, B) carry buffers with
`concatenate` every step — a relayout per buffer per step that measures
~5 ms/step on v5e (43 s for an 8k-seed scan).  Here the J-window lives
on the SUBLANE axis in VMEM scratch and advances with a sublane roll
(~1 elementwise op), exactly the band-on-sublanes layout of
:mod:`lesv_tpu.ops.align_pallas`.

Per seed step (all (J, BT) vector ops):

* score the incoming seed against the J-window (dq/dr/dd gates + the
  min(dq,dr,len) - dd-penalty - log2 term, bit-identical to the scan
  kernel, including the first-max argmax tie rule);
* subject offsets arrive as two i16-range limbs (hi = soff >> 16,
  lo = soff & 0xffff) so genome-scale u32 offsets never overflow i32
  arithmetic: dr is reconstructed only where dhi ∈ {0, 1} (max_dr <
  2^16 makes every other case out of range);
* floor(log2(dd)) uses the f32 exponent-field bitcast (exact for the
  band-width-bounded dd < 2^24);
* the window shifts by one sublane and the new (f, q, shi, slo, v) row
  lands at slot J-1.

Outputs (f, p_rel, v) match the XLA scan kernel bit for bit (tests
cross-check all three against it and the host oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**30)


def _chain_kernel(qoff_ref, shi_ref, slo_ref, ok_ref,
                  f_ref, p_ref, v_ref,
                  fbuf, qbuf, shibuf, slobuf, vbuf,
                  *, MT: int, M: int, J: int, length: int,
                  max_dq: int, max_dr: int, bw: int):
    im = pl.program_id(1)
    BT = fbuf.shape[1]
    bwJ = jax.lax.broadcasted_iota(jnp.int32, (J, BT), 0)   # window slot

    @pl.when(im == 0)
    def _init():
        fbuf[:, :] = jnp.full((J, BT), NEG, jnp.int32)
        qbuf[:, :] = jnp.zeros((J, BT), jnp.int32)
        shibuf[:, :] = jnp.zeros((J, BT), jnp.int32)
        slobuf[:, :] = jnp.zeros((J, BT), jnp.int32)
        vbuf[:, :] = jnp.full((J, BT), NEG, jnp.int32)

    def step(li, _):
        F = fbuf[:, :]
        Q = qbuf[:, :]
        SHI = shibuf[:, :]
        SLO = slobuf[:, :]
        V = vbuf[:, :]
        qi = qoff_ref[pl.ds(li, 1), :]          # (1, BT)
        shi = shi_ref[pl.ds(li, 1), :]
        slo = slo_ref[pl.ds(li, 1), :]
        oki = ok_ref[pl.ds(li, 1), :]           # (1, BT) i32 0/1

        dq = qi - Q                             # (J, BT)
        dhi = shi - SHI
        dlo = slo - SLO
        # dr = dhi*2^16 + dlo, needed only when it can be in (0, max_dr]
        # with max_dr < 2^16: that requires dhi == 0 or (dhi == 1 and
        # dlo < 0); everywhere else dr is out of range by construction
        dhi_ok = (dhi == 0) | (dhi == 1)
        dr = jnp.where(dhi_ok, dhi * 65536 + dlo, 0)
        dr_ok = dhi_ok & (dr > 0) & (dr <= max_dr)
        dd = jnp.abs(jnp.where(dr_ok, dr, 0) - dq)
        okj = ((dq > 0) & (dq <= max_dq) & dr_ok & (dd <= bw)
               & (F > NEG // 2))
        mind = jnp.minimum(jnp.minimum(dq, jnp.where(dr_ok, dr, 0)),
                           length)
        # floor(log2(dd)) via the f32 exponent field (exact for
        # 1 <= dd < 2^24; dd <= bw here)
        expo = (jax.lax.bitcast_convert_type(
            jnp.maximum(dd, 1).astype(jnp.float32), jnp.int32) >> 23) - 127
        logdd = jnp.where(dd > 0, expo, 0)
        sc = mind - (dd * length) // 100 - (logdd >> 1)
        tot = jnp.where(okj, F + sc, NEG)
        best = jnp.max(tot, axis=0, keepdims=True)             # (1, BT)
        # first-max tie rule (XLA argmax parity): lowest window slot
        arg = jnp.min(jnp.where(tot == best, bwJ, J), axis=0,
                      keepdims=True)
        sel = bwJ == arg
        v_arg = jnp.max(jnp.where(sel, V, NEG), axis=0, keepdims=True)
        take = best > length
        f_i = jnp.where(take, best, length)
        v_i = jnp.where(take, jnp.maximum(v_arg, f_i), f_i)
        p_i = jnp.where(take, J - arg, 0)
        okb = oki != 0
        f_i = jnp.where(okb, f_i, NEG)
        v_i = jnp.where(okb, v_i, NEG)

        f_ref[pl.ds(li, 1), :] = f_i
        p_ref[pl.ds(li, 1), :] = p_i
        v_ref[pl.ds(li, 1), :] = v_i

        def push(buf, row):
            r = pltpu.roll(buf[:, :], J - 1, axis=0)
            buf[:, :] = jnp.where(bwJ == J - 1, row, r)

        push(fbuf, f_i)
        push(qbuf, qi)
        push(shibuf, shi)
        push(slobuf, slo)
        push(vbuf, v_i)
        return 0

    hi = jnp.minimum(MT, M - im * MT)
    jax.lax.fori_loop(0, hi, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("J", "length", "max_dq", "max_dr", "bw", "interpret"))
def chain_scan_pallas(qoff, soff, valid, J: int, length: int,
                      max_dq: int, max_dr: int, bw: int,
                      interpret: bool = False):
    """(B, M) sorted seeds -> (f, p_rel, v) (B, M); drop-in for
    `chain_jax._chain_scan_kernel` (soff u32 global offsets)."""
    B, M = qoff.shape
    BT = 128 if B >= 128 else max(8, -(-B // 8) * 8)
    Bp = -(-B // BT) * BT
    MT = min(M, 1024)
    Mp = -(-M // MT) * MT

    def padB(x, fill):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.full((Bp - B, x.shape[1]), fill, x.dtype)], axis=0)

    soff_i = soff.astype(jnp.int32)             # u32 bit pattern
    shi = jnp.right_shift(soff_i, 16) & 0xFFFF  # logical >> via mask
    slo = soff_i & 0xFFFF
    qT = padB(qoff, 0x7FFFFFFF).T
    shiT = padB(shi, 0xFFFF).T
    sloT = padB(slo, 0xFFFF).T
    okT = padB(valid.astype(jnp.int32), 0).T
    if Mp != M:
        padM = lambda x, fill: jnp.concatenate(
            [x, jnp.full((Mp - M, x.shape[1]), fill, x.dtype)], axis=0)
        qT, shiT, sloT, okT = (padM(qT, 0x7FFFFFFF), padM(shiT, 0xFFFF),
                               padM(sloT, 0xFFFF), padM(okT, 0))

    kern = functools.partial(
        _chain_kernel, MT=MT, M=Mp, J=J, length=length,
        max_dq=max_dq, max_dr=max_dr, bw=bw)
    grid = (Bp // BT, Mp // MT)
    spec_in = pl.BlockSpec((MT, BT), lambda ib, im: (im, ib),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_in] * 4,
        out_specs=tuple([spec_in] * 3),
        out_shape=tuple(jax.ShapeDtypeStruct((Mp, Bp), jnp.int32)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((J, BT), jnp.int32) for _ in range(5)],
        interpret=interpret,
    )(qT, shiT, sloT, okT)
    f, p, v = (x.T[:B, :M] for x in out)
    return f, p, v
