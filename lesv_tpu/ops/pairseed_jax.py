"""Batched device pair seeding — device twin of `ops.pairseed`.

For a batch of (query, subject-window) pairs, find all k-mer matches
(query k-mers at ``q_stride``, subject at stride 1, occupancy caps per
`init_hit_finder.c:26-27,133-205`) entirely on device:

* subject hashes are sorted per lane (one `argsort` — the device
  replacement for the host's per-window `np.argsort`);
* per-query-hash group bounds come from row-wise binary searches
  (`take_along_axis` gathers, log2(S) rounds);
* ragged expansion uses the same fixed-budget slot scheme as
  :mod:`lesv_tpu.ops.seeding_jax`.

Output matches feed :func:`lesv_tpu.ops.chain_jax.chain_lanes` (local
subject offsets fit uint32 trivially).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from lesv_tpu.ops.seeding_jax import _hash_limbs, _LO_BITS

_INVALID = np.int32(0x7FFFFFFF)


def _rowwise_bound(rows, vals, strict: bool):
    """Per-row binary search: insertion index of vals into sorted rows.

    strict=True -> lower bound (first i with rows[i] >= v);
    strict=False -> upper bound (first i with rows[i] > v)."""
    import jax
    import jax.numpy as jnp

    B, N = rows.shape
    M = vals.shape[1]
    iters = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)
    lo = jnp.zeros((B, M), jnp.int32)
    hi = jnp.full((B, M), N, jnp.int32)

    def body(_, c):
        lo, hi = c
        mid = (lo + hi) >> 1
        mv = jnp.take_along_axis(rows, jnp.minimum(mid, N - 1), axis=1)
        go_right = (mv < vals) if strict else (mv <= vals)
        go_right = go_right & (mid < hi)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


@functools.partial(
    __import__("jax").jit,
    static_argnames=("k", "q_stride", "max_occ", "M"))
def _pair_seed_kernel(q, s, qlen, slen, k: int, q_stride: int,
                      max_occ: int, M: int):
    """(B, Qb) x (B, Sb) codes -> padded (B, M) (qoff, soff) matches.

    Returns (qoff i32, soff u32, valid bool, total i32)."""
    import jax.numpy as jnp

    B, Qb = q.shape
    Sb = s.shape[1]
    # single-limb hashes (k <= 15 fits int31: hi < 2^(2k-19))
    qhi, qlo, qok = _hash_limbs(q.astype(jnp.int32), k)
    shi, slo, sok = _hash_limbs(s.astype(jnp.int32), k)
    qh = (qhi << _LO_BITS) | qlo
    sh = (shi << _LO_BITS) | slo

    q_offs = jnp.arange(0, Qb - k + 1, q_stride, dtype=jnp.int32)
    nQ = q_offs.shape[0]
    qh = jnp.take(qh, q_offs, axis=1)
    qok = (jnp.take(qok, q_offs, axis=1)
           & (q_offs[None, :] + k <= qlen[:, None]))
    qh = jnp.where(qok, qh, _INVALID)

    s_pos = jnp.arange(Sb, dtype=jnp.int32)
    sok = sok & (s_pos[None, :] + k <= slen[:, None])
    sh = jnp.where(sok, sh, _INVALID)
    order = jnp.argsort(sh, axis=1, stable=True)
    sh_s = jnp.take_along_axis(sh, order, axis=1)
    soffs_s = jnp.take_along_axis(
        jnp.broadcast_to(s_pos[None, :], (B, Sb)), order, axis=1)

    lo_b = _rowwise_bound(sh_s, qh, strict=True)
    hi_b = _rowwise_bound(sh_s, qh, strict=False)
    scount = hi_b - lo_b
    # query-side occupancy of each query hash
    qh_sorted = jnp.sort(qh, axis=1)
    q_lo = _rowwise_bound(qh_sorted, qh, strict=True)
    q_hi = _rowwise_bound(qh_sorted, qh, strict=False)
    qcount = q_hi - q_lo
    ok = (qok & (scount > 0) & (qcount <= max_occ) & (scount <= max_occ)
          & (scount * qcount <= max_occ))
    cnt = jnp.where(ok, scount, 0)

    cums = jnp.cumsum(cnt, axis=1)
    total = cums[:, -1]
    excl = cums - cnt
    slots = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    seed_of = _rowwise_bound(excl, slots, strict=False) - 1
    seed_of = jnp.clip(seed_of, 0, nQ - 1)
    valid = slots < jnp.minimum(total, M)[:, None]
    r = slots - jnp.take_along_axis(excl, seed_of, axis=1)
    g_c = jnp.take_along_axis(cnt, seed_of, axis=1)
    valid = valid & (r >= 0) & (r < g_c)
    g_lo = jnp.take_along_axis(lo_b, seed_of, axis=1)
    soff = jnp.take_along_axis(
        soffs_s, jnp.clip(g_lo + r, 0, Sb - 1), axis=1)
    qoff = jnp.take(q_offs, jnp.clip(seed_of, 0, nQ - 1))
    soff = jnp.where(valid, soff.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    qoff = jnp.where(valid, qoff, _INVALID)
    return qoff, soff, valid, total


def _pad_pow2(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def pair_matches_batch(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    k: int = 10,   # kDfltMemScKmerSize (cmdline_args.cpp:49)
    q_stride: int = 10,
    max_occ: int = 8,
    M: int = 8192,
    Qb: int | None = None,
    Sb: int | None = None,
):
    """Device k-mer matching of many (query, subject) pairs.

    Pads to one (Qb, Sb) bucket per call (callers pass quantized dims to
    bound the number of compiled shapes); returns host numpy
    (qoff (B, M) i32, soff (B, M) u32 local offsets, valid, total)."""
    import jax.numpy as jnp

    # lane count padded to a 2-value ladder (every distinct B is a
    # separate XLA executable, and loading one through the device tunnel
    # costs seconds; callers chunk at <= 64 pairs)
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()
    B = 16 if len(pairs) <= 16 else 64
    if len(pairs) > 64:
        B = 1 << int(np.ceil(np.log2(len(pairs))))
    Qb = Qb or _pad_pow2(max((len(q) for q, _ in pairs), default=1))
    Sb = Sb or _pad_pow2(max((len(s) for _, s in pairs), default=1))
    q = np.full((B, Qb), 4, np.uint8)
    s = np.full((B, Sb), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    slen = np.zeros(B, np.int32)
    for i, (qi, si) in enumerate(pairs):
        q[i, : len(qi)] = qi
        s[i, : len(si)] = si
        qlen[i] = len(qi)
        slen[i] = len(si)
    qoff, soff, valid, total = _pair_seed_kernel(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen),
        jnp.asarray(slen), k=k, q_stride=q_stride, max_occ=max_occ, M=M)
    # match buffers stay ON DEVICE (the chain DP consumes them there);
    # only the tiny totals come back
    return qoff, soff, valid, np.asarray(total)


@functools.partial(
    jax.jit,
    static_argnames=("k", "q_stride", "max_occ", "M", "J", "max_dq",
                     "max_dr", "bw", "use_pallas", "interp"))
def _pair_seed_chain_jit(q, s, qlen, slen, k, q_stride, max_occ, M,
                         J, max_dq, max_dr, bw, use_pallas, interp):
    """Fused pairwise seeding + seed sort + chain scan: ONE device
    dispatch per chunk (each eager hop costs a tunnel round trip)."""
    from lesv_tpu.ops.chain_jax import sort_scan

    qoff, soff, valid, total = _pair_seed_kernel(
        q, s, qlen, slen, k=k, q_stride=q_stride, max_occ=max_occ, M=M)
    f, p_rel, v, qs, ss, vs = sort_scan(
        qoff, soff, valid, J, k, max_dq, max_dr, bw, use_pallas, interp)
    return f, p_rel, v, qs, ss, vs, total


def pair_chain_lanes_fused(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    k: int,
    q_stride: int,
    max_occ: int,
    M: int,
    Qb: int,
    Sb: int,
    ccfg,
    J: int = 64,
):
    """Chains for a chunk of (q, s) pairs with seeding + sort + chain DP
    as one fused device program.  Returns (chains per pair, total np) —
    lanes whose total exceeds M must be re-done by the caller's host
    oracle."""
    import os

    import jax.numpy as jnp

    from lesv_tpu.ops.chain_jax import (
        _use_pallas_scan,
        extract_lanes,
        fetch_chain_sliced,
    )
    from lesv_tpu.utils import profiling

    B = 16 if len(pairs) <= 16 else 64
    if len(pairs) > 64:
        B = 1 << int(np.ceil(np.log2(len(pairs))))
    q = np.full((B, Qb), 4, np.uint8)
    s = np.full((B, Sb), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    slen = np.zeros(B, np.int32)
    for i, (qi, si) in enumerate(pairs):
        q[i, : len(qi)] = qi
        s[i, : len(si)] = si
        qlen[i] = len(qi)
        slen[i] = len(si)
    with profiling.trace("pairseed/fused_dispatch"):
        f, p_rel, v, qs, ss, vs, total = _pair_seed_chain_jit(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(qlen),
            jnp.asarray(slen), k=k, q_stride=q_stride, max_occ=max_occ,
            M=M, J=J, max_dq=ccfg.max_dist_qry, max_dr=ccfg.max_dist_ref,
            bw=ccfg.max_band_width, use_pallas=_use_pallas_scan(),
            interp=os.environ.get("LESV_TPU_PALLAS") == "interp")
        total = np.asarray(total)            # tiny: (B,) i32
    from lesv_tpu.pipeline.batch_align import _shrink_M

    Mp = _shrink_M(total[: len(pairs)], M)
    with profiling.trace("pairseed/fused_fetch"):
        f, p, v, qs, ss, valid = fetch_chain_sliced(
            f, p_rel, v, qs, ss, total, M, Mp)
    lanes = extract_lanes(f[: len(pairs)], p, v, qs, ss, valid, k, ccfg)
    return lanes[: len(pairs)], total
