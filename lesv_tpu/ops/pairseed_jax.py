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
_INV_U32 = np.uint32(0xFFFFFFFF)


def pack_codes(codes: np.ndarray):
    """Host-side 2-bit packing of a (B, L) uint8 code batch (L % 8 == 0).

    Returns (packed (B, L//4) u8, amb (B, L//8) u8 bitmask): the h2d
    upload shrinks 1 byte/base -> 0.375 (the tunnel's h2d bandwidth is
    part of every dispatch's critical path).  Ambiguous codes (>= 4)
    pack as 0 with their bit set in ``amb``."""
    amb = codes >= 4
    c = np.where(amb, 0, codes).astype(np.uint8)
    b = c.reshape(c.shape[0], -1, 4)
    packed = (b[:, :, 0] | (b[:, :, 1] << 2)
              | (b[:, :, 2] << 4) | (b[:, :, 3] << 6))
    ambbits = np.packbits(amb, axis=1, bitorder="little")
    return np.ascontiguousarray(packed), np.ascontiguousarray(ambbits)


def unpack_codes(packed, amb):
    """Device-side inverse of :func:`pack_codes` (traced)."""
    import jax.numpy as jnp

    B = packed.shape[0]
    L = packed.shape[1] * 4
    p = packed.astype(jnp.int32)
    c = jnp.stack([p & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3],
                  axis=2).reshape(B, L)
    a = amb.astype(jnp.int32)
    bits = jnp.stack([(a >> i) & 1 for i in range(8)],
                     axis=2).reshape(B, L)
    return jnp.where(bits == 1, 4, c).astype(jnp.uint8)


def expand_slots(cnt, M: int):
    """Budgeted ragged expansion: per-seed counts -> per-slot owner.

    For (B, nQ) int32 counts, returns (seed_of (B, M) i32, r (B, M) i32,
    valid (B, M) bool, total (B,) i32): slot m of lane b belongs to seed
    ``seed_of[b, m]`` as its ``r``-th item; slots past min(total, M) are
    invalid.  Implemented as a merge of the exclusive-cumsum boundaries
    with the slot ids via two variadic `lax.sort`s (a per-row binary
    search needs ~log2(M) gather rounds on TPU; one bitonic sort with a
    carried payload is ~10x cheaper there)."""
    import jax.numpy as jnp
    from jax import lax

    B, nQ = cnt.shape
    cums = jnp.cumsum(cnt, axis=1)
    total = cums[:, -1]
    excl = cums - cnt
    # merged keys: seed boundary at excl (sorts before slot j == excl so
    # that #(excl <= j) counts it), slot j at 2j+1
    ekey = (excl.astype(jnp.uint32) << 1)
    skey = ((jnp.arange(M, dtype=jnp.uint32) << 1) | 1)[None, :]
    mkeys = jnp.concatenate(
        [ekey, jnp.broadcast_to(skey, (B, M))], axis=1)
    mpay = jnp.concatenate([
        jnp.full((B, nQ), _INV_U32, jnp.uint32),
        jnp.broadcast_to(jnp.arange(M, dtype=jnp.uint32)[None, :], (B, M)),
    ], axis=1)
    _, mp_s = lax.sort((mkeys, mpay), dimension=1, is_stable=True,
                       num_keys=1)
    pos = jnp.broadcast_to(
        jnp.arange(nQ + M, dtype=jnp.int32)[None, :], (B, nQ + M))
    # bring slots back to slot order, carrying their merged position
    _, pos_of = lax.sort((mp_s, pos), dimension=1, is_stable=True,
                         num_keys=1)
    slots_i = jnp.arange(M, dtype=jnp.int32)[None, :]
    seed_of = pos_of[:, :M] - slots_i - 1     # == #(excl <= j) - 1
    seed_of = jnp.clip(seed_of, 0, nQ - 1)
    valid = jnp.broadcast_to(slots_i, (B, M)) \
        < jnp.minimum(total, M)[:, None]
    r = slots_i - jnp.take_along_axis(excl, seed_of, axis=1)
    g_c = jnp.take_along_axis(cnt, seed_of, axis=1)
    valid = valid & (r >= 0) & (r < g_c)
    return seed_of, r, valid, total


@functools.partial(
    __import__("jax").jit,
    static_argnames=("k", "q_stride", "max_occ", "M"))
def _pair_seed_kernel(q, s, qlen, slen, k: int, q_stride: int,
                      max_occ: int, M: int):
    """(B, Qb) x (B, Sb) codes -> padded (B, M) (qoff, soff) matches.

    Returns (qoff i32, soff u32, valid bool, total i32).

    One combined variadic sort merge-joins the query seed hashes against
    the subject hashes (`init_hit_finder.c:133-205` semantics: subject
    stride 1, query stride ``q_stride``, occupancy caps) — per-row
    binary-search gathers are the TPU antipattern this replaces."""
    import jax.numpy as jnp
    from jax import lax

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

    s_pos = jnp.arange(Sb, dtype=jnp.int32)
    sok = sok & (s_pos[None, :] + k <= slen[:, None])

    # combined sort: key = hash*2 + is_query (ties put subject entries
    # first), payloads = origin tag and (position | seed index)
    skey = jnp.where(sok, sh.astype(jnp.uint32) << 1, _INV_U32)
    qkey = jnp.where(qok, (qh.astype(jnp.uint32) << 1) | 1, _INV_U32)
    keys = jnp.concatenate([skey, qkey], axis=1)           # (B, N)
    tag = jnp.concatenate([
        jnp.zeros((B, Sb), jnp.int32),
        jnp.ones((B, nQ), jnp.int32)], axis=1)
    pay = jnp.concatenate([
        jnp.broadcast_to(s_pos[None, :], (B, Sb)),
        jnp.broadcast_to(jnp.arange(nQ, dtype=jnp.int32)[None, :],
                         (B, nQ))], axis=1)
    keys_s, tag_s, pay_s = lax.sort((keys, tag, pay), dimension=1,
                                    is_stable=True, num_keys=1)
    live = keys_s != _INV_U32
    is_s = ((tag_s == 0) & live).astype(jnp.int32)
    is_q = ((tag_s == 1) & live).astype(jnp.int32)
    hash_s = keys_s >> 1
    csh = jnp.cumsum(is_s, axis=1)                  # inclusive s count
    cq = jnp.cumsum(is_q, axis=1)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), hash_s[:, 1:] != hash_s[:, :-1]], axis=1)
    last = jnp.concatenate(
        [first[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    # per-run aggregates via monotone prefix/suffix extrema
    lo_run = lax.cummax(jnp.where(first, csh - is_s, -1), axis=1)
    qex_run = lax.cummax(jnp.where(first, cq - is_q, -1), axis=1)
    cq_end = jnp.flip(lax.cummin(
        jnp.flip(jnp.where(last, cq, _INVALID), 1), axis=1), 1)
    # at a query entry: subject entries of its hash all sort before it
    scount_pos = csh - lo_run
    qtot_pos = cq_end - qex_run
    # scatter per-seed values back to seed order (q entries carry their
    # seed index; everything else sorts behind the first nQ slots)
    key2 = jnp.where(tag_s == 1, pay_s.astype(jnp.uint32), _INV_U32)
    _, lo_b, scount, qcount = lax.sort(
        (key2, lo_run, scount_pos, qtot_pos), dimension=1,
        is_stable=True, num_keys=1)
    lo_b = lo_b[:, :nQ]
    scount = scount[:, :nQ]
    qcount = qcount[:, :nQ]
    # subject positions compacted in hash order (lo_b indexes this)
    key3 = jnp.where(tag_s == 0, keys_s, _INV_U32)
    _, soffs_s = lax.sort((key3, pay_s), dimension=1, is_stable=True,
                          num_keys=1)

    ok = (qok & (scount > 0) & (qcount <= max_occ) & (scount <= max_occ)
          & (scount * qcount <= max_occ))
    cnt = jnp.where(ok, scount, 0)
    seed_of, r, valid, total = expand_slots(cnt, M)
    g_lo = jnp.take_along_axis(lo_b, seed_of, axis=1)
    soff = jnp.take_along_axis(
        soffs_s, jnp.clip(g_lo + r, 0, soffs_s.shape[1] - 1), axis=1)
    qoff = jnp.take(q_offs, seed_of)
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
def _pair_seed_chain_jit(qp, qamb, sp, samb, qlen, slen, k, q_stride,
                         max_occ, M, J, max_dq, max_dr, bw, use_pallas,
                         interp):
    """Fused pairwise seeding + seed sort + chain scan: ONE device
    dispatch per chunk (each eager hop costs a tunnel round trip);
    sequences arrive 2-bit packed (pack_codes) to cut the upload 2.7x."""
    from lesv_tpu.ops.chain_jax import sort_scan

    q = unpack_codes(qp, qamb)
    s = unpack_codes(sp, samb)
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
        qp, qamb = pack_codes(q)
        sp, samb = pack_codes(s)
        f, p_rel, v, qs, ss, vs, total = _pair_seed_chain_jit(
            jnp.asarray(qp), jnp.asarray(qamb), jnp.asarray(sp),
            jnp.asarray(samb), jnp.asarray(qlen),
            jnp.asarray(slen), k=k, q_stride=q_stride, max_occ=max_occ,
            M=M, J=J, max_dq=ccfg.max_dist_qry, max_dr=ccfg.max_dist_ref,
            bw=ccfg.max_band_width, use_pallas=_use_pallas_scan(),
            interp=os.environ.get("LESV_TPU_PALLAS") == "interp")
        total = np.asarray(total)            # tiny: (B,) i32
    from lesv_tpu.pipeline.batch_align import _shrink_M

    Mp = _shrink_M(total[: len(pairs)], M)
    with profiling.trace("pairseed/fused_fetch"):
        f, p, v, qs, ss, valid = fetch_chain_sliced(
            f, p_rel, v, qs, ss, total, M, Mp,
            q16=Qb < 65536, s16=Sb < 65536)
    lanes = extract_lanes(f[: len(pairs)], p, v, qs, ss, valid, k, ccfg)
    return lanes[: len(pairs)], total
