"""Batched device seeding: windowed k-mer extraction + index lookup.

The device twin of :mod:`lesv_tpu.ops.seeding` (the host oracle, tested
for equivalence): for a padded batch of reads (both strands as separate
lanes), compute sampled k-mer hashes (the reference's 300-of-every-500bp
window pattern, `hbn_word_finder.c:8-9,185-216`) with pure vector ops,
look every hash up in the sorted k-mer index with a batched lexicographic
binary search, and expand the (hash -> positions) hits into padded
(qoff, soff) match arrays with a fixed per-lane budget.

TPU-native design notes:

* hashes are computed in two int32 limbs (lo 19 bits / hi the rest), so
  any k <= 25 works without int64 arithmetic — this is the k=19
  ultra-long path (`README.md:149-172`) on device;
* the sampled-offset pattern is static given Qmax, so "sampling" is one
  gather at a precomputed index vector (a strided gather, SURVEY §7.3);
* index lookup is a fori_loop binary search over (hi, lo) key limbs —
  32 rounds of 1D gathers, no host round trips;
* ragged (hash -> positions) expansion becomes a per-lane budget of M
  match slots: slot m finds its source seed by binary-searching the
  per-lane exclusive-cumsum of match counts (batched take_along_axis).
  Lanes whose total exceeds M are truncated and reported (`overflow`).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from lesv_tpu.config import SeedingConfig
from lesv_tpu.index.kmer_index import KmerIndex

_LO_BITS = 19
_LO_MASK = (1 << _LO_BITS) - 1


def sampled_offsets_static(Qmax: int, k: int, window: int,
                           cfg: SeedingConfig) -> np.ndarray:
    """The static sampled k-mer offsets for a Qmax-long read (shorter
    reads mask the tail with ``offs + k <= qlen``).

    Matches :func:`lesv_tpu.ops.seeding.sampled_offsets` for
    length == Qmax; for shorter reads the host oracle additionally
    samples up to window-stride fewer positions in its final truncated
    window — the device mask keeps exactly the same set because the
    pattern is per-window-local (offset o is sampled iff
    (o % (SL+SR)) % window == 0 and (o % (SL+SR)) + k <= SL and
    o + k <= qlen)."""
    return np.asarray(
        [o for o in range(Qmax)
         if (o % (cfg.seeding_seq_size + cfg.seeding_seq_stride)) % window == 0
         and (o % (cfg.seeding_seq_size + cfg.seeding_seq_stride)) + k
         <= cfg.seeding_seq_size],
        dtype=np.int32)


_PREFIX_BITS = 18


class DeviceIndex:
    """Device-resident view of a :class:`KmerIndex` (replicated per host,
    SURVEY §2.6): hash limbs + grouped positions + group starts, plus a
    dense prefix table that caps the device binary search at the max
    bucket depth (log2(n) gather rounds -> ~4)."""

    def __init__(self, index: KmerIndex):
        import jax.numpy as jnp

        h = index.uniq_hash
        self.k = index.k
        self.window = index.window
        self.n = len(h)
        self.hash_hi = jnp.asarray((h >> _LO_BITS).astype(np.int32))
        self.hash_lo = jnp.asarray((h & _LO_MASK).astype(np.int32))
        # counts fit int32 (max_kmer_occ <= 200); starts fit int32 for
        # position lists < 2^31 (human genome: ~3e8)
        assert len(index.positions) < 2**31
        self.start = jnp.asarray(index.start.astype(np.int32))
        self.positions = jnp.asarray(index.positions.astype(np.uint32))
        # prefix table: pre[t] = first index slot whose hash has top
        # prefix >= t (host-built, 2^P+1 int32 entries on device)
        P = min(_PREFIX_BITS, 2 * self.k)
        self.prefix_bits = P
        self.prefix_shift = 2 * self.k - P
        pre = np.searchsorted(h >> self.prefix_shift,
                              np.arange((1 << P) + 1, dtype=np.int64))
        self.prefix = jnp.asarray(pre.astype(np.int32))
        # deepest bucket bounds the per-query binary search
        depth = int((pre[1:] - pre[:-1]).max(initial=1))
        self.bucket_rounds = max(1, int(np.ceil(np.log2(max(depth, 2)))) + 1)

    def cache_key(self):
        return (self.k, self.window, self.n)


_DEVICE_INDEX_CACHE: dict[int, DeviceIndex] = {}


def device_index_of(index: KmerIndex) -> DeviceIndex:
    di = _DEVICE_INDEX_CACHE.get(id(index))
    if di is None or di.n != len(index.uniq_hash):
        di = DeviceIndex(index)
        _DEVICE_INDEX_CACHE.clear()     # one live index at a time
        _DEVICE_INDEX_CACHE[id(index)] = di
    return di


def _hash_limbs(codes, k: int):
    """(hi, lo, ok) int32 limb arrays of every k-mer start position.

    codes: (B, Q) int32 with values 0..3 (>=4 = ambiguous).  ok[p] is
    False when the window [p, p+k) leaves the array or contains an
    ambiguous base.  MSB-first hash (kmer_hashes semantics)."""
    import jax.numpy as jnp

    B, Q = codes.shape
    lo = jnp.zeros((B, Q), jnp.int32)
    hi = jnp.zeros((B, Q), jnp.int32)
    namb = jnp.zeros((B, Q), jnp.int32)
    # h(p) over codes[p..p+k): accumulate shifted-by-j copies
    for j in range(k):
        cj = jnp.roll(codes, -j, axis=1) if j else codes
        cj = jnp.where(
            jnp.arange(Q, dtype=jnp.int32)[None, :] + j < Q, cj, 4)
        c = jnp.where(cj < 4, cj, 0)
        carry = (lo >> (_LO_BITS - 2)) & 3
        lo = ((lo << 2) | c) & _LO_MASK
        hi = (hi << 2) | carry
        namb = namb + (cj >= 4).astype(jnp.int32)
    ok = namb == 0
    return hi, lo, ok


def _lex_searchsorted(key_hi, key_lo, q_hi, q_lo, n: int,
                      lo0=None, hi0=None, iters: int | None = None):
    """Lower-bound index of (q_hi, q_lo) in the sorted (key_hi, key_lo)
    limb arrays; fori_loop binary search, fully batched.  ``lo0/hi0``
    seed the search range (the prefix-table fast path) and ``iters``
    caps the gather rounds to the max range width."""
    import jax
    import jax.numpy as jnp

    if iters is None:
        iters = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    lo_i = jnp.zeros_like(q_hi) if lo0 is None else lo0
    hi_i = jnp.full_like(q_hi, n) if hi0 is None else hi0

    def body(_, c):
        lo_i, hi_i = c
        mid = (lo_i + hi_i) >> 1
        mh = jnp.take(key_hi, mid, mode="clip")
        ml = jnp.take(key_lo, mid, mode="clip")
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        less = less & (mid < hi_i)
        return jnp.where(less, mid + 1, lo_i), jnp.where(less, hi_i, mid)

    lo_i, _ = jax.lax.fori_loop(0, iters, body, (lo_i, hi_i))
    return lo_i


@functools.partial(
    __import__("jax").jit,
    static_argnames=("k", "max_occ", "M", "n_index", "lo_bits",
                     "prefix_shift", "bucket_rounds"))
def _seed_match_kernel(codes, qlen, offs, hash_hi, hash_lo, start,
                       positions, k: int, max_occ: int, M: int,
                       n_index: int, lo_bits: int = _LO_BITS,
                       prefix=None, prefix_shift: int = 0,
                       bucket_rounds: int = 0):
    """Device seeding: (B, Qmax) codes -> padded (B, M) match arrays.

    Returns (qoff (B,M) i32, soff (B,M) u32, valid (B,M) bool,
    total (B,) i32 pre-truncation match counts).  With ``prefix`` (the
    DeviceIndex dense prefix table) the index lookup is 2 gathers plus
    ``bucket_rounds`` binary rounds instead of log2(n_index)."""
    import jax.numpy as jnp

    B, Q = codes.shape
    nOff = offs.shape[0]
    hi, lo, okp = _hash_limbs(codes.astype(jnp.int32), k)
    # gather at the static sampled offsets
    take = lambda a: jnp.take(a, offs, axis=1)
    q_hi, q_lo, q_ok = take(hi), take(lo), take(okp)
    q_ok = q_ok & (offs[None, :] + k <= qlen[:, None])

    if prefix is not None:
        if prefix_shift >= lo_bits:
            t = q_hi >> (prefix_shift - lo_bits)
        else:
            t = ((q_hi << (lo_bits - prefix_shift))
                 | (q_lo >> prefix_shift))
        lo0 = jnp.take(prefix, t)
        hi0 = jnp.take(prefix, t + 1)
        idx = _lex_searchsorted(hash_hi, hash_lo, q_hi, q_lo, n_index,
                                lo0=lo0, hi0=hi0, iters=bucket_rounds)
    else:
        idx = _lex_searchsorted(hash_hi, hash_lo, q_hi, q_lo, n_index)
    idx_c = jnp.minimum(idx, max(n_index - 1, 0))
    found = (q_ok & (idx < n_index)
             & (jnp.take(hash_hi, idx_c) == q_hi)
             & (jnp.take(hash_lo, idx_c) == q_lo))
    g_start = jnp.take(start, idx_c)
    g_count = jnp.take(start, idx_c + 1) - g_start
    g_count = jnp.where(found & (g_count <= max_occ), g_count, 0)

    # budgeted expansion: slot m belongs to the seed whose cumsum range
    # covers m (merged-sort expansion, ops.pairseed_jax.expand_slots)
    from lesv_tpu.ops.pairseed_jax import expand_slots

    seed_of, r, valid, total = expand_slots(g_count, M)
    g_s = jnp.take_along_axis(g_start, seed_of, axis=1)
    pos_idx = jnp.clip(g_s + r, 0, positions.shape[0] - 1)
    soff = jnp.take(positions, pos_idx)
    qoff = jnp.take_along_axis(
        jnp.broadcast_to(offs[None, :], (B, nOff)), seed_of, axis=1)
    soff = jnp.where(valid, soff, jnp.uint32(0xFFFFFFFF))
    qoff = jnp.where(valid, qoff, jnp.int32(0x7FFFFFFF))
    return qoff, soff, valid, total


def seed_matches_batch(
    reads: list[np.ndarray],
    index: KmerIndex,
    cfg: SeedingConfig | None = None,
    M: int = 8192,
    Qmax: int | None = None,
):
    """Device seeding of a batch of reads, both strands.

    Returns (qoff (2R, M) i32, soff (2R, M) u32, valid (2R, M) bool,
    total (2R,) i32): lane 2*i is read i FWD, lane 2*i+1 is read i REV
    (strand-oriented qoff, the reference context convention).
    ``Qmax``: callers pass quantized padded lengths to bound the number
    of compiled shapes.
    """
    import jax.numpy as jnp

    from lesv_tpu.io.fasta import revcomp

    cfg = cfg or SeedingConfig()
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()
    di = device_index_of(index)
    R = len(reads)
    if Qmax is None:
        Qmax = max((len(r) for r in reads), default=1)
        Qmax = max(64, 1 << int(np.ceil(np.log2(max(Qmax, 2)))))
    # lane count padded to a 2-value ladder: every distinct B is a
    # separate XLA executable (seconds to load through the device
    # tunnel); callers chunk at <= 64 reads
    B = 2 * R
    B = 16 if B <= 16 else 128
    if 2 * R > 128:
        B = 1 << int(np.ceil(np.log2(2 * R)))
    codes = np.full((B, Qmax), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        codes[2 * i, : len(r)] = r
        codes[2 * i + 1, : len(r)] = revcomp(r)
        qlen[2 * i] = qlen[2 * i + 1] = len(r)
    offs = sampled_offsets_static(Qmax, di.k, cfg.query_stride, cfg)
    qoff, soff, valid, total = _seed_match_kernel(
        jnp.asarray(codes), jnp.asarray(qlen), jnp.asarray(offs),
        di.hash_hi, di.hash_lo, di.start, di.positions,
        k=di.k, max_occ=cfg.max_query_kmer_occ, M=M, n_index=di.n,
        prefix=di.prefix, prefix_shift=di.prefix_shift,
        bucket_rounds=di.bucket_rounds)
    return qoff, soff, valid, total


@functools.partial(
    jax.jit,
    static_argnames=("k", "max_occ", "M", "n_index", "J", "max_dq",
                     "max_dr", "bw", "use_pallas", "interp",
                     "prefix_shift", "bucket_rounds"))
def _seed_chain_jit(codes_p, codes_amb, qlen, offs, hash_hi, hash_lo,
                    start, positions, prefix, k, max_occ, M, n_index, J,
                    max_dq, max_dr, bw, use_pallas, interp,
                    prefix_shift, bucket_rounds):
    """Fused windowed seeding + seed sort + chain scan (one dispatch);
    read codes arrive 2-bit packed (pairseed_jax.pack_codes)."""
    from lesv_tpu.ops.chain_jax import sort_scan
    from lesv_tpu.ops.pairseed_jax import unpack_codes

    codes = unpack_codes(codes_p, codes_amb)
    qoff, soff, valid, total = _seed_match_kernel(
        codes, qlen, offs, hash_hi, hash_lo, start, positions,
        k=k, max_occ=max_occ, M=M, n_index=n_index, prefix=prefix,
        prefix_shift=prefix_shift, bucket_rounds=bucket_rounds)
    f, p_rel, v, qs, ss, vs = sort_scan(
        qoff, soff, valid, J, k, max_dq, max_dr, bw, use_pallas, interp)
    return f, p_rel, v, qs, ss, vs, total


def seed_chain_lanes_fused(
    reads: list[np.ndarray],
    index: KmerIndex,
    scfg: SeedingConfig,
    ccfg,
    M: int,
    Qmax: int,
    J: int = 64,
):
    """Primary DDF seeding + chain DP for a read chunk, fused into one
    device program (both strands; lane 2i FWD / 2i+1 REV).  Returns
    (chains per lane, total np)."""
    import os

    import jax.numpy as jnp

    from lesv_tpu.io.fasta import revcomp
    from lesv_tpu.ops.chain_jax import (
        _use_pallas_scan,
        extract_lanes,
        fetch_chain_sliced,
    )
    from lesv_tpu.utils import profiling

    di = device_index_of(index)
    R = len(reads)
    B = 2 * R
    B = 16 if B <= 16 else 128
    if 2 * R > 128:
        B = 1 << int(np.ceil(np.log2(2 * R)))
    codes = np.full((B, Qmax), 4, np.uint8)
    qlen = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        codes[2 * i, : len(r)] = r
        codes[2 * i + 1, : len(r)] = revcomp(r)
        qlen[2 * i] = qlen[2 * i + 1] = len(r)
    offs = sampled_offsets_static(Qmax, di.k, scfg.query_stride, scfg)
    from lesv_tpu.ops.pairseed_jax import pack_codes

    codes_p, codes_amb = pack_codes(codes)
    with profiling.trace("map/seed_chain_fused"):
        f, p_rel, v, qs, ss, vs, total = _seed_chain_jit(
            jnp.asarray(codes_p), jnp.asarray(codes_amb),
            jnp.asarray(qlen), jnp.asarray(offs),
            di.hash_hi, di.hash_lo, di.start, di.positions, di.prefix,
            k=di.k, max_occ=scfg.max_query_kmer_occ, M=M, n_index=di.n,
            J=J, max_dq=ccfg.max_dist_qry, max_dr=ccfg.max_dist_ref,
            bw=ccfg.max_band_width, use_pallas=_use_pallas_scan(),
            interp=os.environ.get("LESV_TPU_PALLAS") == "interp",
            prefix_shift=di.prefix_shift,
            bucket_rounds=di.bucket_rounds)
    total = np.asarray(total)                # tiny: (B,) i32
    from lesv_tpu.pipeline.batch_align import _shrink_M

    Mp = _shrink_M(total[: 2 * R], M)
    with profiling.trace("map/seed_chain_fetch"):
        f, p, v, qs, ss, valid = fetch_chain_sliced(
            f, p_rel, v, qs, ss, total, M, Mp, q16=Qmax < 65536)
    lanes = extract_lanes(f[: 2 * R], p, v, qs, ss, valid, di.k, ccfg)
    return lanes, total
