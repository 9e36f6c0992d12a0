"""Batched device chain DP — the device twin of `ops.chain`.

The reference scores seeds sequentially with a distance-bounded
predecessor scan (`algo/chain_dp.c:109-170`, plus the max_skip=25 pruning
heuristic).  The TPU formulation is a single `lax.scan` over seed slots
with a J-deep sliding predecessor buffer carried in registers:

* seeds (padded to M slots per lane, sorted by (soff, qoff)) stream
  through the scan; each step scores the new seed against the last J
  seeds with pure (J, B) vector ops — no gathers in the loop;
* the peak score `v` (running best along each predecessor chain,
  `chaining_find_candidates`'s v array) is carried the same way, so the
  host never re-walks the DP;
* the J-lookback replaces the reference's unbounded-by-count (but
  distance-bounded and max_skip-pruned) scan: a predecessor more than J
  in-window seeds back is invisible.  J=64 covers the 5kb window at
  normal seed densities; dense repeat regions lose only low-value
  predecessors (the reference's max_skip heuristic prunes the same
  region harder).

Backtracking / chain claiming stays on the host (`extract_chains_np`
logic over device-produced f/p/v), where the data is tiny and ragged.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from lesv_tpu.config import ChainConfig
from lesv_tpu.ops.chain import Chain, _is_contained, join_adjacent_chains

NEG = -(2**30)


@functools.partial(
    jax.jit,
    static_argnames=("J", "length", "max_dq", "max_dr", "bw"))
def _chain_scan_kernel(qoff, soff, valid, J: int, length: int,
                       max_dq: int, max_dr: int, bw: int):
    """(B, M) seeds -> (f, p, v) (B, M) chain-DP arrays.

    qoff int32, soff uint32 (global offsets), valid bool; seeds sorted by
    (soff, qoff) ascending per lane with invalid slots at the end."""
    import jax
    import jax.numpy as jnp

    B, M = qoff.shape
    fbuf0 = jnp.full((J, B), NEG, jnp.int32)
    qbuf0 = jnp.zeros((J, B), jnp.int32)
    sbuf0 = jnp.zeros((J, B), jnp.uint32)
    vbuf0 = jnp.full((J, B), NEG, jnp.int32)

    def step(carry, xs):
        fbuf, qbuf, sbuf, vbuf = carry
        qi, si, ok_i = xs                       # (B,)
        dq = qi[None, :] - qbuf                 # (J, B) i32
        dr_ok = (sbuf <= si[None, :]) & (si[None, :] - sbuf
                                         <= jnp.uint32(max_dr))
        dr = jnp.where(dr_ok, si[None, :] - sbuf, jnp.uint32(0)
                       ).astype(jnp.int32)
        dd = jnp.abs(dr - dq)
        okj = ((dq > 0) & (dq <= max_dq) & dr_ok & (dr > 0)
               & (dd <= bw) & (fbuf > NEG // 2))
        mind = jnp.minimum(jnp.minimum(dq, dr), length)
        # floor(log2(dd)) = 31 - clz(dd) for dd > 0
        logdd = jnp.where(dd > 0, 31 - jax.lax.clz(jnp.maximum(dd, 1)), 0)
        sc = mind - (dd * length) // 100 - (logdd >> 1)
        tot = jnp.where(okj, fbuf + sc, NEG)
        best = jnp.max(tot, axis=0)             # (B,)
        arg = jnp.argmax(tot, axis=0).astype(jnp.int32)
        take_f = best > length                  # strict: host parity
        f_i = jnp.where(take_f, best, length)
        v_arg = jnp.take_along_axis(vbuf, arg[None, :], axis=0)[0]
        v_i = jnp.where(take_f, jnp.maximum(v_arg, f_i), f_i)
        p_rel = jnp.where(take_f, J - arg, 0)   # predecessor is p_rel back
        f_i = jnp.where(ok_i, f_i, NEG)
        v_i = jnp.where(ok_i, v_i, NEG)
        fbuf = jnp.concatenate([fbuf[1:], f_i[None, :]], axis=0)
        qbuf = jnp.concatenate([qbuf[1:], qi[None, :]], axis=0)
        sbuf = jnp.concatenate([sbuf[1:], si[None, :]], axis=0)
        vbuf = jnp.concatenate([vbuf[1:], v_i[None, :]], axis=0)
        return (fbuf, qbuf, sbuf, vbuf), (f_i, p_rel, v_i)

    (_, _, _, _), (f, p_rel, v) = jax.lax.scan(
        step, (fbuf0, qbuf0, sbuf0, vbuf0),
        (qoff.T, soff.T, valid.T))
    return f.T, p_rel.T, v.T                    # (B, M)


def sort_seeds_device(qoff, soff, valid):
    """Per-lane (soff, qoff) sort with invalid slots pushed to the end
    (two stable argsort passes)."""
    import jax.numpy as jnp

    soff_k = jnp.where(valid, soff, jnp.uint32(0xFFFFFFFF))
    qoff_k = jnp.where(valid, qoff, jnp.int32(0x7FFFFFFF))
    o1 = jnp.argsort(qoff_k, axis=1, stable=True)
    s1 = jnp.take_along_axis(soff_k, o1, axis=1)
    o2 = jnp.argsort(s1, axis=1, stable=True)
    order = jnp.take_along_axis(o1, o2, axis=1)
    return (jnp.take_along_axis(qoff_k, order, axis=1),
            jnp.take_along_axis(soff_k, order, axis=1),
            jnp.take_along_axis(valid, order, axis=1))


def _use_pallas_scan() -> bool:
    """Pallas chain scan on real TPU (or forced via LESV_TPU_CHAIN);
    the XLA lax.scan kernel otherwise.  The scan kernel's per-step
    buffer concatenates relayout on TPU (~5 ms/step); the Pallas kernel
    keeps the J-window on sublanes in VMEM."""
    import os

    import jax

    mode = os.environ.get("LESV_TPU_CHAIN", "")
    if mode == "pallas":
        return True
    if mode == "scan":
        return False
    return jax.default_backend() not in ("cpu",)


def sort_scan(qoff, soff, valid, J, length, max_dq, max_dr, bw,
              use_pallas, interp):
    """Per-lane seed sort + chain scan (jit-callable: composes into the
    fused seed+sort+scan programs)."""
    qs, ss, vs = sort_seeds_device(qoff, soff, valid)
    if use_pallas:
        from lesv_tpu.ops.chain_pallas import chain_scan_pallas

        f, p_rel, v = chain_scan_pallas(
            qs, ss, vs, J=J, length=length, max_dq=max_dq,
            max_dr=max_dr, bw=bw, interpret=interp)
    else:
        f, p_rel, v = _chain_scan_kernel(
            qs, ss, vs, J=J, length=length, max_dq=max_dq,
            max_dr=max_dr, bw=bw)
    return f, p_rel, v, qs, ss, vs


@functools.partial(
    jax.jit,
    static_argnames=("J", "length", "max_dq", "max_dr", "bw", "Mp",
                     "use_pallas", "interp"))
def _sort_scan_jit(qoff, soff, valid, J, length, max_dq, max_dr, bw,
                   Mp, use_pallas, interp):
    """ONE dispatch for slice + per-lane seed sort + chain scan.

    On a tunneled device every eager jnp op costs a round trip; fusing
    the (static) Mp slice, the two argsort passes, and the scan into one
    jitted program collapses ~8 RTTs per chain call to 1."""
    qoff, soff, valid = qoff[:, :Mp], soff[:, :Mp], valid[:, :Mp]
    return sort_scan(qoff, soff, valid, J, length, max_dq, max_dr, bw,
                     use_pallas, interp)


def fetch_chain_arrays(f, p_rel, v, qs, ss, vs):
    """Device->host fetch of chain-DP outputs; p as absolute predecessor
    index (-1 = none)."""
    for x in (f, p_rel, v, qs, ss, vs):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    f = np.asarray(f)
    p_rel = np.asarray(p_rel)
    v = np.asarray(v)
    qs = np.asarray(qs).astype(np.int64)
    ss = np.asarray(ss).astype(np.int64)
    vs = np.asarray(vs)
    M = f.shape[1]
    idx = np.arange(M, dtype=np.int64)[None, :]
    p = np.where(p_rel > 0, idx - p_rel, -1)
    p = np.where(p >= 0, p, -1)
    return f, p, v, qs, ss, vs


def extract_lanes(f, p, v, qs, ss, vs, length: int,
                  cfg: ChainConfig) -> list[list[Chain]]:
    """Host chain extraction for every lane of fetched DP arrays."""
    from lesv_tpu.utils import profiling

    with profiling.trace("chain/extract"):
        return [
            extract_chains_from_fp(f[b], p[b], v[b], qs[b], ss[b], vs[b],
                                   length, cfg)
            for b in range(f.shape[0])
        ]


def chain_batch_device(qoff, soff, valid, length: int,
                       cfg: ChainConfig | None = None, J: int = 64,
                       Mp: int | None = None):
    """Run sort + chain DP on device; returns host (f, p, v, qoff, soff,
    valid) arrays, p as absolute predecessor index (-1 = none).
    ``Mp``: static slot-count slice applied on device (callers pass the
    pow2 cover of the real match counts)."""
    import os

    from lesv_tpu.utils import profiling

    cfg = cfg or ChainConfig()
    with profiling.trace("chain/sort_scan"):
        f, p_rel, v, qs, ss, vs = _sort_scan_jit(
            qoff, soff, valid, J=J, length=length,
            max_dq=cfg.max_dist_qry, max_dr=cfg.max_dist_ref,
            bw=cfg.max_band_width, Mp=Mp or qoff.shape[1],
            use_pallas=_use_pallas_scan(),
            interp=os.environ.get("LESV_TPU_PALLAS") == "interp")
    with profiling.trace("chain/fetch"):
        return fetch_chain_arrays(f, p_rel, v, qs, ss, vs)


def extract_chains_from_fp(
    f: np.ndarray, p: np.ndarray, v: np.ndarray,
    qoff: np.ndarray, soff: np.ndarray, valid: np.ndarray,
    length: int, cfg: ChainConfig | None = None,
) -> list[Chain]:
    """Host chain extraction over one lane's (f, p, v) arrays — the
    `chaining_find_candidates` logic (`chain_dp.c:273-395`): ends are
    seeds that are nobody's best predecessor, peaks resolved via v,
    greedy best-first claiming, containment dedup, chain join."""
    cfg = cfg or ChainConfig()
    n = int(valid.sum())
    if n == 0:
        return []
    f, p, v = f[:n], p[:n], v[:n]
    qoff, soff = qoff[:n], soff[:n]

    from lesv_tpu import native

    # native claims with full capacity; the max-chains cap applies AFTER
    # containment dedup (extract_chains_np parity)
    r = native.chain_extract(f.astype(np.int64), p.astype(np.int64),
                             v.astype(np.int64), cfg.min_chain_score,
                             cfg.min_seed_cnt, n)
    if r is not None:
        paths, bounds, scores, nc = r
        chains: list[Chain] = []
        for c in range(nc):
            if len(chains) >= cfg.max_chains_per_context:
                break
            path = paths[bounds[c]:bounds[c + 1]]
            ch = Chain(
                score=int(scores[c]),
                qbeg=int(qoff[path[0]]),
                qend=int(qoff[path[-1]]) + length,
                sbeg=int(soff[path[0]]),
                send=int(soff[path[-1]]) + length,
                anchors=np.stack([qoff[path], soff[path]], axis=1),
                seed_len=length,
            )
            if not _is_contained(chains, ch):
                chains.append(ch)
        return join_adjacent_chains(chains, cfg)

    has_succ = np.zeros(n, dtype=bool)
    ok = p >= 0
    has_succ[p[ok]] = True
    ends = np.flatnonzero(~has_succ & (v >= cfg.min_chain_score))
    if len(ends) == 0:
        return []
    peaks = []
    for i in ends:
        j = i
        while j >= 0 and f[j] < v[j]:
            j = p[j]
        if j < 0:
            j = i
        peaks.append((int(f[j]), int(j)))
    peaks.sort(key=lambda t: (-t[0], t[1]))

    used = np.zeros(n, dtype=bool)
    chains: list[Chain] = []
    for score, end in peaks:
        if len(chains) >= cfg.max_chains_per_context:
            break
        if used[end]:
            continue
        path = []
        j = end
        while j >= 0 and not used[j]:
            path.append(j)
            used[j] = True
            j = p[j]
        if j < 0:
            chain_score = score
        elif score - f[j] >= cfg.min_chain_score:
            chain_score = score - int(f[j])
        else:
            continue
        if len(path) < cfg.min_seed_cnt:
            continue
        path = path[::-1]
        c = Chain(
            score=chain_score,
            qbeg=int(qoff[path[0]]),
            qend=int(qoff[path[-1]]) + length,
            sbeg=int(soff[path[0]]),
            send=int(soff[path[-1]]) + length,
            anchors=np.stack([qoff[path], soff[path]], axis=1),
            seed_len=length,
        )
        if not _is_contained(chains, c):
            chains.append(c)
    return join_adjacent_chains(chains, cfg)


def chain_lanes(qoff, soff, valid, length: int,
                cfg: ChainConfig | None = None,
                J: int = 64, Mp: int | None = None) -> list[list[Chain]]:
    """Full batched chaining: device sort+DP, host extraction per lane."""
    from lesv_tpu.utils import profiling

    cfg = cfg or ChainConfig()
    f, p, v, qs, ss, vs = chain_batch_device(qoff, soff, valid, length,
                                             cfg, J=J, Mp=Mp)
    with profiling.trace("chain/extract"):
        return [
            extract_chains_from_fp(f[b], p[b], v[b], qs[b], ss[b], vs[b],
                                   length, cfg)
            for b in range(f.shape[0])
        ]


@functools.partial(jax.jit,
                   static_argnames=("Mp", "q16", "s16", "want_v"))
def _slice_chain_jit(f, p_rel, v, qs, ss, Mp, q16, s16, want_v):
    """Slice chain-DP outputs to the live slot ladder ON DEVICE (one
    dispatch) before the host fetch — the fetch then moves Mp slots per
    lane instead of the full match budget, p as int16, and the seed
    offsets as uint16 when the pair dims bound them (the tunnel's d2h
    bandwidth is the chain path's scarce resource).  ``want_v=False``
    drops v from the fetch entirely (the host rebuilds it from (f, p)
    with one native pass — invalid-tail values are never read)."""
    import jax.numpy as jnp

    qs = qs[:, :Mp]
    ss = ss[:, :Mp]
    if q16:
        qs = qs.astype(jnp.uint16)
    if s16:
        ss = ss.astype(jnp.uint16)
    out = (f[:, :Mp], p_rel[:, :Mp].astype(jnp.int16), qs, ss)
    if want_v:
        out = out + (v[:, :Mp],)
    return out


def fetch_chain_sliced(f, p_rel, v, qs, ss, total, M: int, Mp: int,
                      q16: bool = False, s16: bool = False):
    """Device-slice to Mp slots, fetch, and rebuild (f, p, v, qs, ss,
    valid) host arrays.  ``valid`` is reconstructed from ``total`` (the
    sorted valid slots are a prefix of length min(total, M));
    ``q16``/``s16`` assert that valid qoff/soff values fit uint16."""
    from lesv_tpu import native

    want_v = not (native.available() and not native._off("chain_v_batch"))
    sliced = _slice_chain_jit(f, p_rel, v, qs, ss, Mp=Mp, q16=q16,
                              s16=s16, want_v=want_v)
    for x in sliced:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    f = np.asarray(sliced[0])
    p16 = np.asarray(sliced[1])
    qs = np.asarray(sliced[2]).astype(np.int64)
    ss = np.asarray(sliced[3]).astype(np.int64)
    if want_v:
        v = np.asarray(sliced[4])
    else:
        v = native.chain_v_batch(f, p16)
    p_rel = p16.astype(np.int64)
    idx = np.arange(Mp, dtype=np.int64)[None, :]
    p = np.where(p_rel > 0, idx - p_rel, -1)
    p = np.where(p >= 0, p, -1)
    n = np.minimum(np.asarray(total)[: f.shape[0]], M)
    valid = idx < n[:, None]
    return f, p, v, qs, ss, valid
