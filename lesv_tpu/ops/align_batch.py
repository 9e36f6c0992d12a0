"""Bucketed batching of alignment jobs onto the device kernel.

Ragged (query, subject) segment pairs are snapped into power-of-two shape
buckets (the reference's caps become static shapes, SURVEY.md §7), padded,
and solved by one `banded_align_kernel` call per bucket.  A global jit
cache keeps one compiled executable per (batch, Qmax, Smax, W, mode).

Bucket selection:
* near-diagonal segments: W >= |ls-lq| + 2*pad; the subject axis is
  collapsed to S = Q + W (the band never reads past Qmax + W), so the
  bucket key is (Q, W) — one executable regardless of subject length;
* deletion-heavy segments (ls >> lq): full-width W = S + 1 (rectangular
  DP is the W=S+1 special case of the banded kernel);
* insertion-heavy segments (lq >> ls): naturally cheap, W = S + 1 small.

Each bucket runs at a FIXED, size-classed batch width (`_lanes_for`):
compiled executables are the scarce resource on TPU (minutes per shape),
and small fills are dispatch-latency-bound, so tiny segment buckets run
1024 lanes per call while huge fills run narrow.  Remainder chunks are
padded up to the bucket width — one executable per bucket, ever.
"""

from __future__ import annotations

import os
import threading as _threading
from typing import Sequence

import numpy as np

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_np import (
    Alignment,
    banded_global_align,
    extension_align,
)

def _backend_env() -> str:
    return os.environ.get("LESV_TPU_BACKEND", "jax")


def _lanes_for(Q: int, W: int) -> int:
    """Fixed batch width for a (Q, W) bucket, sized so one call is
    ~10^7-10^8 cells: wide for tiny fills, narrow for huge ones.

    On CPU (tests) the fill is compute-bound and padding is pure waste,
    so widths are capped at 64."""
    import jax

    cap = 64 if jax.default_backend() == "cpu" else 1024
    cells = Q * W
    if cells <= 1 << 15:
        B = 1024
    elif cells <= 1 << 18:
        B = 256
    elif cells <= 1 << 21:
        B = 64
    elif cells <= 1 << 24:
        B = 8
    else:
        B = 1
    return min(B, cap)


def _next_pow2(x: int, lo: int = 64, hi: int = 1 << 17) -> int:
    n = lo
    while n < x:
        n *= 2
    return min(n, hi)


# bucket dimension steps: x4 keeps the number of compiled shapes small
# (compiles are the expensive resource on TPU; fill waste is bounded 4x
# and the fill is cheap there). 64, 256, 1k, 4k, 16k, 64k.
def _quant(x: int, lo: int = 64, hi: int = 1 << 18) -> int:
    n = lo
    while n < x:
        n *= 4
    return min(n, hi)


def _seg_pad(lq: int, ls: int) -> int:
    return max(32, int(0.12 * min(lq, ls)))


def _quant_fn():
    """Bucket quantizer: tight powers of two on CPU (fill-bound, compiles
    cheap); x4 steps on TPU (compile-bound, fill cheap)."""
    import jax

    return _next_pow2 if jax.default_backend() == "cpu" else _quant


def _bucket_of(lq: int, ls: int, q2) -> tuple[int, int, int, str]:
    """(Qmax, Smax, W, mode) bucket for a global segment.

    diag mode requires the end diagonal |ls-lq| (plus drift pad) to fit in
    half the band; otherwise the rectangular full-width mode is used (it is
    cheap exactly when the subject is short).
    """
    Q = q2(max(lq, 1))
    pad = _seg_pad(lq, ls)
    need = 2 * (abs(ls - lq) + 2 * pad)
    S = q2(ls + 1)
    if need >= ls + 1:
        return Q, S, S, "full"
    W = _next_pow2(need, lo=64)
    if W >= S:
        return Q, S, S, "full"
    # diag: |ls-lq| <= W/2 so the subject fits in Q + W columns — S is
    # not part of the bucket key
    return Q, Q + W, W, "diag"


def _pick_backend() -> str:
    be = _backend_env()
    if be in ("np", "native", "jax"):
        return be
    # auto: the XLA:CPU scan path is ~100x slower per cell than the
    # native C++ fill; use native on CPU, the device kernel on TPU
    from lesv_tpu import native as _nat

    import jax

    if jax.default_backend() == "cpu" and _nat.available():
        return "native"
    return "jax"


def align_pairs(
    pairs: Sequence[tuple[np.ndarray, np.ndarray]],
    cfg: AlignConfig | None = None,
    free_end: bool = False,
) -> list[Alignment | None]:
    """Align many (q, s) pairs; global by default, extension when
    ``free_end``.  Returns Alignments (None on failure)."""
    cfg = cfg or AlignConfig()
    backend = _pick_backend()
    if backend == "np":
        return _align_pairs_np(pairs, cfg, free_end)
    if backend == "native":
        return _align_pairs_native(pairs, cfg, free_end)
    return _align_pairs_jax(pairs, cfg, free_end)


# global segments this small solve as full rectangles either way; the
# host micro-DP is ~us per pair while a device lane costs dispatch +
# readback latency.  Both paths are bit-identical (full-DP case).
TINY_SEG = 16


def global_align_pairs_host(
    pairs: Sequence[tuple[np.ndarray, np.ndarray]],
    cfg: AlignConfig | None = None,
) -> list[Alignment | None]:
    """Reference-semantics global NW of whole (q, s) spans on the host.

    `align_and_refine_subseq_with_ksw` with max_dist=-1 runs ksw2 NW at
    band = max_subseq_size (`app/necat2sv/align_subseqs.c:193-262`) — no
    seeding/chaining — so a 1.5kb deletion inside the span is bridged by
    the DP itself.  This is the fallback for spans where chain-anchored
    alignment cannot bridge the SV (a spurious chance-k-mer chain tail can
    overlap the far-side chain and block the SV-preserving join; see
    `find_sv_reads.c:341-430` s_chain_dual_m4s).  The band starts at
    2x the length imbalance (the path's diagonal drift bound) and widens
    on band escape; results are trimmed to the exact-match-end invariant.
    """
    from lesv_tpu import native as _nat
    from lesv_tpu.ops.cigar import trim_to_exact_match

    cfg = cfg or AlignConfig()

    def one(pair):
        q, s = pair
        lq, ls = len(q), len(s)
        if lq == 0 or ls == 0:
            return None
        W = min(ls + 1, _next_pow2(2 * abs(ls - lq) + 1024, lo=256,
                                   hi=1 << 17))
        a: Alignment | None = None
        while True:
            mode_diag = W < ls + 1
            if _nat.available():
                r = _nat.banded_align_one(
                    q, s, int(W), mode_diag, cfg.match, cfg.mismatch,
                    cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2,
                    cfg.gap_ext2, False)
                if r is not None:
                    ops, score, qe, se = r
                    a = Alignment(0, qe, 0, se, ops, score=score)
            else:
                a = banded_global_align(q, s, W, cfg=cfg)
            if a is not None or W >= ls + 1:
                break
            W = min(W * 2, ls + 1)
        if a is not None:
            a = trim_to_exact_match(a, q, s, cfg.end_match_len)
        return a

    if len(pairs) > 1 and _nat.available():
        # ctypes releases the GIL: spread the whole-span NWs over cores
        import concurrent.futures as _fut

        with _fut.ThreadPoolExecutor(
                max_workers=_n_host_workers()) as pool:
            return list(pool.map(one, pairs))
    return [one(p) for p in pairs]


def align_pairs_host(
    pairs: Sequence[tuple[np.ndarray, np.ndarray]],
    cfg: AlignConfig | None = None,
    free_end: bool = False,
) -> list[Alignment | None]:
    """Host-only path (native C++ fill when built, numpy oracle
    otherwise) — used for tiny segments where device latency dominates."""
    from lesv_tpu import native as _nat

    cfg = cfg or AlignConfig()
    if _nat.available():
        return _align_pairs_native(pairs, cfg, free_end)
    return _align_pairs_np(pairs, cfg, free_end)


def _init_band(lq: int, ls: int, free_end: bool) -> int:
    if free_end:
        return min(max(128, lq // 2), ls + 1)
    pad = _seg_pad(lq, ls)
    need = 2 * (abs(ls - lq) + 2 * pad)
    return need if need < ls + 1 else ls + 1


def _align_pairs_native(pairs, cfg, free_end):
    """Native C++ fill + traceback (host path), one batched ctypes call
    per block — per-call marshaling overhead would otherwise dominate
    the tiny inter-anchor segment fills."""
    from lesv_tpu import native

    out: list[Alignment | None] = [None] * len(pairs)
    live = [i for i, (q, s) in enumerate(pairs)
            if len(q) > 0 and len(s) > 0]
    if not live:
        return out
    lp = [pairs[i] for i in live]
    W0 = np.asarray([_init_band(len(q), len(s), free_end)
                     for q, s in lp], np.int64)
    fe = np.full(len(lp), 1 if free_end else 0, np.uint8)

    def run_block(blk):
        return native.banded_align_batch_host(
            [lp[j] for j in blk], W0[blk], fe[blk], cfg.match,
            cfg.mismatch, cfg.gap_open1, cfg.gap_ext1, cfg.gap_open2,
            cfg.gap_ext2)

    total_cells = int(sum(len(q) * w for (q, _), w in zip(lp, W0)))
    nw = _n_host_workers()
    if len(lp) > 1 and nw > 1 and total_cells > 50_000_000:
        # heavy batches (e.g. remap's band-wide global fills) spread
        # over the host cores; cost-balanced contiguous blocks
        import concurrent.futures as _fut

        costs = np.asarray([len(q) * w for (q, _), w in zip(lp, W0)],
                           np.float64)
        order = np.argsort(-costs, kind="stable")
        blocks: list[list[int]] = [[] for _ in range(2 * nw)]
        loads = np.zeros(2 * nw)
        for j in order:                 # LPT assignment
            t = int(np.argmin(loads))
            blocks[t].append(int(j))
            loads[t] += costs[j]
        blocks = [b for b in blocks if b]
        with _fut.ThreadPoolExecutor(max_workers=nw) as pool:
            results = list(pool.map(run_block, blocks))
        if any(r is None for r in results):
            return _align_pairs_np(pairs, cfg, free_end)
        for blk, r in zip(blocks, results):
            ops_flat, ops_off, nops, score, qe, se, okv = r
            for jj, j in enumerate(blk):
                if not okv[jj]:
                    continue
                ops = ops_flat[ops_off[jj] : ops_off[jj]
                               + nops[jj]].copy()
                out[live[j]] = Alignment(0, int(qe[jj]), 0, int(se[jj]),
                                         ops, score=int(score[jj]))
        return out

    r = run_block(list(range(len(lp))))
    if r is None:                    # native lib unavailable
        return _align_pairs_np(pairs, cfg, free_end)
    ops_flat, ops_off, nops, score, qe, se, okv = r
    for j, i in enumerate(live):
        if not okv[j]:
            continue
        ops = ops_flat[ops_off[j] : ops_off[j] + nops[j]].copy()
        out[i] = Alignment(0, int(qe[j]), 0, int(se[j]), ops,
                           score=int(score[j]))
    return out


def _align_pairs_np(pairs, cfg, free_end):
    out: list[Alignment | None] = []
    for q, s in pairs:
        if len(q) == 0 or len(s) == 0:
            out.append(None)
            continue
        if free_end:
            band = max(256, int(0.25 * len(q)))
            out.append(extension_align(q, s, band, cfg=cfg))
        else:
            band = abs(len(s) - len(q)) + 2 * _seg_pad(len(q), len(s))
            a = None
            while a is None:
                a = banded_global_align(q, s, band, cfg=cfg)
                if band >= len(s) + 1:
                    break
                band *= 2
            out.append(a)
    return out


def _fill_devices():
    """Local devices for round-robin fill dispatch.  All local chips are
    used (the reference's per-host thread pool analogue,
    `chain_and_extend_kmer_matches.c:374-460`); LESV_TPU_FILL_DEVICES
    caps the count (tests / debugging)."""
    import jax

    devs = jax.local_devices()
    cap = os.environ.get("LESV_TPU_FILL_DEVICES")
    if cap:
        devs = devs[: max(1, int(cap))]
    return devs


def _host_cost(lq: int, ls: int, free_end: bool) -> int:
    """Estimated native host fill cost (cells) for one pair — the band
    width the host path (`_align_pairs_native`) would actually use."""
    if free_end:
        W = min(max(128, lq // 2), ls + 1)
    else:
        pad = _seg_pad(lq, ls)
        need = 2 * (abs(ls - lq) + 2 * pad)
        W = need if need < ls + 1 else ls + 1
    return lq * W


def _host_route(pairs, free_end: bool, on_cpu: bool) -> set[int]:
    """Pairs to solve on the host instead of the device.

    On a tunneled chip each dispatch costs an RTT (0.2-1.6 s measured,
    DESIGN.md round-2 profile) while the native C++ fill does a small
    segment in ~10-100 us; consensus waves are thousands of tiny full-DP
    fills, so routing everything below a per-pair cell cap to the host
    (up to a total budget) removes most dispatches outright.  ctypes
    releases the GIL, so host fills parallelize across cores."""
    mode = os.environ.get("LESV_TPU_HOST_SMALL", "auto")
    if mode == "0" or (mode == "auto" and on_cpu):
        return set()
    from lesv_tpu import native as _nat

    if not _nat.available():
        return set()
    # with the device-side traceback the device path's readback is tiny,
    # so the host pool (2 cores here) only takes genuinely small fills —
    # enough to overlap with device dispatches, not enough to become the
    # critical path
    cap = int(os.environ.get("LESV_TPU_HOST_CELLS_CAP", 1 << 18))
    budget = float(os.environ.get("LESV_TPU_HOST_CELLS_BUDGET", 3e8))
    costed = []
    for i, (q, s) in enumerate(pairs):
        lq, ls = len(q), len(s)
        if lq == 0 or ls == 0:
            continue
        c = _host_cost(lq, ls, free_end)
        if c <= cap:
            costed.append((c, i))
    costed.sort()
    out: set[int] = set()
    tot = 0.0
    for c, i in costed:
        if tot + c > budget:
            break
        tot += c
        out.add(i)
    return out


def _chunk_prefers_host(pairs, chunk, W: int, mode: str,
                        free_end: bool) -> bool:
    """Cost-model reroute of a whole device chunk to the host pool.

    On the tunneled chip a chunk's cost is dominated by the dirs-tensor
    readback (Rq x W x lanes bytes at the measured ~25 MB/s d2h): a
    near-empty chunk of one huge full-DP pair ships >100 MB of dirs for
    ~10 Mcells of work the native fill does in ~0.2 s.  Route the chunk
    host-side whenever the native fill (at the measured
    LESV_TPU_HOST_CELL_RATE) beats the estimated dispatch + transfer."""
    from lesv_tpu import native as _nat

    if not _nat.available():
        return False
    d2h = float(os.environ.get("LESV_TPU_D2H_BPS", 25e6))
    rate = float(os.environ.get("LESV_TPU_HOST_CELL_RATE", 3e8))
    max_q = max(len(pairs[i][0]) for i in chunk)
    Rq = 16
    while Rq < max_q + 1:
        Rq *= 4
    n_live = len(chunk)
    Bs = 8 if n_live <= 8 else 128 if n_live <= 128 else 1024
    # monster fills: the dirs tensor must fit HBM comfortably and its
    # flat index must fit int32 (device traceback) — SV-spanning global
    # remaps of 30 kb reads can hit W=32k full-DP buckets; those belong
    # on the host (the reference pays the same full-band rescue on CPU,
    # `map_cns_sv_read.c:145`)
    if Rq * W * Bs >= 1 << 31:
        return True
    fill_cells = max_q * W * Bs
    if W > 1024:
        # no Pallas kernel above W=1024: the XLA scan fill is ~8x slower
        fill_cells *= 8
    if os.environ.get("LESV_TPU_DEV_TB", "1") != "0":
        # device traceback: fetch is (lanes x T) ops + the scan's
        # ~0.09 us per lane-step (measured)
        T = Rq + W
        fetch_bytes = Bs * T
        scan_cost = T * Bs * 0.09e-6
    else:
        fetch_bytes = Rq * W * Bs
        scan_cost = 0.0
    dev_cost = 0.05 + fetch_bytes / d2h + fill_cells / 25e9 + scan_cost
    host_cells = sum(_host_cost(len(pairs[i][0]), len(pairs[i][1]),
                                free_end) for i in chunk)
    host_cost = host_cells / rate
    return host_cost < dev_cost


_CFG_THREADS = 0


def set_num_threads(n: int) -> None:
    """Apply -num_threads to the host pools (reference `-num_threads`
    worker-thread count; 0 = auto).  Called by the driver from
    LesvConfig.num_threads; env vars still override."""
    global _CFG_THREADS
    _CFG_THREADS = int(n or 0)


def _n_host_workers() -> int:
    n = os.environ.get("LESV_TPU_HOST_FILL_THREADS")
    if n:
        return max(1, int(n))
    if _CFG_THREADS > 0:
        return _CFG_THREADS
    return max(1, min(8, os.cpu_count() or 1))


def _n_dispatch_workers(on_cpu: bool) -> int:
    n = os.environ.get("LESV_TPU_DISPATCH_THREADS")
    if n:
        return max(1, int(n))
    # CPU backend: serial (jaxlib's XLA:CPU compile path is flaky under
    # concurrent churn; the fill is compute-bound there anyway).
    if on_cpu:
        return 1
    return _CFG_THREADS if _CFG_THREADS > 0 else 8


def _align_pairs_jax(pairs, cfg, free_end):
    from lesv_tpu.ops.align_jax import (
        banded_align_dispatch,
        banded_align_finish,
    )
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()

    import jax

    from lesv_tpu.utils import profiling

    results: list[Alignment | None] = [None] * len(pairs)
    q2 = _quant_fn()
    on_cpu = jax.default_backend() == "cpu"

    hosted = _host_route(pairs, free_end, on_cpu)

    # assign device buckets
    buckets: dict[tuple[int, int, int, str], list[int]] = {}
    for i, (q, s) in enumerate(pairs):
        lq, ls = len(q), len(s)
        if lq == 0 or ls == 0 or i in hosted:
            continue
        if free_end:
            W = _next_pow2(min(max(128, lq // 2), ls + 1), lo=64)
            Q = q2(lq)
            S = q2(ls + 1)
            if W < S:
                b = (Q, Q + W, W, "diag")   # band reads <= Qmax + W
            else:
                b = (Q, S, S, "full")
        else:
            b = _bucket_of(lq, ls, q2)
        buckets.setdefault(b, []).append(i)

    from lesv_tpu.parallel import mesh as meshmod

    # with an active mesh the fill itself shards each chunk over all
    # devices (one SPMD program); round-robin only without one
    mesh_on = meshmod.active_mesh() is not None
    devices = [None] if mesh_on else _fill_devices()
    lock = _threading.Lock()
    retry: list[int] = []

    def run_host_block(idxs: list[int]) -> None:
        with profiling.trace("align/host_block"):
            out = _align_pairs_native([pairs[i] for i in idxs], cfg,
                                      free_end)
        with lock:
            for i, a in zip(idxs, out):
                results[i] = a

    def run_chunk(chunk: list[int], Qm: int, Sm: int, W: int, mode: str,
                  B: int, dev) -> None:
        qb = np.zeros((B, Qm), np.uint8)
        sb = np.zeros((B, Sm), np.uint8)
        qlen = np.zeros(B, np.int32)
        slen = np.zeros(B, np.int32)
        for j, i in enumerate(chunk):
            q, s = pairs[i]
            qb[j, : len(q)] = q
            s = s[:Sm]                  # diag: cols past Qmax+W are
            sb[j, : len(s)] = s         # outside every band row
            qlen[j] = len(q)
            slen[j] = len(s)
        with profiling.trace(f"align/dispatch/{mode}/W{W}"):
            pend = banded_align_dispatch(qb, sb, qlen, slen, W, mode,
                                         cfg, free_end=free_end,
                                         device=dev)
        with profiling.trace(f"align/finish/{mode}/W{W}"):
            out = banded_align_finish(pend)
        with lock:
            for j, i in enumerate(chunk):
                if not out["ok"][j]:
                    retry.append(i)
                    continue
                n = int(out["nops"][j])
                ops = out["ops"][j][:n].astype(np.uint8)
                results[i] = Alignment(
                    0, int(out["qe"][j]), 0, int(out["se"][j]),
                    ops, score=int(out["score"][j]))

    # device chunk list: each is a (pad + dispatch + readback + traceback)
    # task; a thread pool keeps several tunnel round trips in flight
    tasks = []
    di = 0
    host_blocks = []
    for (Qm, Sm, W, mode), idxs in buckets.items():
        # homogeneous chunks: short segments together so the device-side
        # row slicing (Rq = pow2(max qlen in chunk)) stays tight
        idxs.sort(key=lambda i: len(pairs[i][0]))
        Bfix = _lanes_for(Qm, W)
        for start in range(0, len(idxs), Bfix):
            chunk = idxs[start : start + Bfix]
            # CPU: the fill is compute-bound and compiles are cheap, so
            # shrink the padded width to the chunk; TPU: keep the fixed
            # width (one executable per bucket)
            B = (1 if len(chunk) == 1 else 8 if len(chunk) <= 8 else
                 Bfix) if on_cpu else Bfix
            if not on_cpu and _chunk_prefers_host(pairs, chunk, W, mode,
                                                  free_end):
                # split across the host pool's workers
                step = -(-len(chunk) // _n_host_workers())
                for st2 in range(0, len(chunk), step):
                    host_blocks.append(chunk[st2 : st2 + step])
                continue
            dev = devices[di % len(devices)] if len(devices) > 1 else None
            di += 1
            tasks.append((chunk, Qm, Sm, W, mode, B, dev))

    if hosted:
        hs = sorted(hosted)
        HB = 512
        host_blocks += [hs[i : i + HB] for i in range(0, len(hs), HB)]

    nd = _n_dispatch_workers(on_cpu)
    if nd <= 1 and not host_blocks:
        for t in tasks:
            run_chunk(*t)
    else:
        import concurrent.futures as _fut

        futs = []
        with _fut.ThreadPoolExecutor(max_workers=max(nd, 2)) as dev_pool, \
                _fut.ThreadPoolExecutor(
                    max_workers=_n_host_workers()) as host_pool:
            with profiling.trace("align/overlap"):
                futs = [dev_pool.submit(run_chunk, *t) for t in tasks]
                futs += [host_pool.submit(run_host_block, b)
                         for b in host_blocks]
                for f in futs:
                    f.result()

    # band-escape retries: fall back to the host path with widening
    for i in retry:
        results[i] = _align_pairs_np([pairs[i]], cfg, free_end)[0]
    return results
