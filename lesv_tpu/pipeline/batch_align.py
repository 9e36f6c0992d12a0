"""Batched chain+align orchestration shared by pipeline stages.

Every stage that realigns (sv-read selection, signature extraction,
consensus overlaps, remap) funnels its (query, subject) pairs through
here: host-side dense seeding + chaining per pair, then ONE bucketed
device sweep over all segments via `anchored_align_many`.
"""

from __future__ import annotations

import numpy as np

from lesv_tpu.config import LesvConfig
from lesv_tpu.ops.align_np import Alignment
from lesv_tpu.ops.anchored import anchored_align_many
from lesv_tpu.ops.chain import Chain
from lesv_tpu.ops.pairseed import pair_chains


def _pair_chain_cfg(cfg: LesvConfig):
    """ChainConfig with pair-seeding semantics (min_cnt=1,
    min_score=memsc_mem_score, `init_hit_finder.c:26-27`,
    `cmdline_args.cpp:56-57`)."""
    import dataclasses

    c = dataclasses.replace(cfg.chain)
    c.min_seed_cnt = 1
    c.min_chain_score = cfg.memsc.mem_score
    return c


def _host_route_pairs(pairs, on_cpu: bool) -> set[int]:
    """Pairs to seed+chain on the host instead of the device.

    On a tunneled chip each (pairseed + chain) chunk costs ~2 RTTs
    (seconds); the host oracle does a small pair in ~1-3 ms (numpy
    merge-join + native chain DP), so short pairs route to a host
    thread pool (same rationale as ops.align_batch._host_route)."""
    import os

    mode = os.environ.get("LESV_TPU_HOST_SMALL", "auto")
    if mode == "0" or (mode == "auto" and on_cpu):
        return set()
    cap = int(os.environ.get("LESV_TPU_HOST_PAIR_CAP", 16384))
    budget = float(os.environ.get("LESV_TPU_HOST_PAIR_BUDGET", 2e8))
    costed = sorted((len(q) + len(s), i) for i, (q, s) in enumerate(pairs)
                    if 0 < len(q) + len(s) <= cap)
    out: set[int] = set()
    tot = 0.0
    for c, i in costed:
        if tot + c > budget:
            break
        tot += c
        out.add(i)
    return out


def _shrink_M(total: np.ndarray, M: int, lo: int = 256) -> int:
    """x2-ladder slot count covering every lane's (budget-clamped) match
    count; match buffers beyond it hold only invalid slots.  Coarse
    steps keep the number of (remotely) compiled chain-scan shapes
    small while bounding fetched dead slots at 2x."""
    need = int(np.minimum(np.asarray(total), M).max(initial=0))
    Mp = lo
    while Mp < need:
        Mp *= 2
    return min(Mp, M)


def batch_pair_chains(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    cfg: LesvConfig,
    k: int | None = None,
) -> list[list[Chain]]:
    """Chains for many (q, s) pairs in one sweep.

    Device-batched (pairseed_jax + chain_jax, bucketed by padded shape)
    when cfg.map.engine == "device"; the per-pair host oracle otherwise.
    Lanes whose true match count exceeds the budget fall back to the
    host oracle (identical semantics either way)."""
    k = k or cfg.memsc.kmer_size
    stride, occ = cfg.memsc.kmer_window, cfg.memsc.max_occ

    def host_chains(q, s):
        return pair_chains(q, s, k=k, q_stride=stride, max_occ=occ,
                           min_score=cfg.memsc.mem_score, cfg=cfg.chain)

    if cfg.map.engine != "device":
        return [host_chains(q, s) for q, s in pairs]

    from lesv_tpu.ops.chain_jax import chain_lanes
    from lesv_tpu.ops.pairseed_jax import (
        pair_chain_lanes_fused,
        pair_matches_batch,
    )
    from lesv_tpu.utils import profiling

    import jax

    pcfg = _pair_chain_cfg(cfg)
    out: list[list[Chain]] = [[] for _ in pairs]
    on_cpu = jax.default_backend() == "cpu"
    hosted = _host_route_pairs(pairs, on_cpu)
    # coarse shape quantization on TPU (every (B, Qb, Sb) is a separate
    # executable; loading one through the tunnel costs seconds)
    q2 = _quant_dim if not on_cpu else _pad_pow2_dim
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (q, s) in enumerate(pairs):
        if len(q) < k or len(s) < k or i in hosted:
            continue
        buckets.setdefault((q2(len(q)), q2(len(s))), []).append(i)
    M = cfg.map.pair_match_budget

    def run_chunk(cidx, Qb, Sb):
        chunk = [pairs[i] for i in cidx]
        if not on_cpu:
            # tunneled device: seeding + sort + chain DP as ONE fused
            # dispatch (pairseed_jax.pair_chain_lanes_fused)
            with profiling.trace("pairchain_fused"):
                lanes, total = pair_chain_lanes_fused(
                    chunk, k=k, q_stride=stride, max_occ=occ, M=M,
                    Qb=Qb, Sb=Sb, ccfg=pcfg, J=cfg.chain.lookback)
        else:
            with profiling.trace("pairseed_device"):
                qoff, soff, valid, total = pair_matches_batch(
                    chunk, k=k, q_stride=stride, max_occ=occ, M=M,
                    Qb=Qb, Sb=Sb)
            # valid slots are a prefix (the expansion fills 0..total-1):
            # the chain DP only needs pow2(max total) slots.  Buffers
            # stay on device end to end.
            Mp = _shrink_M(total, M)
            with profiling.trace("pairchain_device"):
                lanes = chain_lanes(qoff, soff, valid, k, pcfg,
                                    J=cfg.chain.lookback, Mp=Mp)
        for j, i in enumerate(cidx):
            if total[j] > M:
                out[i] = host_chains(*pairs[i])
            else:
                out[i] = lanes[j]

    def run_host_block(idxs):
        for i in idxs:
            out[i] = host_chains(*pairs[i])

    tasks = []
    for (Qb, Sb), idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), 256):
            tasks.append((idxs[start : start + 256], Qb, Sb))
    hs = sorted(hosted)
    host_blocks = [hs[i : i + 64] for i in range(0, len(hs), 64)]

    from lesv_tpu.ops.align_batch import (
        _n_dispatch_workers,
        _n_host_workers,
    )

    nd = _n_dispatch_workers(on_cpu)
    if nd <= 1 and not host_blocks:
        for t in tasks:
            run_chunk(*t)
    else:
        import concurrent.futures as _fut

        with _fut.ThreadPoolExecutor(max_workers=max(nd, 2)) as dev_pool, \
                _fut.ThreadPoolExecutor(
                    max_workers=_n_host_workers()) as host_pool:
            with profiling.trace("pairchain/overlap"):
                futs = [dev_pool.submit(run_chunk, *t) for t in tasks]
                futs += [host_pool.submit(run_host_block, b)
                         for b in host_blocks]
                for f in futs:
                    f.result()
    return out


def _pad_pow2_dim(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _quant_dim(n: int, lo: int = 256, hi: int = 1 << 18) -> int:
    """x4 dimension steps: 256, 1k, 4k, 16k, 64k, 256k.  Measured: each
    dispatch's cost is dominated by fixed tunnel overhead (~0.2-0.4 s),
    so fewer, wider buckets beat tighter padding (x2 steps doubled the
    dispatch count at unchanged per-dispatch cost)."""
    p = lo
    while p < n:
        p *= 4
    return min(p, hi)


def chain_and_align_many(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    cfg: LesvConfig,
    extend: bool = True,
    k: int | None = None,
    global_fallback: bool = False,
) -> list[Alignment | None]:
    """Best-chain anchored alignment for each (q, s) pair, batched.

    With ``global_fallback`` (stages whose reference analogue is a whole-
    span NW: sv-read realign, signature extraction, remap), pairs whose
    anchored alignment fails to cover the span fall back to the host
    global DP (`ops.align_batch.global_align_pairs_host`) — a chance-
    k-mer chain tail past a large SV can block the chain join and leave
    only one flank aligned (`find_sv_reads.c:341-430` semantics)."""
    from lesv_tpu.ops.pairseed import mem_anchors

    k = k or cfg.memsc.kmer_size
    all_chains = batch_pair_chains(pairs, cfg, k=k)
    tasks = []
    mapping = []
    for i, ((q, s), chains) in enumerate(zip(pairs, all_chains)):
        if chains:
            runs = mem_anchors(q, s, chains[0].anchors, k,
                               cfg.memsc.mem_size)
            tasks.append((q, s, runs, k))
            mapping.append(i)
    outs = anchored_align_many(tasks, cfg.align, extend)
    res: list[Alignment | None] = [None] * len(pairs)
    for i, a in zip(mapping, outs):
        res[i] = a
    if global_fallback:
        _apply_global_fallback(pairs, res, cfg)
    return res


def _apply_global_fallback(pairs, res, cfg: LesvConfig,
                           end_gap: int = 128) -> None:
    """Replace low-coverage anchored alignments with whole-span NW.

    The trigger is an ABSOLUTE unaligned-end test, not a fraction: a
    2.6kb flank skipped off a 41kb read is 6% of the span but loses the
    whole SV signature (the flank holds one side of the indel).  Any
    end gap that could hide a >= min_indel_size event (plus anchor
    slack) forces the reference-semantics whole-span NW."""
    from lesv_tpu.ops.align_batch import global_align_pairs_host
    from lesv_tpu.utils import profiling

    idxs = []
    for i, ((q, s), a) in enumerate(zip(pairs, res)):
        if len(q) == 0 or len(s) == 0:
            continue
        if (a is None or a.qb > end_gap or len(q) - a.qe > end_gap
                or a.sb > end_gap or len(s) - a.se > end_gap):
            idxs.append(i)
    if not idxs:
        return
    with profiling.trace("align/global_fallback"):
        galns = global_align_pairs_host([pairs[i] for i in idxs],
                                        cfg.align)
    for i, ga in zip(idxs, galns):
        if ga is None:
            continue
        old = res[i]
        # the reference uses the NW result unconditionally (span coverage
        # is the contract; a flank-only alignment can out-SCORE the true
        # SV-bridging path by dodging the gap penalty) — accept the
        # global alignment whenever it covers more of the span
        if old is None or ((ga.qe - ga.qb) + (ga.se - ga.sb)
                           > (old.qe - old.qb) + (old.se - old.sb)):
            res[i] = ga
