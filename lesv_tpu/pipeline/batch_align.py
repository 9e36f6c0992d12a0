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
    """ChainConfig with pair-seeding semantics (min_cnt=1, min_score=30,
    `init_hit_finder.c:26-27`)."""
    import dataclasses

    c = dataclasses.replace(cfg.chain)
    c.min_seed_cnt = 1
    c.min_chain_score = 30
    return c


def _shrink_M(total: np.ndarray, M: int, lo: int = 256) -> int:
    """x4-ladder slot count covering every lane's (budget-clamped) match
    count; match buffers beyond it hold only invalid slots.  Coarse
    steps keep the number of (remotely) compiled chain-scan shapes
    small."""
    need = int(np.minimum(np.asarray(total), M).max(initial=0))
    Mp = lo
    while Mp < need:
        Mp *= 4
    return min(Mp, M)


def batch_pair_chains(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    cfg: LesvConfig,
    k: int = 12,
) -> list[list[Chain]]:
    """Chains for many (q, s) pairs in one sweep.

    Device-batched (pairseed_jax + chain_jax, bucketed by padded shape)
    when cfg.map.engine == "device"; the per-pair host oracle otherwise.
    Lanes whose true match count exceeds the budget fall back to the
    host oracle (identical semantics either way)."""
    if cfg.map.engine != "device":
        return [pair_chains(q, s, k=k, cfg=cfg.chain) for q, s in pairs]

    from lesv_tpu.ops.chain_jax import chain_lanes
    from lesv_tpu.ops.pairseed_jax import pair_matches_batch
    from lesv_tpu.utils import profiling

    import jax

    import jax.numpy as jnp

    pcfg = _pair_chain_cfg(cfg)
    out: list[list[Chain]] = [[] for _ in pairs]
    # coarse shape quantization on TPU (every (B, Qb, Sb) is a separate
    # executable; loading one through the tunnel costs seconds)
    q2 = (_quant_dim if jax.default_backend() != "cpu"
          else _pad_pow2_dim)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (q, s) in enumerate(pairs):
        if len(q) < k or len(s) < k:
            continue
        buckets.setdefault((q2(len(q)), q2(len(s))), []).append(i)
    M = cfg.map.pair_match_budget
    for (Qb, Sb), idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), 64):
            cidx = idxs[start : start + 64]
            chunk = [pairs[i] for i in cidx]
            with profiling.trace("pairseed_device"):
                qoff, soff, valid, total = pair_matches_batch(
                    chunk, k=k, M=M, Qb=Qb, Sb=Sb)
            # valid slots are a prefix (the expansion fills 0..total-1):
            # the chain DP only needs pow2(max total) slots — usually
            # far fewer scan steps than the full budget.  Buffers stay
            # on device end to end (slices are lazy device ops).
            Mp = _shrink_M(total, M)
            with profiling.trace("pairchain_device"):
                lanes = chain_lanes(qoff[:, :Mp], soff[:, :Mp],
                                    valid[:, :Mp], k, pcfg,
                                    J=cfg.chain.lookback)
            for j, i in enumerate(cidx):
                if total[j] > M:
                    out[i] = pair_chains(*pairs[i], k=k, cfg=cfg.chain)
                else:
                    out[i] = lanes[j]
    return out


def _pad_pow2_dim(n: int, lo: int = 256) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _quant_dim(n: int, lo: int = 256, hi: int = 1 << 18) -> int:
    """x4 dimension steps: 256, 1k, 4k, 16k, 64k, 256k."""
    p = lo
    while p < n:
        p *= 4
    return min(p, hi)


def chain_and_align_many(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    cfg: LesvConfig,
    extend: bool = True,
    k: int = 12,
) -> list[Alignment | None]:
    """Best-chain anchored alignment for each (q, s) pair, batched."""
    all_chains = batch_pair_chains(pairs, cfg, k=k)
    tasks = []
    mapping = []
    for i, ((q, s), chains) in enumerate(zip(pairs, all_chains)):
        if chains:
            tasks.append((q, s, chains[0].anchors, k))
            mapping.append(i)
    outs = anchored_align_many(tasks, cfg.align, extend)
    res: list[Alignment | None] = [None] * len(pairs)
    for i, a in zip(mapping, outs):
        res[i] = a
    return res
