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
from lesv_tpu.ops.pairseed import pair_chains


def chain_and_align_many(
    pairs: list[tuple[np.ndarray, np.ndarray]],
    cfg: LesvConfig,
    extend: bool = True,
    k: int = 12,
) -> list[Alignment | None]:
    """Best-chain anchored alignment for each (q, s) pair, batched."""
    tasks = []
    mapping = []
    for i, (q, s) in enumerate(pairs):
        if len(q) < k or len(s) < k:
            continue
        chains = pair_chains(q, s, k=k, cfg=cfg.chain)
        if chains:
            tasks.append((q, s, chains[0].anchors, k))
            mapping.append(i)
    outs = anchored_align_many(tasks, cfg.align, extend)
    res: list[Alignment | None] = [None] * len(pairs)
    for i, a in zip(mapping, outs):
        res[i] = a
    return res
