"""Anchored pairwise alignment: chain anchors -> full gapped alignment.

TPU-native replacement for the reference traceback engine
(`algo/hbn_traceback.c:312-544`): instead of trace-point stitching with
edlib NW + blockwise edlib extension + DALIGNER rescue, the alignment
between consecutive exact-match anchors is solved by the banded dual-affine
DP (`ops/align_np.banded_global_align` on host; batched kernels on device),
and read ends are extended blockwise with `extension_align` (the reference's
`left_extend/right_extend` semantics, stopping when a block diverges).

Invariants preserved (SURVEY.md §3.5): anchors are exact matches and the
final alignment is trimmed back to an 8bp exact match at both ends.
"""

from __future__ import annotations

import numpy as np

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_np import (
    NEG,
    OP_D,
    OP_I,
    OP_M,
    Alignment,
    banded_global_align,
    extension_align,
)
from lesv_tpu.ops.cigar import trim_to_exact_match


def sanitize_anchors(anchors: np.ndarray, k: int) -> np.ndarray:
    """Turn chain anchors into non-overlapping exact runs (qoff, soff, len).

    ``anchors`` is (n, 2) k-mer starts (each of length ``k``) or (n, 3)
    variable-length runs (MEMs from :func:`ops.pairseed.mem_anchors`).
    Same-diagonal overlapping/adjacent anchors merge into one maximal run;
    an anchor overlapping the previous run in either coordinate on a
    different diagonal is dropped (the banded DP resolves the region).
    """
    a = np.asarray(anchors, np.int64)
    if a.size == 0:
        return np.empty((0, 3), np.int64)
    if a.shape[1] == 2:
        a = np.concatenate([a, np.full((len(a), 1), k, np.int64)], axis=1)
    out: list[list[int]] = []
    for qo, so, ln in a:
        if not out:
            out.append([qo, so, ln])
            continue
        pq, ps, pl = out[-1]
        if qo - pq == so - ps:  # same diagonal
            if qo <= pq + pl:   # overlap/adjacent: extend run
                out[-1][2] = max(pl, qo + ln - pq)
                continue
        if qo < pq + pl or so < ps + pl:  # conflicting overlap: drop
            continue
        out.append([qo, so, ln])
    return np.asarray(out, np.int64)


def _gap_band(qgap: int, sgap: int, cfg: AlignConfig) -> int:
    dd = abs(sgap - qgap)
    pad = max(64, int(0.12 * min(qgap, sgap)))
    return dd + 2 * pad


def anchored_align_many(
    tasks: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]],
    cfg: AlignConfig | None = None,
    extend: bool = True,
) -> list[Alignment | None]:
    """Align many (q, s, anchors, k) tasks, batching all inter-anchor
    segments (and then all end-extension blocks) across tasks into bucketed
    device-kernel calls.  Each result is trimmed to the 8bp-exact-match
    invariant.

    The plan/core phase (sanitize + M/D/I emission + tiny-gap micro-DP)
    runs in native C++ when available (`native.stitch_core`) — the pure
    python loop is host-latency-bound at production task counts."""
    from lesv_tpu import native as _nat

    cfg = cfg or AlignConfig()
    if _nat.available() and not _nat._off("stitch_core"):
        return _anchored_align_many_native(tasks, cfg, extend)
    return _anchored_align_many_py(tasks, cfg, extend)


def _anchored_align_many_native(tasks, cfg, extend):
    from lesv_tpu import native as _nat
    from lesv_tpu.ops.align_batch import TINY_SEG, align_pairs
    from lesv_tpu.utils import profiling

    n = len(tasks)
    stitched: list[list | None] = []
    seg_pairs: list[tuple[np.ndarray, np.ndarray]] = []
    seg_owner: list[tuple[int, int]] = []
    with profiling.trace("anchored/stitch_native"):
        for ti, (q, s, anchors, k) in enumerate(tasks):
            a = np.asarray(anchors, np.int64)
            if a.size == 0:
                stitched.append(None)
                continue
            if a.shape[1] == 2:
                a = np.concatenate(
                    [a, np.full((len(a), 1), k, np.int64)], axis=1)
            r = _nat.stitch_core(q, s, a, TINY_SEG, cfg.match,
                                 cfg.mismatch, cfg.gap_open1,
                                 cfg.gap_ext1, cfg.gap_open2,
                                 cfg.gap_ext2)
            if r is None:
                stitched.append(None)
                continue
            ops, score, bounds, bigs = r
            for qa, qb2, sa, sb2, pos in bigs:
                seg_pairs.append((q[qa:qb2], s[sa:sb2]))
                seg_owner.append((ti, int(pos)))
            stitched.append([ops, score, bounds, []])
    with profiling.trace("anchored/segments"):
        outs = align_pairs(seg_pairs, cfg, free_end=False)
    for (ti, pos), a in zip(seg_owner, outs):
        if stitched[ti] is None:
            continue
        if a is None:
            stitched[ti] = None
            continue
        stitched[ti][3].append((pos, a))
    cores: list[Alignment | None] = []
    with profiling.trace("anchored/splice"):
        for st in stitched:
            if st is None:
                cores.append(None)
                continue
            ops, score, (qb, qe, sb, se), inserts = st
            if inserts:
                parts = []
                prev = 0
                for pos, a in sorted(inserts, key=lambda t: t[0]):
                    parts.append(ops[prev:pos])
                    parts.append(a.ops)
                    score += a.score
                    prev = pos
                parts.append(ops[prev:])
                ops = np.concatenate(parts)
            cores.append(Alignment(int(qb), int(qe), int(sb), int(se),
                                   np.ascontiguousarray(ops),
                                   score=int(score)))
    lefts = [Alignment(0, 0, 0, 0, np.empty(0, np.uint8), 0)
             for _ in range(n)]
    rights = [Alignment(0, 0, 0, 0, np.empty(0, np.uint8), 0)
              for _ in range(n)]
    if extend:
        with profiling.trace("anchored/extend_ends"):
            _extend_ends(tasks, cores, lefts, rights, cfg)
    with profiling.trace("anchored/stitch_trim"):
        return _stitch_and_trim(tasks, cores, lefts, rights, extend, cfg)


def _anchored_align_many_py(
    tasks: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]],
    cfg: AlignConfig | None = None,
    extend: bool = True,
) -> list[Alignment | None]:
    """Pure-python plan/core phase (the numpy fallback + the oracle the
    native stitch is tested against)."""
    from lesv_tpu.ops.align_batch import align_pairs
    from lesv_tpu.utils import profiling

    _tr = profiling.trace
    cfg = cfg or AlignConfig()
    n = len(tasks)
    runs_all: list[np.ndarray | None] = []
    seg_pairs: list[tuple[np.ndarray, np.ndarray]] = []
    seg_owner: list[tuple[int, int]] = []   # (task, segment slot)
    plans: list[list[tuple[str, object]] | None] = []
    for ti, (q, s, anchors, k) in enumerate(tasks):
        runs = sanitize_anchors(anchors, k)
        if len(runs):
            # guard: a run must not overrun either sequence (a k larger
            # than the seeds' true k would otherwise walk off the ends)
            runs = runs.copy()
            runs[:, 2] = np.minimum(
                runs[:, 2],
                np.minimum(len(q) - runs[:, 0], len(s) - runs[:, 1]))
            runs = runs[runs[:, 2] > 0]
        runs_all.append(runs)
        if len(runs) == 0:
            plans.append(None)
            continue
        plan: list[tuple[str, object]] = []
        for idx in range(len(runs)):
            qo, so, ln = (int(v) for v in runs[idx])
            if idx > 0:
                pq, ps, pl = (int(v) for v in runs[idx - 1])
                qgap = qo - (pq + pl)
                sgap = so - (ps + pl)
                if qgap == 0 and sgap == 0:
                    pass
                elif qgap == 0:
                    plan.append(("D", sgap))
                elif sgap == 0:
                    plan.append(("I", qgap))
                else:
                    plan.append(("seg", len(seg_pairs)))
                    seg_pairs.append((q[pq + pl : qo], s[ps + pl : so]))
                    seg_owner.append((ti, len(plan) - 1))
            plan.append(("M", ln))
        plans.append(plan)

    from lesv_tpu.ops.align_batch import TINY_SEG, align_pairs_host

    tiny = [k for k, (a, b) in enumerate(seg_pairs)
            if max(len(a), len(b)) <= TINY_SEG]
    big = [k for k in range(len(seg_pairs)) if k not in set(tiny)]
    seg_out: list[Alignment | None] = [None] * len(seg_pairs)
    with _tr("anchored/tiny_segments"):
        for k, a in zip(tiny, align_pairs_host(
                [seg_pairs[k] for k in tiny], cfg, free_end=False)):
            seg_out[k] = a
    with _tr("anchored/segments"):
        for k, a in zip(big, align_pairs(
                [seg_pairs[k] for k in big], cfg, free_end=False)):
            seg_out[k] = a

    cores: list[Alignment | None] = []
    for ti, plan in enumerate(plans):
        if plan is None:
            cores.append(None)
            continue
        runs = runs_all[ti]
        ops_parts: list[np.ndarray] = []
        score = 0
        failed = False
        for kind, val in plan:
            if kind == "M":
                ops_parts.append(np.full(val, OP_M, np.uint8))
                score += val * cfg.match
            elif kind == "D":
                ops_parts.append(np.full(val, OP_D, np.uint8))
                score -= min(cfg.gap_open1 + val * cfg.gap_ext1,
                             cfg.gap_open2 + val * cfg.gap_ext2)
            elif kind == "I":
                ops_parts.append(np.full(val, OP_I, np.uint8))
                score -= min(cfg.gap_open1 + val * cfg.gap_ext1,
                             cfg.gap_open2 + val * cfg.gap_ext2)
            else:
                seg = seg_out[val]
                if seg is None:
                    failed = True
                    break
                ops_parts.append(seg.ops)
                score += seg.score
        if failed:
            cores.append(None)
            continue
        q0, s0 = int(runs[0][0]), int(runs[0][1])
        q1 = int(runs[-1][0] + runs[-1][2])
        s1 = int(runs[-1][1] + runs[-1][2])
        cores.append(Alignment(q0, q1, s0, s1,
                               np.concatenate(ops_parts), score=score))

    # blockwise end extension, batched across tasks per direction/iteration.
    # Progressive block sizes: a diverging tail (the common case — the
    # chain already covers the true overlap) is rejected by a cheap 256bp
    # DP instead of a 2kb one (the reference's blockwise edlib_extend has
    # the same early-out character).
    lefts = [Alignment(0, 0, 0, 0, np.empty(0, np.uint8), 0) for _ in range(n)]
    rights = [Alignment(0, 0, 0, 0, np.empty(0, np.uint8), 0) for _ in range(n)]
    if extend:
        with _tr("anchored/extend_ends"):
            _extend_ends(tasks, cores, lefts, rights, cfg)

    with _tr("anchored/stitch_trim"):
        out = _stitch_and_trim(tasks, cores, lefts, rights, extend, cfg)
    return out


def _extend_ends(tasks, cores, lefts, rights, cfg):
    from lesv_tpu.ops.align_batch import align_pairs

    BLOCKS = (256, 1024, 2048)
    n = len(tasks)
    for side in ("L", "R"):
        # per-task tail cursors: (q consumed, s consumed, iteration)
        active = [ti for ti in range(n) if cores[ti] is not None]
        cursors = {ti: (0, 0, 0) for ti in active}
        while active:
            batch_pairs = []
            batch_tis = []
            for ti in active:
                q, s, _, _ = tasks[ti]
                core = cores[ti]
                qi, si, it = cursors[ti]
                if side == "L":
                    qt = q[: core.qb][::-1]
                    st = s[: core.sb][::-1]
                else:
                    qt = q[core.qe :]
                    st = s[core.se :]
                block = BLOCKS[min(it, len(BLOCKS) - 1)]
                qb_ = qt[qi : qi + block]
                sb_ = st[si : si + int(block * 1.25) + 64]
                batch_pairs.append((qb_, sb_))
                batch_tis.append(ti)
            exts = align_pairs(batch_pairs, cfg, free_end=True)
            next_active = []
            for ti, ext, (qb_, sb_) in zip(batch_tis, exts, batch_pairs):
                acc = lefts[ti] if side == "L" else rights[ti]
                qi, si, it = cursors[ti]
                block = BLOCKS[min(it, len(BLOCKS) - 1)]
                if ext is None or len(ext.ops) == 0 or ext.score <= 0:
                    continue
                acc.ops = np.concatenate([acc.ops, ext.ops])
                acc.qe += ext.qe
                acc.se += ext.se
                acc.score += ext.score
                cursors[ti] = (qi + ext.qe, si + ext.se, it + 1)
                if ext.qe >= len(qb_) - 8 and len(qb_) == block:
                    next_active.append(ti)
            active = next_active


def _stitch_and_trim(tasks, cores, lefts, rights, extend, cfg):
    n = len(tasks)
    out: list[Alignment | None] = []
    for ti in range(n):
        core = cores[ti]
        if core is None:
            out.append(None)
            continue
        q, s, _, _ = tasks[ti]
        parts = []
        qb, qe, sb, se = core.qb, core.qe, core.sb, core.se
        score = core.score
        left, right = lefts[ti], rights[ti]
        if extend and len(left.ops):
            parts.append(left.ops[::-1])
            qb -= left.qe
            sb -= left.se
            score += left.score
        parts.append(core.ops)
        if extend and len(right.ops):
            parts.append(right.ops)
            qe += right.qe
            se += right.se
            score += right.score
        aln = Alignment(qb, qe, sb, se, np.concatenate(parts), score=score)
        out.append(trim_to_exact_match(aln, q, s, cfg.end_match_len))
    return out


def anchored_extend(
    q: np.ndarray,
    s: np.ndarray,
    anchors: np.ndarray,
    k: int,
    cfg: AlignConfig | None = None,
    extend: bool = True,
) -> Alignment | None:
    """Full pairwise alignment: stitch anchors, extend to both ends, trim.

    ``s`` may be a window of a larger subject; anchors are in the
    coordinates of ``q``/``s`` as given.  The result is trimmed so it begins
    and ends with an ``end_match_len`` exact match.
    """
    return anchored_align_many([(q, s, anchors, k)], cfg, extend)[0]
