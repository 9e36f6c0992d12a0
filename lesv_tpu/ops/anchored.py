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

    Same-diagonal overlapping/adjacent anchors merge into one maximal run;
    an anchor overlapping the previous run in either coordinate on a
    different diagonal is dropped (the banded DP resolves the region).
    """
    if len(anchors) == 0:
        return np.empty((0, 3), np.int64)
    out: list[list[int]] = []
    for qo, so in np.asarray(anchors, np.int64):
        if not out:
            out.append([qo, so, k])
            continue
        pq, ps, pl = out[-1]
        if qo - pq == so - ps:  # same diagonal
            if qo <= pq + pl:   # overlap/adjacent: extend run
                out[-1][2] = max(pl, qo + k - pq)
                continue
        if qo < pq + pl or so < ps + pl:  # conflicting overlap: drop
            continue
        out.append([qo, so, k])
    return np.asarray(out, np.int64)


def _gap_band(qgap: int, sgap: int, cfg: AlignConfig) -> int:
    dd = abs(sgap - qgap)
    pad = max(64, int(0.12 * min(qgap, sgap)))
    return dd + 2 * pad


def align_between_anchors(q: np.ndarray, s: np.ndarray, runs: np.ndarray,
                          cfg: AlignConfig | None = None) -> Alignment | None:
    """Global alignment of q[runs[0].q : runs[-1].q+len) vs the matching
    subject span, stitched from per-segment banded DPs."""
    cfg = cfg or AlignConfig()
    if len(runs) == 0:
        return None
    ops: list[np.ndarray] = []
    score = 0
    for idx, (qo, so, ln) in enumerate(runs):
        if idx > 0:
            pq, ps, pl = runs[idx - 1]
            qgap = int(qo - (pq + pl))
            sgap = int(so - (ps + pl))
            if qgap < 0 or sgap < 0:
                return None  # sanitize_anchors guarantees this never fires
            if qgap == 0 and sgap == 0:
                pass
            elif qgap == 0:
                ops.append(np.full(sgap, OP_D, np.uint8))
                score -= min(cfg.gap_open1 + sgap * cfg.gap_ext1,
                             cfg.gap_open2 + sgap * cfg.gap_ext2)
            elif sgap == 0:
                ops.append(np.full(qgap, OP_I, np.uint8))
                score -= min(cfg.gap_open1 + qgap * cfg.gap_ext1,
                             cfg.gap_open2 + qgap * cfg.gap_ext2)
            else:
                qs = q[pq + pl : qo]
                ss = s[ps + pl : so]
                band = _gap_band(qgap, sgap, cfg)
                seg = None
                while seg is None:
                    seg = banded_global_align(qs, ss, band, cfg=cfg)
                    if band >= len(ss) + 1:
                        break
                    band *= 2
                if seg is None:
                    return None
                ops.append(seg.ops)
                score += seg.score
        ops.append(np.full(int(ln), OP_M, np.uint8))
        score += int(ln) * cfg.match
    allops = np.concatenate(ops) if ops else np.empty(0, np.uint8)
    q0, s0 = int(runs[0][0]), int(runs[0][1])
    q1 = int(runs[-1][0] + runs[-1][2])
    s1 = int(runs[-1][1] + runs[-1][2])
    return Alignment(q0, q1, s0, s1, allops, score=score)


def extend_end(q_tail: np.ndarray, s_tail: np.ndarray,
               cfg: AlignConfig | None = None,
               block: int = 2_048) -> Alignment:
    """Blockwise extension of an unanchored tail (both arrays oriented
    away from the anchor).  Returns the extension alignment from (0,0)."""
    cfg = cfg or AlignConfig()
    ops: list[np.ndarray] = []
    qi = si = 0
    score = 0
    while qi < len(q_tail) and si < len(s_tail):
        qb = q_tail[qi : qi + block]
        sb = s_tail[si : si + int(block * 1.25) + 64]
        band = max(256, int(0.25 * len(qb)))
        ext = extension_align(qb, sb, band, cfg=cfg)
        if ext is None or len(ext.ops) == 0 or ext.score <= 0:
            break
        ops.append(ext.ops)
        score += ext.score
        qi += ext.qe
        si += ext.se
        # keep going only if the block was (nearly) fully consumed
        if ext.qe < len(qb) - 8:
            break
    allops = np.concatenate(ops) if ops else np.empty(0, np.uint8)
    return Alignment(0, qi, 0, si, allops, score=score)


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
    cfg = cfg or AlignConfig()
    runs = sanitize_anchors(anchors, k)
    if len(runs) == 0:
        return None
    core = align_between_anchors(q, s, runs, cfg)
    if core is None:
        return None
    parts = [core.ops]
    qb, qe, sb, se = core.qb, core.qe, core.sb, core.se
    score = core.score
    if extend:
        left = extend_end(q[:qb][::-1], s[:sb][::-1], cfg)
        if len(left.ops):
            parts.insert(0, left.ops[::-1])
            qb -= left.qe
            sb -= left.se
            score += left.score
        right = extend_end(q[qe:], s[se:], cfg)
        if len(right.ops):
            parts.append(right.ops)
            qe += right.qe
            se += right.se
            score += right.score
    aln = Alignment(qb, qe, sb, se, np.concatenate(parts), score=score)
    return trim_to_exact_match(aln, q, s, cfg.end_match_len)
