"""Group consensus (stage qx2csvrg): error-correct SV reads per group.

Rebuild of `app/cns_sv_read_group/cns_one_group.c`:

* groups capped at 50 signatures by a pairwise length-similarity outlier
  filter (`s_filter_outlier_svsig`, sv_read_group.c:37-90);
* each group member (the full raw read, FWD orientation) is used in turn as
  the template; all other members are overlapped against it (either
  strand), with coverage capped at 15x (`MAX_CNS_COV`);
* two rounds: round 1 accepts overlaps at >= 65% identity, round 2 re-runs
  on the round-1 output at >= 85% (`correct_one_sv_read`, :302-517);
* align tags from accepted overlaps feed the fccns backbone DP; only the
  longest >= min_cov(3)-covered segment of >= min_size(2000) is replaced by
  consensus; flanks are kept raw.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lesv_tpu.config import LesvConfig
from lesv_tpu.io.fasta import revcomp
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.ops.anchored import anchored_align_many
from lesv_tpu.ops.cigar import match_mask
from lesv_tpu.ops.consensus import (
    consensus_from_tags,
    coverage_from_tags,
    tags_from_ops,
)
from lesv_tpu.ops.pairseed import pair_chains
from lesv_tpu.pipeline.grouping import SvGroup
from lesv_tpu.pipeline.signatures import SvSignature


@dataclass
class GroupRead:
    """One group member (reference SvReadInfo)."""

    global_id: int
    name: str
    seq: np.ndarray          # forward-oriented full read (or corrected read)
    raw_seq_from: int = 0    # consensus-replaced segment bounds
    raw_seq_to: int = 0
    fsqdir: int = 0          # orientation of the read's subject-window aln
    fsfrom: int = 0          # subject window (full-reference coords)
    fsto: int = 0


@dataclass
class CorrectedRead:
    global_id: int
    name: str
    seq: np.ndarray          # corrected, forward-oriented
    cns_from: int            # consensus segment within `seq`
    cns_to: int
    fsqdir: int
    subject_id: int
    fsfrom: int
    fsto: int
    group_id: int
    kind: str


def filter_outlier_sigs(sigs: list[SvSignature], cap: int = 50) -> list[SvSignature]:
    """Keep the `cap` signatures most length-consistent with the others."""
    if len(sigs) <= cap:
        return sigs
    lens = np.array([s.length for s in sigs], np.int64)
    mx = np.maximum.outer(lens, lens)
    mn = np.minimum.outer(lens, lens)
    sim = (mx - mn) <= mx * 0.2
    np.fill_diagonal(sim, False)
    score = sim.sum(axis=1)
    order = np.argsort(-score, kind="stable")[:cap]
    return [sigs[i] for i in sorted(order)]


def _group_reads(group: SvGroup, qstore: SeqStore) -> list[GroupRead]:
    out = []
    for s in filter_outlier_sigs(group.sigs):
        seq = qstore.get(s.qid)
        # fsfrom/fsto: the whole SV-read alignment window on the subject
        out.append(GroupRead(
            global_id=s.qid, name=qstore.name_of(s.qid), seq=seq,
            fsqdir=s.qdir, fsfrom=s.aln_sb, fsto=s.aln_se,
        ))
    return out


def _best_overlap(query: GroupRead, template_read: GroupRead,
                  cfg: LesvConfig):
    """Best overlap of query (either strand) onto the template read.

    The expected relative orientation (fsqdir XOR) is tried first; the
    other strand is only searched when the expected one finds nothing
    strong (the reference searches F_R unconditionally,
    `cns_one_group.c:337-339`)."""
    exp = query.fsqdir ^ template_read.fsqdir
    order = (exp, 1 - exp)
    best = None
    for sdir in order:
        q = query.seq if sdir == 0 else revcomp(query.seq)
        chains = pair_chains(q, template_read.seq, cfg=cfg.chain)
        if chains and (best is None or chains[0].score > best[0].score):
            best = (chains[0], sdir, q)
        if best is not None and sdir == exp and best[0].score >= 1000:
            break
    return best


def correct_one_read(
    reads: list[GroupRead],
    tmpl_idx: int,
    cfg: LesvConfig,
    min_ident: float,
) -> GroupRead | None:
    """One template-correction pass (reference correct_one_sv_read).

    Overlap alignments run in device-batched waves; the reference's
    in-order coverage cap is applied between waves."""
    ccfg = cfg.cns
    tmpl_read = reads[tmpl_idx]
    template = tmpl_read.seq
    T = len(template)
    if T == 0:
        return None
    cov = np.zeros(T, np.int64)
    all_tags: list[np.ndarray] = []
    num_added = 0
    cands = []
    for j, other in enumerate(reads):
        if j == tmpl_idx or len(other.seq) == 0:
            continue
        hit = _best_overlap(other, tmpl_read, cfg)
        if hit is None:
            continue
        cands.append((j, *hit))
    WAVE = 16
    idx = 0
    full = False
    while idx < len(cands) and not full:
        batch_tasks = []
        batch_meta = []
        while idx < len(cands) and len(batch_tasks) < WAVE:
            j, chain, sdir, q = cands[idx]
            idx += 1
            sb, se = chain.sbeg, chain.send
            if j >= ccfg.max_cns_cov and (cov[sb:se] >= ccfg.max_cns_cov).all():
                continue
            batch_tasks.append((q, template, chain.anchors, 12))
            batch_meta.append((j, q))
        if not batch_tasks:
            continue
        alns = anchored_align_many(batch_tasks, cfg.align)
        for (j, q), aln in zip(batch_meta, alns):
            if aln is None or len(aln.ops) == 0:
                continue
            mm = match_mask(aln.ops, q, template, aln.qb, aln.sb)
            pid = 100.0 * mm.sum() / len(aln.ops)
            if pid < min_ident:
                continue
            cov[aln.sb : aln.se] += 1
            num_added += 1
            all_tags.append(tags_from_ops(aln.ops, q, aln.qb, aln.sb))
            if num_added >= ccfg.max_cns_cov and (cov >= ccfg.max_cns_cov).all():
                full = True
                break
    # longest >= min_cov covered segment
    ok = cov >= ccfg.min_cov
    frm = to = 0
    best_len = 0
    i = 0
    while i < T:
        if not ok[i]:
            i += 1
            continue
        j = i
        while j < T and ok[j]:
            j += 1
        if j - i > best_len:
            best_len, frm, to = j - i, i, j
        i = j
    if best_len < ccfg.min_size:
        return None
    tags = np.concatenate(all_tags) if all_tags else np.empty((0, 6), np.int32)
    if len(tags) == 0:
        return None
    weights = np.full(len(tags), ccfg.cns_weight)
    full_cov = coverage_from_tags(tags, T)
    cns_seq, frm2, to2 = consensus_from_tags(
        tags, weights, full_cov, frm, to, ccfg.indel_cov_factor)
    if len(cns_seq) < ccfg.min_size:
        return None
    src = reads[tmpl_idx]
    new_seq = np.concatenate([template[:frm2], cns_seq, template[to2:]])
    return GroupRead(
        global_id=src.global_id, name=src.name, seq=new_seq,
        raw_seq_from=frm2, raw_seq_to=frm2 + len(cns_seq),
        fsqdir=src.fsqdir, fsfrom=src.fsfrom, fsto=src.fsto,
    )


def cns_group(
    group: SvGroup,
    qstore: SeqStore,
    cfg: LesvConfig | None = None,
) -> list[CorrectedRead]:
    """Two consensus rounds over one group; returns corrected reads."""
    cfg = cfg or LesvConfig()
    reads = _group_reads(group, qstore)
    round1: list[GroupRead] = []
    for i in range(len(reads)):
        r = correct_one_read(reads, i, cfg, cfg.cns.cns1_perc_identity)
        if r is not None:
            round1.append(r)
    if not round1:
        return []
    round2: list[GroupRead] = []
    for i in range(len(round1)):
        r = correct_one_read(round1, i, cfg, cfg.cns.cns2_perc_identity)
        if r is not None:
            round2.append(r)
    out = []
    for r in round2:
        out.append(CorrectedRead(
            global_id=r.global_id, name=r.name, seq=r.seq,
            cns_from=r.raw_seq_from, cns_to=r.raw_seq_to,
            fsqdir=r.fsqdir, subject_id=group.subject_id,
            fsfrom=r.fsfrom, fsto=r.fsto,
            group_id=group.group_id, kind=group.kind,
        ))
    return out
