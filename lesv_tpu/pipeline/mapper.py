"""The reference mapper: seed -> chain -> candidate windows -> extend -> M4.

Rebuild of `qx2map` (`app/map/`): DDF seeding over the k-mer index locates
candidate subject windows (`hbn_find_subseq_hit.c`); each window is densely
re-seeded and chained (`init_hit_finder.c` semantics via ops.pairseed,
including the SV-preserving chain join); chains are aligned with the
anchored banded-DP engine; HSPs are filtered (qcov_hsp_res, perc_identity),
deduped, and emitted as M4 records.

This module is the host orchestration; the heavy per-batch compute runs
through the ops layer (device kernels when available, numpy oracle
otherwise).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from lesv_tpu.config import LesvConfig
from lesv_tpu.index.kmer_index import KmerIndex
from lesv_tpu.io.fasta import revcomp
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.ops.anchored import anchored_extend
from lesv_tpu.ops.chain import Chain, extract_chains_np
from lesv_tpu.ops.cigar import effective_ident_perc, ident_perc, match_mask
from lesv_tpu.ops.seeding import collect_seed_matches

FWD, REV = 0, 1


@dataclass
class M4:
    """One mapping record (reference `corelib/m4_record.h`).

    qoff/qend are strand-oriented (coordinates on the qdir-oriented query),
    matching the reference convention (`find_sv_reads.c:131-141`).
    """

    qid: int
    qdir: int
    qoff: int
    qend: int
    qsize: int
    sid: int
    soff: int
    send: int
    ssize: int
    ident_perc: float
    score: int
    dist: int = 0   # edit-ish distance: alignment columns - matches
    # the alignment itself (kept in-memory; the reference round-trips
    # text M4 + re-alignment instead)
    ops: np.ndarray | None = field(default=None, repr=False)


@dataclass
class CandidateWindow:
    sid: int
    sfrom: int
    sto: int
    score: int
    qdir: int


def find_candidate_windows(
    chains_by_dir: dict[int, list[Chain]],
    index: KmerIndex,
    qlen: int,
    cfg: LesvConfig,
) -> list[CandidateWindow]:
    """Group DDF chains by subject, keep top max_target_seqs subjects, expand
    each chain to a subject window, merge near windows.

    Window expansion mirrors `adjust_init_hit_subject_offset`
    (`hbn_find_subseq_hit.c:119-156`): from the chain position extend by
    1.3x the flanking query length, capped at +30kb, clipped to the subject.
    """
    mcfg = cfg.map
    # collect (sid, window, score, qdir)
    raw: list[CandidateWindow] = []
    for qdir, chains in chains_by_dir.items():
        for c in chains:
            gpos = np.int64(c.sbeg)
            sid, loc = index.global_to_local(np.array([gpos]))
            sid, loc = int(sid[0]), int(loc[0])
            ssize = int(index.subject_starts[sid + 1] - index.subject_starts[sid])
            # chain midpoint anchor
            mid_q = (c.qbeg + c.qend) // 2
            mid_s = int((c.sbeg + c.send) // 2 - index.subject_starts[sid])
            ql = mid_q
            qr = qlen - mid_q
            x = min(int(qlen * mcfg.subseq_margin_factor), ql + mcfg.subseq_max_gap)
            sfrom = max(0, mid_s - min(x, mid_s))
            x = min(int(qlen * mcfg.subseq_margin_factor), qr + mcfg.subseq_max_gap)
            sto = min(ssize, mid_s + x)
            raw.append(CandidateWindow(sid, sfrom, sto, c.score, qdir))
    if not raw:
        return []
    # top subjects by best score
    best_by_sid: dict[int, int] = {}
    for w in raw:
        best_by_sid[w.sid] = max(best_by_sid.get(w.sid, 0), w.score)
    top_sids = sorted(best_by_sid, key=lambda s: -best_by_sid[s])[: mcfg.max_target_seqs]
    out: list[CandidateWindow] = []
    for sid in top_sids:
        for qdir in (FWD, REV):
            ws = sorted(
                (w for w in raw if w.sid == sid and w.qdir == qdir),
                key=lambda w: w.sfrom,
            )
            merged: list[CandidateWindow] = []
            for w in ws:
                if merged and w.sfrom - merged[-1].sto <= mcfg.max_subseq_gap_merge:
                    merged[-1].sto = max(merged[-1].sto, w.sto)
                    merged[-1].score = max(merged[-1].score, w.score)
                else:
                    merged.append(CandidateWindow(w.sid, w.sfrom, w.sto, w.score, qdir))
            out.extend(merged)
    return out


def _hsp_contained(kept: list[M4], m: M4, eps: int = 100) -> bool:
    for a in kept:
        if (a.qdir == m.qdir and a.sid == m.sid
                and m.qoff + eps >= a.qoff and m.qend <= a.qend + eps
                and m.soff + eps >= a.soff and m.send <= a.send + eps):
            return True
    return False


def _chains_by_read_host(read: np.ndarray, index: KmerIndex,
                         cfg: LesvConfig) -> dict[int, list[Chain]]:
    matches = collect_seed_matches(index, read, cfg.seeding)
    return {d: extract_chains_np(matches[d][0], matches[d][1],
                                 length=index.k, cfg=cfg.chain)
            for d in (FWD, REV)}


def _chains_by_read_device(
    batch: list[tuple[int, np.ndarray]],
    index: KmerIndex,
    cfg: LesvConfig,
) -> list[dict[int, list[Chain]]]:
    """Batched device seeding + chain DP for every read in the batch
    (both strands); per-lane host fallback on match-budget overflow."""
    from lesv_tpu.ops.chain_jax import chain_lanes
    from lesv_tpu.ops.seeding_jax import seed_matches_batch
    from lesv_tpu.utils import profiling

    import jax

    from lesv_tpu.pipeline.batch_align import (
        _pad_pow2_dim,
        _quant_dim,
        _shrink_M,
    )

    out: list[dict[int, list[Chain]]] = [
        {FWD: [], REV: []} for _ in batch]
    # bucket reads by quantized length (coarse x4 steps on TPU — every
    # distinct shape is a separately loaded executable)
    q2 = (_quant_dim if jax.default_backend() != "cpu"
          else _pad_pow2_dim)
    buckets: dict[int, list[int]] = {}
    for i, (_, read) in enumerate(batch):
        buckets.setdefault(q2(len(read)), []).append(i)
    M = cfg.map.seed_match_budget
    for Qmax, idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), 64):
            cidx = idxs[start : start + 64]
            reads = [batch[i][1] for i in cidx]
            with profiling.trace("map/seed_device"):
                qoff, soff, valid, total = seed_matches_batch(
                    reads, index, cfg.seeding, M=M, Qmax=Qmax)
            total = np.asarray(total)
            Mp = _shrink_M(total, M)
            with profiling.trace("map/chain_device"):
                lanes = chain_lanes(qoff[:, :Mp], soff[:, :Mp],
                                    valid[:, :Mp], index.k, cfg.chain,
                                    J=cfg.chain.lookback)
            for j, i in enumerate(cidx):
                if total[2 * j] > M or total[2 * j + 1] > M:
                    # budget overflow (repeat-dense read): host oracle
                    out[i] = _chains_by_read_host(batch[i][1], index, cfg)
                else:
                    out[i] = {FWD: lanes[2 * j], REV: lanes[2 * j + 1]}
    return out


def map_batch(
    batch: list[tuple[int, np.ndarray]],
    store: SeqStore,
    index: KmerIndex,
    cfg: LesvConfig | None = None,
) -> list[M4]:
    """Map a batch of (qid, read): batched device seeding + chain DP
    (cfg.map.engine == "device", the production path) or the per-read
    host oracle; candidate-window logic on host; all window-chain
    extensions in one device-batched sweep."""
    from lesv_tpu.ops.anchored import anchored_align_many
    from lesv_tpu.pipeline.batch_align import batch_pair_chains
    from lesv_tpu.utils import profiling

    cfg = cfg or LesvConfig()
    device = cfg.map.engine == "device"
    live = [(qid, read) for qid, read in batch
            if len(read) >= max(cfg.map.min_query_size, index.k)]
    with profiling.trace("map/read_chains"):
        if device:
            all_chains = _chains_by_read_device(live, index, cfg)
        else:
            all_chains = [_chains_by_read_host(read, index, cfg)
                          for _, read in live]

    # candidate windows (host, tiny); collect window re-seed tasks
    wtasks: list[tuple[np.ndarray, np.ndarray]] = []
    wmeta: list[tuple[int, int, CandidateWindow]] = []
    with profiling.trace("map/windows"):
        for (qid, read), chains_by_dir in zip(live, all_chains):
            qlen = len(read)
            windows = find_candidate_windows(chains_by_dir, index, qlen,
                                             cfg)
            for w in windows:
                sseq = store.get(w.sid, w.sfrom, w.sto)
                q = read if w.qdir == FWD else revcomp(read)
                wtasks.append((q, sseq))
                wmeta.append((qid, qlen, w))

    with profiling.trace("map/window_chains"):
        wchains_all = batch_pair_chains(wtasks, cfg)

    tasks = []   # (q, sseq, anchors, k)
    meta = []    # (qid, qlen, window, chain)
    for (qid, qlen, w), (q, sseq), wchains in zip(wmeta, wtasks,
                                                  wchains_all):
        for c in wchains[: cfg.map.max_hsps]:
            tasks.append((q, sseq, c.anchors, 12))
            meta.append((qid, qlen, w, c))
    with profiling.trace("map/extend"):
        alns = anchored_align_many(tasks, cfg.align)
    per_qid: dict[int, list[M4]] = {}
    with profiling.trace("map/filter"):
        for (qid, qlen, w, c), (q, sseq, _, _), aln in zip(meta, tasks,
                                                           alns):
            if aln is None:
                continue
            if aln.qe - aln.qb < cfg.map.qcov_hsp_res:
                continue
            mm = match_mask(aln.ops, q, sseq, aln.qb, aln.sb)
            n_match = int(mm.sum())
            pid = (100.0 * n_match / len(aln.ops)) if len(aln.ops) else 0.0
            if pid < cfg.map.perc_identity:
                continue
            m4 = M4(
                qid=qid, qdir=w.qdir, qoff=aln.qb, qend=aln.qe, qsize=qlen,
                sid=w.sid, soff=w.sfrom + aln.sb, send=w.sfrom + aln.se,
                ssize=store.seq_size(w.sid),
                ident_perc=pid, score=aln.score,
                dist=len(aln.ops) - n_match, ops=aln.ops,
            )
            lst = per_qid.setdefault(qid, [])
            if not _hsp_contained(lst, m4):
                lst.append(m4)
    out: list[M4] = []
    for qid in sorted(per_qid):
        lst = per_qid[qid]
        lst.sort(key=lambda m: -m.score)
        out.extend(lst)
    return out


def map_read(
    qid: int,
    read: np.ndarray,
    store: SeqStore,
    index: KmerIndex,
    cfg: LesvConfig | None = None,
) -> list[M4]:
    """Map one read against the indexed subject store; return M4 records."""
    return map_batch([(qid, read)], store, index, cfg)


def map_all(
    reads: list[tuple[str, np.ndarray]],
    store: SeqStore,
    index: KmerIndex,
    cfg: LesvConfig | None = None,
    ckpt_dir: str | None = None,
) -> tuple[list[M4], SeqStore]:
    """Map a list of reads; returns (all M4 records, the query store).

    With ``ckpt_dir``, each read batch's M4s are checkpointed and a
    restarted run resumes after the last completed batch — the
    reference's per-(qvol, svol) `.mapped` merge-on-resume
    (`app/map/main.c:43-58`)."""
    import os

    cfg = cfg or LesvConfig()
    qstore = SeqStore.from_records(reads)
    out: list[M4] = []
    B = cfg.map.batch_reads
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
    for bi, start in enumerate(range(0, qstore.num_seqs, B)):
        part = (os.path.join(ckpt_dir, f"map_part_{bi:05d}.npz")
                if ckpt_dir else None)
        if part and os.path.exists(part):
            from lesv_tpu.pipeline import stages_io as sio

            out.extend(sio.load_m4s(part))
            continue
        batch = [(qid, qstore.get(qid))
                 for qid in range(start, min(start + B, qstore.num_seqs))]
        m4s = map_batch(batch, store, index, cfg)
        if part:
            from lesv_tpu.pipeline import stages_io as sio

            sio.save_m4s(part + ".tmp.npz", m4s)
            os.replace(part + ".tmp.npz", part)
        out.extend(m4s)
    return out, qstore
