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


def _window_ddf_chains(chains: list[Chain], index: KmerIndex,
                       w: CandidateWindow) -> list[Chain]:
    """DDF chains whose anchors fall inside window ``w``, with subject
    offsets translated to window-local coordinates (the -skip_memsc
    path's anchor source)."""
    import dataclasses

    base = int(index.subject_starts[w.sid])
    lo, hi = base + w.sfrom, base + w.sto
    out: list[Chain] = []
    for c in chains:
        a = c.anchors
        keep = (a[:, 1] >= lo) & (a[:, 1] + index.k <= hi)
        if not keep.any():
            continue
        a2 = a[keep].copy()
        a2[:, 1] -= lo
        out.append(dataclasses.replace(c, anchors=a2))
    out.sort(key=lambda c: -c.score)
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
    on_cpu = jax.default_backend() == "cpu"
    overflow: list[int] = []
    for Qmax, idxs in sorted(buckets.items()):
        for start in range(0, len(idxs), 64):
            cidx = idxs[start : start + 64]
            reads = [batch[i][1] for i in cidx]
            if not on_cpu:
                # tunneled device: seeding + sort + chain DP fused into
                # ONE dispatch (seeding_jax.seed_chain_lanes_fused)
                from lesv_tpu.ops.seeding_jax import seed_chain_lanes_fused

                lanes, total = seed_chain_lanes_fused(
                    reads, index, cfg.seeding, cfg.chain, M=M, Qmax=Qmax,
                    J=cfg.chain.lookback)
            else:
                with profiling.trace("map/seed_device"):
                    qoff, soff, valid, total = seed_matches_batch(
                        reads, index, cfg.seeding, M=M, Qmax=Qmax)
                total = np.asarray(total)
                Mp = _shrink_M(total, M)
                with profiling.trace("map/chain_device"):
                    lanes = chain_lanes(qoff, soff, valid, index.k,
                                        cfg.chain, J=cfg.chain.lookback,
                                        Mp=Mp)
            for j, i in enumerate(cidx):
                if total[2 * j] > M or total[2 * j + 1] > M:
                    overflow.append(i)
                else:
                    out[i] = {FWD: lanes[2 * j], REV: lanes[2 * j + 1]}
    # long/repeat-dense reads overflow the per-lane budget: retry on
    # device at 4x slots (narrow chunks) before the stride-1 host oracle
    # (which costs ~1s/read) — the reference has no budget (ragged
    # arrays), so this only affects the execution path, not the chains
    if overflow and not on_cpu:
        from lesv_tpu.ops.seeding_jax import seed_chain_lanes_fused

        M2x = 2 * M
        still: list[int] = []
        rebuck: dict[int, list[int]] = {}
        for i in overflow:
            rebuck.setdefault(q2(len(batch[i][1])), []).append(i)
        for Qmax, oidx in sorted(rebuck.items()):
            for start in range(0, len(oidx), 8):
                cidx = oidx[start : start + 8]
                reads = [batch[i][1] for i in cidx]
                lanes, total = seed_chain_lanes_fused(
                    reads, index, cfg.seeding, cfg.chain, M=M2x,
                    Qmax=Qmax, J=cfg.chain.lookback)
                for j, i in enumerate(cidx):
                    if total[2 * j] > M2x or total[2 * j + 1] > M2x:
                        still.append(i)
                    else:
                        out[i] = {FWD: lanes[2 * j],
                                  REV: lanes[2 * j + 1]}
        overflow = still
    for i in overflow:
        out[i] = _chains_by_read_host(batch[i][1], index, cfg)
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
    wddf: list[list[Chain]] = []   # DDF chains per window (skip_memsc)
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
                if cfg.memsc.skip_memsc:
                    wddf.append(_window_ddf_chains(
                        chains_by_dir[w.qdir], index, w))

    if cfg.memsc.skip_memsc:
        # -skip_memsc: extend straight from the DDF chain anchors
        # (reference `hbn_extend_subseq_hit_diff.c` path; the re-seed
        # stage is bypassed, SURVEY §2.3 diff-gap-align row)
        wchains_all = wddf
        mk = index.k
    else:
        with profiling.trace("map/window_chains"):
            wchains_all = batch_pair_chains(wtasks, cfg)
        mk = cfg.memsc.kmer_size

    from lesv_tpu.ops.pairseed import mem_anchors

    tasks = []   # (q, sseq, anchors, k)
    meta = []    # (qid, qlen, window, chain)
    for (qid, qlen, w), (q, sseq), wchains in zip(wmeta, wtasks,
                                                  wchains_all):
        for c in wchains[: cfg.map.max_hsps]:
            if cfg.memsc.skip_memsc:
                runs = c.anchors          # DDF k-mers (k = index.k >= 15)
            else:
                runs = mem_anchors(q, sseq, c.anchors, mk,
                                   cfg.memsc.mem_size)
            tasks.append((q, sseq, runs, mk))
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


def query_volumes(sizes: list[int], max_res: int) -> list[list[int]]:
    """Greedy in-order packing of reads into query volumes of
    <= ``max_res`` residues (-max_query_vol_res; the reference's query
    DB volume partitioning, `makehbndb.c:20-26`).  Volumes are the
    resume/grid-striding granularity (`app/map/main.c:35,41,55`)."""
    vols: list[list[int]] = []
    cur: list[int] = []
    res = 0
    for qid, sz in enumerate(sizes):
        if cur and res + sz > max_res:
            vols.append(cur)
            cur, res = [], 0
        cur.append(qid)
        res += sz
    if cur:
        vols.append(cur)
    return vols


def _query_batches(qstore: SeqStore, cfg: LesvConfig):
    """Read batches bounded by count (batch_reads) AND residues
    (-query_batch_size, `hbn_align_one_volume.c:55-83`): bounds in-flight
    seed-match memory for long-read sets.  Batches never straddle a
    query-volume boundary (-max_query_vol_res), so batch checkpoints
    compose with volume-granular resume/striding."""
    B, R = cfg.map.batch_reads, cfg.map.query_batch_size
    sizes = [qstore.seq_size(q) for q in range(qstore.num_seqs)]
    for vol in query_volumes(sizes, cfg.map.max_query_vol_res):
        batch: list[int] = []
        res = 0
        for qid in vol:
            sz = sizes[qid]
            if batch and (len(batch) >= B or res + sz > R):
                yield batch
                batch, res = [], 0
            batch.append(qid)
            res += sz
        if batch:
            yield batch


def map_all(
    reads: list[tuple[str, np.ndarray]],
    store: SeqStore,
    index: KmerIndex,
    cfg: LesvConfig | None = None,
    ckpt_dir: str | None = None,
    qstore: SeqStore | None = None,
    part_prefix: str = "map_part",
    sid_base: int = 0,
) -> tuple[list[M4], SeqStore]:
    """Map a list of reads against one index; returns (M4s, query store).

    With ``ckpt_dir``, each read batch's M4s are checkpointed and a
    restarted run resumes after the last completed batch — the
    reference's per-(qvol, svol) `.mapped` merge-on-resume
    (`app/map/main.c:43-58`).  ``sid_base`` translates volume-local
    subject ids back to global ids (subject-volume loop)."""
    import os

    cfg = cfg or LesvConfig()
    if qstore is None:
        qstore = SeqStore.from_records(reads)
    out: list[M4] = []
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
    vstore = store if sid_base == 0 else _VolStoreView(store, sid_base)

    def run_one(bi: int, qids: list[int]) -> list[M4]:
        part = (os.path.join(ckpt_dir, f"{part_prefix}_{bi:05d}.npz")
                if ckpt_dir else None)
        if part and os.path.exists(part):
            from lesv_tpu.pipeline import stages_io as sio

            return sio.load_m4s(part)
        batch = [(qid, qstore.get(qid)) for qid in qids]
        m4s = map_batch(batch, vstore, index, cfg)
        if sid_base:
            for m in m4s:
                m.sid += sid_base
        if part:
            from lesv_tpu.pipeline import stages_io as sio

            sio.save_m4s(part + ".tmp.npz", m4s)
            os.replace(part + ".tmp.npz", part)
        return m4s

    batches = list(enumerate(_query_batches(qstore, cfg)))
    depth = _map_overlap_depth()
    if depth <= 1 or len(batches) <= 1:
        for bi, qids in batches:
            out.extend(run_one(bi, qids))
        return out, qstore
    # double-buffer batches: batch i+1's device seeding overlaps batch
    # i's host window/extension phases (the tunnel round trips and the
    # host CPU work interleave instead of strictly alternating)
    import concurrent.futures as _fut

    with _fut.ThreadPoolExecutor(max_workers=depth) as pool:
        futs = [pool.submit(run_one, bi, qids) for bi, qids in batches]
        for f in futs:
            out.extend(f.result())
    return out, qstore


def _map_overlap_depth() -> int:
    """In-flight map batches.  >1 only on a real device: the XLA:CPU
    compile path is flaky under concurrent churn (see verify notes),
    and on CPU the fill is compute-bound anyway."""
    import os

    env = os.environ.get("LESV_TPU_MAP_OVERLAP")
    if env:
        return max(1, int(env))
    import jax

    return 2 if jax.default_backend() != "cpu" else 1


class _VolStoreView:
    """Subject store restricted to one volume: volume-local subject ids
    delegate to the backing store (the mapper sees the volume as the
    whole world, `app/map/main.c:40-70`)."""

    def __init__(self, store: SeqStore, lo: int):
        self._store, self._lo = store, lo

    def get(self, sid: int, *a, **kw):
        return self._store.get(sid + self._lo, *a, **kw)

    def seq_size(self, sid: int) -> int:
        return self._store.seq_size(sid + self._lo)


def subject_volumes(store: SeqStore, max_res: int) -> list[tuple[int, int]]:
    """Partition subjects into volumes of <= max_res residues (whole
    subjects; a single over-sized subject gets its own volume), the
    reference's seqdb volume rule (`makehbndb.c:20-26`)."""
    vols: list[tuple[int, int]] = []
    lo = 0
    res = 0
    for sid in range(store.num_seqs):
        sz = store.seq_size(sid)
        if sid > lo and res + sz > max_res:
            vols.append((lo, sid))
            lo, res = sid, 0
        res += sz
    if lo < store.num_seqs:
        vols.append((lo, store.num_seqs))
    return vols


def map_all_volumes(
    reads: list[tuple[str, np.ndarray]],
    store: SeqStore,
    cfg: LesvConfig | None = None,
    ckpt_dir: str | None = None,
) -> tuple[list[M4], SeqStore]:
    """Out-of-core mapping: nested subject-volume x query-batch loop.

    The genome-scale path (`app/map/main.c:40-70`): subjects partition
    into <= max_subject_vol_res volumes; each volume's k-mer index is
    built (volume-local positions, bounded RSS), all query batches map
    against it (checkpointed per (volume, batch)), then the index is
    dropped before the next volume.  M4s concatenate across volumes —
    the reference's `merge_all_vs_sj_results` file concatenation."""
    cfg = cfg or LesvConfig()
    vols = subject_volumes(store, cfg.map.max_subject_vol_res)
    qstore = SeqStore.from_records(reads)
    if len(vols) <= 1:
        index = KmerIndex.build(store, cfg.index)
        return map_all(reads, store, index, cfg, ckpt_dir=ckpt_dir,
                       qstore=qstore)
    from lesv_tpu.utils.logging import log

    out: list[M4] = []
    for vi, (lo, hi) in enumerate(vols):
        vres = int(store.starts[hi] - store.starts[lo])
        log(f"[map] subject volume {vi + 1}/{len(vols)}: "
            f"subjects {lo}..{hi - 1} ({vres/1e6:.1f} Mres)")
        index = KmerIndex.build(store, cfg.index, sid_range=(lo, hi))
        m4s, _ = map_all(reads, store, index, cfg, ckpt_dir=ckpt_dir,
                         qstore=qstore, part_prefix=f"map_v{vi:03d}",
                         sid_base=lo)
        out.extend(m4s)
        del index
    # per-query global ordering (score-sorted within query), matching
    # the single-volume path's output contract
    by_qid: dict[int, list[M4]] = {}
    for m in out:
        by_qid.setdefault(m.qid, []).append(m)
    merged: list[M4] = []
    for qid in sorted(by_qid):
        lst = by_qid[qid]
        lst.sort(key=lambda m: -m.score)
        merged.extend(lst)
    return merged, qstore
