"""Stages 4-6 on a small synthetic SV scenario: SV-read selection,
signature extraction, grouping."""

import numpy as np
import pytest

from lesv_tpu.config import LesvConfig
from lesv_tpu.index.kmer_index import KmerIndex
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.pipeline.grouping import group_signatures
from lesv_tpu.pipeline.mapper import map_all
from lesv_tpu.pipeline.signatures import extract_signatures
from lesv_tpu.pipeline.sv_reads import TrfMask, select_sv_reads
from lesv_tpu.sim import plant_svs, random_genome, simulate_reads


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def svworld():
    rng = np.random.default_rng(7)
    genome = random_genome(rng, 100_000)
    donor, truth = plant_svs(rng, genome, n_del=1, n_ins=1,
                             min_len=120, max_len=300, margin=15_000,
                             min_gap=30_000)
    reads = simulate_reads(rng, donor, coverage=12.0, mean_len=9_000,
                           min_len=4_000, err=0.08)
    cfg = LesvConfig()
    store = SeqStore.from_records([("chr1", genome)])
    idx = KmerIndex.build(store, cfg.index)
    m4s, qstore = map_all(reads, store, idx, cfg)
    return genome, truth, reads, cfg, store, qstore, m4s


def test_mapping_coverage(svworld):
    genome, truth, reads, cfg, store, qstore, m4s = svworld
    mapped_qids = {m.qid for m in m4s}
    assert len(mapped_qids) > 0.9 * len(reads)


def test_sv_read_selection(svworld):
    genome, truth, reads, cfg, store, qstore, m4s = svworld
    svrs = select_sv_reads(m4s, qstore, store, cfg)
    assert svrs
    # reads spanning an SV site must be selected
    for sv in truth.svs:
        spanning = [r for r in svrs
                    if r.soff < sv.ref_pos - 500 and r.send > sv.ref_pos + 500]
        assert len(spanning) >= 3, f"{sv.kind}@{sv.ref_pos} lost its reads"


def test_signatures_recover_planted_svs(svworld):
    genome, truth, reads, cfg, store, qstore, m4s = svworld
    svrs = select_sv_reads(m4s, qstore, store, cfg)
    sigs = extract_signatures(svrs, qstore, store, cfg)
    assert sigs
    for sv in truth.svs:
        near = [g for g in sigs
                if g.kind == sv.kind and abs(g.sfrom - sv.ref_pos) < 100
                and abs(g.length - sv.length) < 0.3 * sv.length]
        assert len(near) >= 3, f"{sv.kind}@{sv.ref_pos} len={sv.length}: {len(near)} sigs"
    # and no pile of false signatures away from the planted sites
    false = [g for g in sigs
             if all(abs(g.sfrom - sv.ref_pos) > 1_000 for sv in truth.svs)]
    assert len(false) < max(3, len(sigs) // 4)


def test_grouping(svworld):
    genome, truth, reads, cfg, store, qstore, m4s = svworld
    svrs = select_sv_reads(m4s, qstore, store, cfg)
    sigs = extract_signatures(svrs, qstore, store, cfg)
    groups = group_signatures(sigs, cfg)
    assert groups
    for sv in truth.svs:
        near = [g for g in groups
                if g.kind == sv.kind
                and any(abs(s.sfrom - sv.ref_pos) < 100 for s in g.sigs)]
        assert near, f"no group at {sv.kind}@{sv.ref_pos}"
        assert len(near[0].sigs) >= 4


def test_find_dual_unique_pair():
    """`find_dual_m4s` semantics (find_sv_reads.c:432-456): the split
    alignments chain into an SvRead only when exactly ONE dual pair
    exists; >= 2 candidate pairs yield nothing (nd == 1 check)."""
    from lesv_tpu.pipeline.mapper import M4
    from lesv_tpu.pipeline.sv_reads import _find_dual

    rng = np.random.default_rng(11)
    cfg = LesvConfig()
    seg = rng.integers(0, 4, 5_000).astype(np.uint8)
    left = rng.integers(0, 4, 5_000).astype(np.uint8)
    filler = rng.integers(0, 4, 10_000).astype(np.uint8)
    filler2 = rng.integers(0, 4, 5_000).astype(np.uint8)
    # subject: [left][10kb filler][seg][5kb filler2][seg again (repeat)]
    subject = np.concatenate([left, filler, seg, filler2, seg])
    query = np.concatenate([left, seg])       # read spanning a 10kb DEL
    sstore = SeqStore.from_records([("chr1", subject)])
    qstore = SeqStore.from_records([("q0", query)])

    def m4(qoff, qend, soff, send):
        return M4(qid=0, qdir=0, qoff=qoff, qend=qend, qsize=len(query),
                  sid=0, soff=soff, send=send, ssize=len(subject),
                  ident_perc=99.0, score=1000, dist=0, ops=None)

    lm = m4(0, 5_000, 0, 5_000)                  # left end of read
    rm1 = m4(5_000, 10_000, 15_000, 20_000)      # right end, first copy
    rm2 = m4(5_000, 10_000, 25_000, 30_000)      # right end, repeat copy

    out = []
    assert _find_dual([lm, rm1], qstore, sstore, None, cfg, out)
    assert len(out) == 1
    svr = out[0]
    assert svr.qoff <= 100 and svr.qend >= len(query) - 100
    assert svr.soff <= 100 and svr.send >= 20_000 - 100

    # two candidate pairs: dual M4s exist (returns True) but nothing is
    # chained (ambiguous placement)
    out2 = []
    assert _find_dual([lm, rm1, rm2], qstore, sstore, None, cfg, out2)
    assert out2 == []


def test_trf_mask_excludes(svworld):
    genome, truth, reads, cfg, store, qstore, m4s = svworld
    # mask that covers everything: no signatures survive
    trf = TrfMask(store, {0: [(0, len(genome))]})
    svrs = select_sv_reads(m4s, qstore, store, cfg, trf=trf)
    sigs = extract_signatures(svrs, qstore, store, cfg, trf=trf)
    assert sigs == []


def test_repeat_rich_genome_pipeline():
    """Occ-caps, repeat-M4 removal, TRF masking and N handling on a
    repeat-rich genome (tandem arrays + segmental duplications + N runs,
    the genomes `trf_array.cpp:75-89` / `remove_repeat_m4s` exist for):
    planted SVs outside the repeats are still called; TRF-masked regions
    emit no signatures."""
    from lesv_tpu.sim import repeat_genome, simulate_reads

    rng = np.random.default_rng(23)
    genome, trf_ivs = repeat_genome(rng, 150_000, n_tandem=4, n_dups=2,
                                    n_runs=1)

    def in_repeat(p, margin=4_000):
        return any(a - margin < p < b + margin for a, b in trf_ivs) \
            or (genome[max(0, p - margin): p + margin] >= 4).any()

    # plant one DEL + one INS in clean regions, well separated
    sites = []
    while len(sites) < 2:
        p = int(rng.integers(20_000, 130_000))
        if not in_repeat(p) and all(abs(p - q) > 30_000 for q in sites):
            sites.append(p)
    sites.sort()
    del_pos, ins_pos = sites
    del_len, ins_len = 300, 250
    ins_seq = rng.integers(0, 4, ins_len).astype(np.uint8)
    donor = np.concatenate([
        genome[:del_pos], genome[del_pos + del_len : ins_pos], ins_seq,
        genome[ins_pos:]])
    reads = simulate_reads(rng, donor, coverage=10, mean_len=9_000,
                           min_len=4_000, err=0.08)
    # sequencers call random bases over N stretches
    reads = [(n, np.where(r >= 4, rng.integers(0, 4, len(r)), r)
              .astype(np.uint8)) for n, r in reads]

    from lesv_tpu.pipeline.driver import run_pipeline

    cfg = LesvConfig()
    res = run_pipeline([("chr1", genome)], reads, cfg,
                       trf_intervals={0: trf_ivs})
    by = {(c.kind): c for c in res.calls
          if c.kind == "DEL" and abs(c.pos - del_pos) < 1000
          or c.kind == "INS" and abs(c.pos - (ins_pos - del_len)) < 1000}
    assert "DEL" in by, f"planted DEL missed: {res.calls}"
    assert "INS" in by, f"planted INS missed: {res.calls}"
    assert abs(by["DEL"].length - del_len) < 0.3 * del_len
    assert abs(by["INS"].length - ins_len) < 0.3 * ins_len
