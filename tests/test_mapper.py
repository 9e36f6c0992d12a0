"""End-to-end mapper tests on a synthetic genome (BASELINE config #1 scale)."""

import numpy as np
import pytest

from lesv_tpu.config import LesvConfig
from lesv_tpu.index.kmer_index import KmerIndex
from lesv_tpu.io.fasta import revcomp
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.pipeline.mapper import map_all, map_read
from lesv_tpu.sim import mutate_read, plant_svs, random_genome


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(42)
    genome = random_genome(rng, 120_000)
    store = SeqStore.from_records([("chr1", genome)])
    cfg = LesvConfig()
    idx = KmerIndex.build(store, cfg.index)
    return rng, genome, store, idx, cfg


def test_map_fwd_read(world):
    rng, genome, store, idx, cfg = world
    read = mutate_read(rng, genome[20_000:35_000], err=0.1)
    m4s = map_read(0, read, store, idx, cfg)
    assert m4s
    best = m4s[0]
    assert best.qdir == 0
    assert abs(best.soff - 20_000) < 100 and abs(best.send - 35_000) < 100
    assert best.qoff < 100 and best.qend > len(read) - 100
    assert best.ident_perc > 85.0


def test_map_rev_read(world):
    rng, genome, store, idx, cfg = world
    read = revcomp(mutate_read(rng, genome[50_000:62_000], err=0.1))
    m4s = map_read(0, read, store, idx, cfg)
    assert m4s
    best = m4s[0]
    assert best.qdir == 1
    assert abs(best.soff - 50_000) < 100 and abs(best.send - 62_000) < 100
    assert best.ident_perc > 85.0


def test_map_read_spanning_sv(world):
    rng, genome, store, idx, cfg = world
    # 800bp deletion at 70k
    donor = np.concatenate([genome[:70_000], genome[70_800:]])
    read = mutate_read(rng, donor[64_000:78_000], err=0.1)
    m4s = map_read(0, read, store, idx, cfg)
    assert m4s
    best = m4s[0]
    # single HSP spanning the deletion
    assert best.soff < 65_000 and best.send > 77_500
    from lesv_tpu.ops.cigar import scan_indel_signatures

    sigs = scan_indel_signatures(best.ops, best.qoff, best.soff, min_size=40)
    dels = [t for t in sigs if t[0] == "DEL"]
    assert len(dels) == 1
    assert abs(dels[0][2] - 70_000) < 60 and abs(dels[0][3] - 800) < 80


def test_map_unmappable_read(world):
    rng, genome, store, idx, cfg = world
    junk = rng.integers(0, 4, 5_000).astype(np.uint8)
    m4s = map_read(0, junk, store, idx, cfg)
    assert m4s == []


def test_map_all_batch_checkpoints(tmp_path):
    """map_all with ckpt_dir resumes after completed batches (the
    reference's per-(qvol,svol) merge-on-resume, app/map/main.c:43-58)."""
    import dataclasses
    import os

    rng = np.random.default_rng(9)
    genome = random_genome(rng, 50_000)
    store = SeqStore.from_records([("chr1", genome)])
    cfg = LesvConfig()
    cfg.map.engine = "host"
    cfg.map.batch_reads = 2
    index = KmerIndex.build(store, cfg.index)
    reads = []
    for i in range(6):
        start = int(rng.integers(0, 40_000))
        frag = genome[start : start + int(rng.integers(3000, 8000))]
        reads.append((f"r{i}", mutate_read(rng, frag, err=0.05)))
    ck = str(tmp_path / "parts")
    m4s1, _ = map_all(reads, store, index, cfg, ckpt_dir=ck)
    parts = sorted(os.listdir(ck))
    assert len(parts) == 3
    # drop the last part: resume recomputes only that batch
    os.remove(os.path.join(ck, parts[-1]))
    m4s2, _ = map_all(reads, store, index, cfg, ckpt_dir=ck)
    key = lambda m: (m.qid, m.qdir, m.qoff, m.qend, m.soff, m.send, m.score)
    assert sorted(map(key, m4s1)) == sorted(map(key, m4s2))


def test_ultra_long_read_split_and_map():
    """A 120kb read splits into <=50kb subreads (name_from_to) that each
    map back to their own genome segment — the reference's ultra-long
    handling (MAX_SUBSEQ_SIZE, app/split_seq/main.c:28-45) feeding the
    k=19/w=20 preset (README.md:149-172)."""
    from lesv_tpu.io.seqstore import split_subreads

    rng = np.random.default_rng(5)
    genome = random_genome(rng, 200_000)
    cfg = LesvConfig.ultra_long()
    store = SeqStore.from_records([("chr1", genome)])
    index = KmerIndex.build(store, cfg.index)
    frag = genome[30_000:150_000]
    read = mutate_read(rng, frag, err=0.08)
    split = list(split_subreads([("ul0", read)], cfg.split))
    assert len(split) == 3
    assert all(len(s) <= 50_000 for _, s in split)
    m4s, qstore = map_all(split, store, index, cfg)
    mapped = {m.qid for m in m4s}
    assert mapped == {0, 1, 2}, (mapped, [(m.qid, m.soff, m.send)
                                          for m in m4s])
    # subreads land in order on the genome
    spans = sorted((min(m.soff for m in m4s if m.qid == q),
                    max(m.send for m in m4s if m.qid == q))
                   for q in range(3))
    assert spans[0][0] < spans[1][0] < spans[2][0]
    assert 25_000 < spans[0][0] < 35_000
    assert 145_000 < spans[2][1] < 155_000


def test_map_all_volumes_matches_single_volume(tmp_path):
    """The subject-volume loop (map_all_volumes) produces the same M4 set
    as a single monolithic index (reference `app/map/main.c:40-70`:
    per-volume mapping merged by file concatenation), and resumes from
    per-(volume, batch) checkpoints."""
    import os

    from lesv_tpu.pipeline.mapper import map_all_volumes, subject_volumes

    rng = np.random.default_rng(11)
    chroms = [(f"chr{i}", random_genome(rng, 30_000)) for i in range(4)]
    store = SeqStore.from_records(chroms)
    cfg = LesvConfig()
    cfg.map.engine = "host"
    reads = []
    for i in range(8):
        ci = int(rng.integers(0, 4))
        start = int(rng.integers(0, 20_000))
        frag = chroms[ci][1][start : start + int(rng.integers(4000, 9000))]
        reads.append((f"r{i}", mutate_read(rng, frag, err=0.05)))

    index = KmerIndex.build(store, cfg.index)
    mono, _ = map_all(reads, store, index, cfg)

    cfg.map.max_subject_vol_res = 65_000   # -> 2 volumes of 2 chroms
    assert subject_volumes(store, 65_000) == [(0, 2), (2, 4)]
    ck = str(tmp_path / "vparts")
    vols, _ = map_all_volumes(reads, store, cfg, ckpt_dir=ck)

    key = lambda m: (m.qid, m.qdir, m.sid, m.qoff, m.qend, m.soff, m.send,
                     m.score)
    assert sorted(map(key, mono)) == sorted(map(key, vols))
    # ssize must be the true per-subject size, not a volume artifact
    assert all(m.ssize == store.seq_size(m.sid) for m in vols)

    # resume: drop one volume-1 part, rerun -> identical output
    parts = sorted(p for p in os.listdir(ck) if p.startswith("map_v001"))
    assert parts
    os.remove(os.path.join(ck, parts[0]))
    vols2, _ = map_all_volumes(reads, store, cfg, ckpt_dir=ck)
    assert sorted(map(key, vols)) == sorted(map(key, vols2))


def test_volume_index_local_positions():
    """A sid_range index has volume-local positions/subject_starts
    (bounds the uint32 position space to the volume size)."""
    rng = np.random.default_rng(3)
    chroms = [(f"c{i}", random_genome(rng, 10_000)) for i in range(3)]
    store = SeqStore.from_records(chroms)
    cfg = LesvConfig()
    idx = KmerIndex.build(store, cfg.index, sid_range=(1, 3))
    assert idx.subject_starts[0] == 0
    assert int(idx.subject_starts[-1]) == 20_000
    assert idx.num_positions > 0
    assert int(idx.positions.max()) < 20_000
    # positions agree with a from-scratch store over the same subjects
    solo = KmerIndex.build(SeqStore.from_records(chroms[1:]), cfg.index)
    assert np.array_equal(idx.uniq_hash, solo.uniq_hash)
    assert np.array_equal(idx.positions, solo.positions)


def test_query_volume_striding_and_threads():
    """-max_query_vol_res partitions queries into volumes (the resume /
    grid-striding unit, app/map/main.c:35-55) and -num_threads reaches
    the host pools — neither flag may be silently inert."""
    import dataclasses

    from lesv_tpu.ops import align_batch
    from lesv_tpu.pipeline.mapper import map_all, query_volumes

    assert query_volumes([100, 200, 300, 50], 300) == [[0, 1], [2], [3]]
    # a single huge volume holds everything
    assert query_volumes([100, 200], 10**9) == [[0, 1]]

    # M4 output is volume-partitioning-invariant
    rng = np.random.default_rng(3)
    genome = random_genome(rng, 50_000)
    store = SeqStore.from_records([("chr1", genome)])
    cfg = LesvConfig()
    cfg.map.engine = "host"
    index = KmerIndex.build(store, cfg.index)
    reads = []
    for i in range(5):
        st = int(rng.integers(0, 40_000))
        reads.append((f"r{i}", mutate_read(
            rng, genome[st : st + 4000], err=0.08)))
    m4_a, _ = map_all(reads, store, index, cfg)
    cfg2 = LesvConfig()
    cfg2.map.engine = "host"
    cfg2.map.max_query_vol_res = 4_500       # ~1 read per volume
    m4_b, _ = map_all(reads, store, index, cfg2)
    key = lambda m: (m.qid, m.qdir, m.qoff, m.qend, m.soff, m.send,
                     m.score)
    assert sorted(map(key, m4_a)) == sorted(map(key, m4_b))

    # num_threads plumbs into the pools
    align_batch.set_num_threads(3)
    try:
        assert align_batch._n_host_workers() == 3
        assert align_batch._n_dispatch_workers(on_cpu=False) == 3
    finally:
        align_batch.set_num_threads(0)


def test_dist_volume_striding():
    """distributed_call strides query volumes when there are enough,
    reads otherwise — VCF identical either way (sharding invariance)."""
    from lesv_tpu.pipeline.mapper import query_volumes

    sizes = [1000] * 7
    vols = query_volumes(sizes, 2000)
    assert len(vols) == 4 and vols[0] == [0, 1]
