"""Index / seeding / chaining tests (host oracle path)."""

import numpy as np
import pytest

from lesv_tpu.config import ChainConfig, IndexConfig, SeedingConfig
from lesv_tpu.index.kmer_index import KmerIndex, kmer_hashes
from lesv_tpu.io.fasta import revcomp
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.ops.chain import extract_chains_np
from lesv_tpu.ops.seeding import collect_seed_matches, sampled_offsets
from lesv_tpu.sim import mutate_read, plant_svs, random_genome


def test_kmer_hashes_basic():
    codes = np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8)  # ACGTAC
    offs, h = kmer_hashes(codes, k=3)
    assert list(offs) == [0, 1, 2, 3]
    # ACG = 0<<4|1<<2|2 = 6
    assert h[0] == 6
    # ambiguous bases poison overlapping kmers
    codes[2] = 4
    _, h2 = kmer_hashes(codes, k=3)
    assert h2[0] == -1 and h2[1] == -1 and h2[2] == -1 and h2[3] >= 0


def test_sampled_offsets_pattern():
    cfg = SeedingConfig()
    offs = sampled_offsets(1300, k=15, window=10, cfg=cfg)
    # window 1: [0, 300): kmers at 0..280 step 10 -> 29
    # window 2: [500, 800): 29 more; window 3: [1000, 1300): 29 more
    assert len(offs) == 87
    assert offs[0] == 0 and offs[28] == 280 and offs[29] == 500
    # partial final window
    offs = sampled_offsets(1210, k=15, window=10, cfg=cfg)
    # third window [1000, 1210): m=210 -> (210-15)//10+1 = 20
    assert len(offs) == 29 + 29 + 20


def test_index_build_and_lookup(rng):
    genome = random_genome(rng, 20_000)
    store = SeqStore.from_records([("chr1", genome)])
    cfg = IndexConfig(kmer_size=13, kmer_window=1, max_kmer_occ=200)
    idx = KmerIndex.build(store, cfg)
    # every kmer of the genome must be findable at its own position
    offs, h = kmer_hashes(genome, 13, stride=997)
    found, start, count = idx.lookup_np(h)
    assert found.all()
    for o, s, c in zip(offs, start, count):
        assert o in idx.positions[s : s + c]


def test_index_occ_filter(rng):
    # genome with a heavy repeat: the repeated kmer must be dropped
    unit = rng.integers(0, 4, 16).astype(np.uint8)
    genome = np.concatenate([unit] * 50 + [rng.integers(0, 4, 5000).astype(np.uint8)])
    store = SeqStore.from_records([("chr1", genome)])
    idx = KmerIndex.build(store, IndexConfig(kmer_size=16, kmer_window=16, max_kmer_occ=10))
    _, h = kmer_hashes(unit, 16)
    found, _, _ = idx.lookup_np(h)
    assert not found[0]


def test_seed_matches_both_strands(rng):
    genome = random_genome(rng, 30_000)
    store = SeqStore.from_records([("chr1", genome)])
    idx = KmerIndex.build(store, IndexConfig(kmer_size=15, kmer_window=5))
    # forward read
    read = genome[4_000:7_000]
    m = collect_seed_matches(idx, read)
    qf, sf = m[0]
    assert len(qf) > 50
    # all matches colinear: soff - qoff == 4000
    assert (sf - qf == 4_000).mean() > 0.95
    # reverse-complement read: matches appear on the REV context
    m = collect_seed_matches(idx, revcomp(read))
    qr, sr = m[1]
    assert len(qr) > 50
    assert (sr - qr == 4_000).mean() > 0.95


def test_ddf_chain_locates_candidate_region(rng):
    """First-stage DDF chains are sparse by design (index stride x query
    stride); they only need to locate the candidate subject region
    (reference `find_candidate_subject_subseqs`)."""
    genome = random_genome(rng, 50_000)
    store = SeqStore.from_records([("chr1", genome)])
    idx = KmerIndex.build(store, IndexConfig(kmer_size=15, kmer_window=10))
    read = mutate_read(rng, genome[10_000:20_000], err=0.08)
    m = collect_seed_matches(idx, read)
    qo, so = m[0]
    chains = extract_chains_np(qo, so, length=15)
    assert chains, "no chain found on a clean read"
    # every reported chain sits on the true alignment diagonal
    for c in chains:
        assert 9_500 < c.sbeg - c.qbeg + 10_000 < 30_500
        # anchors are exact matches of the seed kmer
        for qoff, soff in c.anchors:
            assert np.array_equal(read[qoff : qoff + 15], genome[soff : soff + 15])


def test_pair_chain_full_read(rng):
    """Dense pairwise re-seeding chains the whole read in one candidate
    (reference memsc / InitHitFinder stage)."""
    from lesv_tpu.ops.pairseed import pair_chains

    genome = random_genome(rng, 50_000)
    read = mutate_read(rng, genome[10_000:20_000], err=0.1)
    chains = pair_chains(read, genome[8_000:22_000])
    assert chains
    best = chains[0]
    assert best.qbeg < 100 and best.qend > len(read) - 100
    assert abs(best.sbeg - 2_000) < 100 and abs(best.send - 12_000) < 100
    assert len(best.anchors) > 100


def test_pair_chain_join_spans_deletion(rng):
    """A read spanning a 3kb DEL must stay a single joined candidate
    (reference join_adjacent_chains, chain_dp.c:446-534)."""
    from lesv_tpu.ops.pairseed import pair_chains

    genome = random_genome(rng, 60_000)
    donor = np.concatenate([genome[:30_000], genome[33_000:]])  # 3kb DEL at 30k
    read = mutate_read(rng, donor[22_000:38_000], err=0.08)  # spans the DEL
    chains = pair_chains(read, genome[20_000:42_000])
    assert chains
    best = chains[0]
    # joined chain covers both sides of the deletion
    assert best.sbeg < 5_000 and best.send > 16_000
    # and the anchor diagonal jumps by ~3000 at the SV site
    diag = best.anchors[:, 1] - best.anchors[:, 0]
    assert diag.max() - diag.min() > 2_500
