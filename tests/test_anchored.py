"""Anchored-alignment engine tests: stitching, extension, trimming,
identity metrics, signature scan."""

import numpy as np
import pytest

from lesv_tpu.config import AlignConfig, IndexConfig
from lesv_tpu.index.kmer_index import KmerIndex
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.ops.align_np import OP_D, OP_I, OP_M
from lesv_tpu.ops.anchored import anchored_extend, sanitize_anchors
from lesv_tpu.ops.chain import extract_chains_np
from lesv_tpu.ops.cigar import (
    effective_ident_perc,
    ident_perc,
    scan_indel_signatures,
)
from lesv_tpu.ops.seeding import collect_seed_matches
from lesv_tpu.sim import mutate_read, random_genome


def _map_one(rng, genome, read, k=15, w=10):
    store = SeqStore.from_records([("chr1", genome)])
    idx = KmerIndex.build(store, IndexConfig(kmer_size=k, kmer_window=w))
    m = collect_seed_matches(idx, read)
    qo, so = m[0]
    chains = extract_chains_np(qo, so, length=k)
    assert chains
    return chains[0]


def test_sanitize_anchors_merges_diagonal_runs():
    anchors = np.array([[0, 100], [10, 110], [20, 120], [30, 131]])
    runs = sanitize_anchors(anchors, k=15)
    # first three on one diagonal merge into a 35-long run;
    # the 4th (diag 101) overlaps the run (30 < 35) -> dropped
    assert runs[0].tolist() == [0, 100, 35]
    assert len(runs) == 1
    anchors = np.array([[0, 100], [60, 161]])
    runs = sanitize_anchors(anchors, k=15)
    assert len(runs) == 2


def test_anchored_extend_clean(rng):
    genome = random_genome(rng, 40_000)
    read = mutate_read(rng, genome[5_000:15_000], err=0.1)
    c = _map_one(rng, genome, read)
    aln = anchored_extend(read, genome, c.anchors, k=15)
    assert aln is not None
    aln.validate(read, genome)
    assert aln.qb < 100 and aln.qe > len(read) - 100
    assert abs(aln.sb - 5_000) < 100 and abs(aln.se - 15_000) < 100
    pid = ident_perc(aln.ops, read, genome, aln.qb, aln.sb)
    assert pid > 85.0
    # no spurious large indels on an SV-free read
    sigs = scan_indel_signatures(aln.ops, aln.qb, aln.sb, min_size=40)
    assert sigs == []


def test_anchored_extend_with_deletion(rng):
    genome = random_genome(rng, 60_000)
    donor = np.concatenate([genome[:30_000], genome[30_400:]])  # 400bp DEL
    read = mutate_read(rng, donor[24_000:36_000], err=0.1)
    c = _map_one(rng, genome, read)
    aln = anchored_extend(read, genome, c.anchors, k=15)
    assert aln is not None
    aln.validate(read, genome)
    sigs = scan_indel_signatures(aln.ops, aln.qb, aln.sb, min_size=40)
    dels = [t for t in sigs if t[0] == "DEL"]
    assert len(dels) == 1
    kind, qpos, spos, length = dels[0]
    assert abs(spos - 30_000) < 60
    assert abs(length - 400) < 60
    # effective identity ignores the SV gap
    eff = effective_ident_perc(aln.ops, read, genome, aln.qb, aln.sb)
    raw = ident_perc(aln.ops, read, genome, aln.qb, aln.sb)
    assert eff > raw
    assert eff > 85.0


def test_anchored_extend_with_insertion(rng):
    genome = random_genome(rng, 60_000)
    ins = rng.integers(0, 4, 300).astype(np.uint8)
    donor = np.concatenate([genome[:30_000], ins, genome[30_000:]])
    read = mutate_read(rng, donor[24_000:36_300], err=0.1)
    c = _map_one(rng, genome, read)
    aln = anchored_extend(read, genome, c.anchors, k=15)
    assert aln is not None
    sigs = scan_indel_signatures(aln.ops, aln.qb, aln.sb, min_size=40)
    inss = [t for t in sigs if t[0] == "INS"]
    assert len(inss) == 1
    _, qpos, spos, length = inss[0]
    assert abs(spos - 30_000) < 60
    assert abs(length - 300) < 60


def test_trim_ends_are_exact_matches(rng):
    genome = random_genome(rng, 30_000)
    read = mutate_read(rng, genome[5_000:12_000], err=0.12)
    c = _map_one(rng, genome, read)
    aln = anchored_extend(read, genome, c.anchors, k=15)
    assert aln is not None
    # both ends: 8 exact-match M columns (reference kMatLen invariant)
    assert (aln.ops[:8] == OP_M).all() and (aln.ops[-8:] == OP_M).all()
    assert np.array_equal(read[aln.qb : aln.qb + 8], genome[aln.sb : aln.sb + 8])
    assert np.array_equal(read[aln.qe - 8 : aln.qe], genome[aln.se - 8 : aln.se])
