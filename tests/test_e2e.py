"""End-to-end acceptance test: planted SVs must be recovered as VCF calls
(the CPU-runnable analogue of the reference's chr21 truvari walkthrough,
`install_lesv.md:243-349`; BASELINE.json config #1)."""

import numpy as np
import pytest

from lesv_tpu.config import LesvConfig
from lesv_tpu.pipeline.driver import run_pipeline
from lesv_tpu.sim import plant_svs, random_genome, simulate_reads


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def e2e():
    rng = np.random.default_rng(1234)
    genome = random_genome(rng, 120_000)
    donor, truth = plant_svs(rng, genome, n_del=2, n_ins=2,
                             min_len=80, max_len=400, margin=15_000,
                             min_gap=20_000)
    reads = simulate_reads(rng, donor, coverage=14.0, mean_len=10_000,
                           min_len=4_000, err=0.08)
    cfg = LesvConfig()
    cfg.cns.min_size = 1_000  # short synthetic reads
    res = run_pipeline([("chr1", genome)], reads, cfg)
    return truth, res


def test_all_planted_svs_called(e2e):
    truth, res = e2e
    for sv in truth.svs:
        near = [c for c in res.calls
                if c.kind == sv.kind and abs(c.pos - sv.ref_pos) <= 1_000
                and abs(c.length - sv.length) <= 0.25 * sv.length]
        assert near, (
            f"{sv.kind}@{sv.ref_pos} len={sv.length} missing; "
            f"calls={[(c.kind, c.pos, c.length) for c in res.calls]}")


def test_no_false_positives(e2e):
    truth, res = e2e
    false = [c for c in res.calls
             if all(abs(c.pos - sv.ref_pos) > 1_000 for sv in truth.svs)]
    assert not false, [(c.kind, c.pos, c.length, c.support) for c in false]


def test_call_positions_precise(e2e):
    truth, res = e2e
    # consensus-corrected calls should land much tighter than truvari's
    # 1000bp tolerance
    for sv in truth.svs:
        near = [c for c in res.calls
                if c.kind == sv.kind and abs(c.pos - sv.ref_pos) <= 1_000]
        assert near
        best = min(near, key=lambda c: abs(c.pos - sv.ref_pos))
        assert abs(best.pos - sv.ref_pos) <= 50
        assert abs(best.length - sv.length) <= max(10, 0.1 * sv.length)


def test_vcf_emission(e2e, tmp_path):
    truth, res = e2e
    from lesv_tpu.io.seqstore import SeqStore
    from lesv_tpu.io.vcf import write_vcf
    from lesv_tpu.sim import random_genome as _rg

    # re-create a store with matching names for emission only
    rng = np.random.default_rng(1234)
    genome = _rg(rng, 120_000)
    store = SeqStore.from_records([("chr1", genome)])
    path = tmp_path / "out.vcf"
    write_vcf(str(path), res.calls, store)
    text = path.read_text()
    assert text.startswith("##fileformat=VCFv4.2")
    assert text.count("SVTYPE=") == len(res.calls)
    # REF/ALT sequences are consistent with the genome
    for line in text.splitlines():
        if line.startswith("#"):
            continue
        chrom, pos, _id, ref, alt = line.split("\t")[:5]
        p = int(pos) - 1
        from lesv_tpu.io.fasta import decode_seq
        assert decode_seq(genome[p : p + len(ref)]) == ref


def test_heterozygous_svs():
    """Het SVs: reads drawn 50/50 from the SV haplotype and the
    reference haplotype.  The events must still be called (about half
    the coverage supports them) and genotyped 0/1, while a homozygous
    control event on both haplotypes genotypes 1/1."""
    rng = np.random.default_rng(77)
    genome = random_genome(rng, 150_000)
    het_del_pos, het_ins_pos, hom_del_pos = 35_000, 75_000, 115_000
    het_del_len, het_ins_len, hom_del_len = 300, 260, 280
    ins_seq = rng.integers(0, 4, het_ins_len).astype(np.uint8)

    def apply_svs(g, dels, ins):
        pieces = []
        prev = 0
        events = sorted([(p, "DEL", L) for p, L in dels]
                        + [(p, "INS", L) for p, L in ins])
        for p, kind, L in events:
            pieces.append(g[prev:p])
            if kind == "DEL":
                prev = p + L
            else:
                pieces.append(ins_seq)
                prev = p
        pieces.append(g[prev:])
        return np.concatenate(pieces)

    hap_sv = apply_svs(genome,
                       [(het_del_pos, het_del_len),
                        (hom_del_pos, hom_del_len)],
                       [(het_ins_pos, het_ins_len)])
    hap_ref = apply_svs(genome, [(hom_del_pos, hom_del_len)], [])
    reads = (simulate_reads(rng, hap_sv, coverage=9, mean_len=10_000,
                            min_len=4_000, err=0.08)
             + simulate_reads(rng, hap_ref, coverage=9, mean_len=10_000,
                              min_len=4_000, err=0.08))
    cfg = LesvConfig()
    cfg.cns.min_size = 1_000
    res = run_pipeline([("chr1", genome)], reads, cfg)

    def call_at(kind, pos, length):
        near = [c for c in res.calls
                if c.kind == kind and abs(c.pos - pos) <= 1_000
                and abs(c.length - length) <= 0.25 * length]
        assert near, (kind, pos, [(c.kind, c.pos, c.length)
                                  for c in res.calls])
        return min(near, key=lambda c: abs(c.pos - pos))

    het_del = call_at("DEL", het_del_pos, het_del_len)
    het_ins = call_at("INS", het_ins_pos, het_ins_len)
    hom_del = call_at("DEL", hom_del_pos, hom_del_len)
    assert het_del.genotype == "0/1", het_del
    assert het_ins.genotype == "0/1", het_ins
    assert hom_del.genotype == "1/1", hom_del
