"""Distributed pipeline: N simulated hosts must reproduce the single-host
calls exactly (determinism of the gathered-signature merge)."""

import numpy as np
import pytest

from lesv_tpu.config import LesvConfig
from lesv_tpu.parallel.dist import (
    LocalExchange,
    distributed_call,
    run_simulated,
    shard_strided,
)
from lesv_tpu.sim import plant_svs, random_genome, simulate_reads


pytestmark = pytest.mark.slow


def test_shard_strided():
    assert shard_strided(10, 0, 3) == [0, 3, 6, 9]
    assert shard_strided(10, 2, 3) == [2, 5, 8]
    all_ids = sorted(sum((shard_strided(10, h, 3) for h in range(3)), []))
    assert all_ids == list(range(10))


@pytest.mark.slow
def test_distributed_matches_single_host():
    rng = np.random.default_rng(77)
    genome = random_genome(rng, 80_000)
    donor, truth = plant_svs(rng, genome, n_del=1, n_ins=1,
                             min_len=150, max_len=300, margin=15_000,
                             min_gap=25_000)
    reads = simulate_reads(rng, donor, coverage=10.0, mean_len=8_000,
                           min_len=4_000, err=0.08)
    cfg = LesvConfig()
    cfg.cns.min_size = 1_000
    single = distributed_call([("chr1", genome)], reads, cfg,
                              exchange=LocalExchange())
    assert single, "single-host run produced no calls"

    multi = run_simulated(
        lambda ex: distributed_call([("chr1", genome)], reads, cfg,
                                    exchange=ex),
        n_hosts=2)
    # all hosts converge on the same call set
    for res in multi:
        assert len(res) == len(single)
        for a, b in zip(res, single):
            assert (a.kind, a.pos, a.length) == (b.kind, b.pos, b.length)
    # and the planted SVs are found
    for sv in truth.svs:
        assert any(c.kind == sv.kind and abs(c.pos - sv.ref_pos) < 1_000
                   for c in single)


def _world(seed=77, genome_size=120_000, coverage=8.0):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, genome_size)
    donor, truth = plant_svs(rng, genome, n_del=1, n_ins=1,
                             min_len=150, max_len=300, margin=12_000,
                             min_gap=20_000)
    reads = simulate_reads(rng, donor, coverage=coverage, mean_len=7_000,
                           min_len=4_000, err=0.08)
    cfg = LesvConfig()
    cfg.cns.min_size = 1_000
    return genome, reads, cfg, truth


def _vcf_bytes(calls, genome) -> bytes:
    import os
    import tempfile

    from lesv_tpu.io.seqstore import SeqStore
    from lesv_tpu.io.vcf import write_vcf

    sstore = SeqStore.from_records([("chr1", genome)])
    fd, path = tempfile.mkstemp(suffix=".vcf")
    os.close(fd)
    try:
        write_vcf(path, calls, sstore)
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


@pytest.mark.slow
@pytest.mark.parametrize("n_hosts", [2, 3, 5])
def test_distributed_vcf_byte_identical_across_n(n_hosts):
    """The final VCF must be BYTE-identical for any host count (the
    reference's `-grid` merge determinism, `app/map/main.c:35-41`) —
    including skewed shards (5 hosts over few reads)."""
    genome, reads, cfg, truth = _world()
    single = distributed_call([("chr1", genome)], reads, cfg,
                              exchange=LocalExchange())
    assert single
    ref_bytes = _vcf_bytes(single, genome)

    multi = run_simulated(
        lambda ex: distributed_call([("chr1", genome)], reads, cfg,
                                    exchange=ex),
        n_hosts=n_hosts)
    for res in multi:
        assert _vcf_bytes(res, genome) == ref_bytes


@pytest.mark.slow
def test_distributed_empty_shards():
    """More hosts than reads: some hosts map ZERO reads and contribute
    empty payloads; the merged result must still match single-host."""
    genome, reads, cfg, truth = _world(coverage=8.0)
    few = reads[:3]           # 5 hosts, 3 reads -> 2 empty shards
    single = distributed_call([("chr1", genome)], few, cfg,
                              exchange=LocalExchange())
    multi = run_simulated(
        lambda ex: distributed_call([("chr1", genome)], few, cfg,
                                    exchange=ex),
        n_hosts=5)
    ref_bytes = _vcf_bytes(single, genome)
    for res in multi:
        assert _vcf_bytes(res, genome) == ref_bytes


@pytest.mark.slow
def test_distributed_padded_exchange_path():
    """The JaxExchange length-prefix/padding codec (pad_to/unpad) carries
    real pipeline payloads of differing sizes without corruption."""
    from lesv_tpu.parallel.dist import PaddedSimExchange

    genome, reads, cfg, truth = _world(seed=5)
    single = distributed_call([("chr1", genome)], reads, cfg,
                              exchange=LocalExchange())
    ref_bytes = _vcf_bytes(single, genome)

    def fn(ex):
        return distributed_call([("chr1", genome)], reads, cfg,
                                exchange=PaddedSimExchange(ex))

    multi = run_simulated(fn, n_hosts=3)
    for res in multi:
        assert _vcf_bytes(res, genome) == ref_bytes


def test_padded_exchange_codec_roundtrip():
    """pad_to/unpad round-trips ragged payloads exactly."""
    from lesv_tpu.parallel.dist import JaxExchange

    payloads = [b"x" * 5, b"", b"hello world" * 100, b"\x00\xff" * 7]
    lens = np.array([len(p) for p in payloads], np.int64)
    maxlen = int(lens.max())
    stack = np.stack([JaxExchange.pad_to(p, maxlen) for p in payloads])
    back = JaxExchange.unpad(stack, lens, len(payloads))
    assert back == payloads


def test_distributed_with_mesh_per_host():
    """mesh x dist composition — the production topology: every host
    runs its shard of distributed_call with a device mesh active (fills
    shard over the host's chips via shard_map) while signatures merge
    across hosts (`app/map/main.c:35-55`).  VCF must equal the meshless
    single-host run byte for byte."""
    from lesv_tpu.parallel.mesh import make_mesh, use_mesh

    rng = np.random.default_rng(99)
    genome = random_genome(rng, 80_000)
    donor, truth = plant_svs(rng, genome, n_del=1, n_ins=1,
                             min_len=150, max_len=300, margin=15_000,
                             min_gap=25_000)
    reads = simulate_reads(rng, donor, coverage=10.0, mean_len=8_000,
                           min_len=4_000, err=0.08)
    cfg = LesvConfig()
    cfg.cns.min_size = 1_000
    cfg.map.engine = "device"
    single = distributed_call([("chr1", genome)], reads, cfg,
                              exchange=LocalExchange())
    assert single

    mesh = make_mesh(4)      # each simulated host drives a 4-chip mesh

    def host_fn(ex):
        with use_mesh(mesh):
            return distributed_call([("chr1", genome)], reads, cfg,
                                    exchange=ex)

    multi = run_simulated(host_fn, n_hosts=2)
    for res in multi:
        assert len(res) == len(single)
        for a, b in zip(res, single):
            assert (a.kind, a.pos, a.length, a.genotype) == \
                (b.kind, b.pos, b.length, b.genotype)
