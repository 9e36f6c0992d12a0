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
