"""Device seeding + chain DP vs the host oracles."""

from __future__ import annotations

import numpy as np
import pytest

from lesv_tpu.config import ChainConfig, IndexConfig, SeedingConfig
from lesv_tpu.index.kmer_index import KmerIndex
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.ops.chain import extract_chains_np
from lesv_tpu.ops.seeding import collect_seed_matches, sampled_offsets
from lesv_tpu.sim import mutate_read, random_genome


def test_sampled_offsets_static_matches_host():
    from lesv_tpu.ops.seeding_jax import sampled_offsets_static

    cfg = SeedingConfig()
    for k, w in ((15, 10), (19, 20), (12, 7)):
        Qmax = 4096
        offs = sampled_offsets_static(Qmax, k, w, cfg)
        for n in (Qmax, 4000, 1234, 700, 512, 300, 299, 100, k, k - 1):
            host = sampled_offsets(n, k, w, cfg)
            dev = offs[offs + k <= n]
            np.testing.assert_array_equal(np.asarray(host), dev,
                                          err_msg=f"k={k} w={w} n={n}")


@pytest.mark.parametrize("k,w", [(15, 10), (19, 20)])
def test_seed_matches_batch_equals_host(k, w):
    from lesv_tpu.ops.seeding_jax import seed_matches_batch

    rng = np.random.default_rng(3)
    genome = random_genome(rng, 30_000)
    store = SeqStore.from_records([("chr1", genome)])
    index = KmerIndex.build(store, IndexConfig(kmer_size=k, kmer_window=w))
    cfg = SeedingConfig()
    reads = []
    for i in range(5):
        start = int(rng.integers(0, 25_000))
        frag = genome[start : start + int(rng.integers(800, 4000))]
        reads.append(mutate_read(rng, frag, err=0.08))
    # one read with ambiguous bases
    amb = reads[0].copy()
    amb[50:80] = 4
    reads.append(amb)

    qoff, soff, valid, total = seed_matches_batch(reads, index, cfg)
    qoff, soff, valid = map(np.asarray, (qoff, soff, valid))
    for i, r in enumerate(reads):
        host = collect_seed_matches(index, r, cfg)
        for d in (0, 1):
            lane = 2 * i + d
            got = set(zip(qoff[lane][valid[lane]].tolist(),
                          soff[lane][valid[lane]].astype(np.int64).tolist()))
            want = set(zip(host[d][0].tolist(), host[d][1].tolist()))
            assert got == want, f"read {i} dir {d}: {len(got)} vs {len(want)}"


def test_chain_lanes_equals_host_oracle():
    from lesv_tpu.ops.chain_jax import chain_lanes

    rng = np.random.default_rng(7)
    cfg = ChainConfig()
    L = 15
    lanes_q, lanes_s = [], []
    for _ in range(6):
        # a colinear chain with noise, plus an SV-style split
        n1 = int(rng.integers(5, 40))
        q1 = np.sort(rng.choice(3000, n1, replace=False)).astype(np.int64)
        s1 = q1 + 100 + rng.integers(-20, 20, n1)
        # random noise seeds
        nz = int(rng.integers(0, 30))
        qz = rng.integers(0, 3000, nz)
        sz = rng.integers(0, 100_000, nz)
        lanes_q.append(np.concatenate([q1, qz]))
        lanes_s.append(np.concatenate([np.maximum(s1, 0), sz]))

    M = 64
    B = len(lanes_q)
    qoff = np.full((B, M), 0x7FFFFFFF, np.int32)
    soff = np.full((B, M), 0xFFFFFFFF, np.uint32)
    valid = np.zeros((B, M), bool)
    for b in range(B):
        n = len(lanes_q[b])
        qoff[b, :n] = lanes_q[b]
        soff[b, :n] = lanes_s[b]
        valid[b, :n] = True

    import jax.numpy as jnp

    got = chain_lanes(jnp.asarray(qoff), jnp.asarray(soff),
                      jnp.asarray(valid), L, cfg, J=M)
    for b in range(B):
        want = extract_chains_np(lanes_q[b], lanes_s[b], L, cfg)
        assert len(got[b]) == len(want), f"lane {b}"
        for cg, cw in zip(got[b], want):
            assert (cg.score, cg.qbeg, cg.qend, cg.sbeg, cg.send) == \
                   (cw.score, cw.qbeg, cw.qend, cw.sbeg, cw.send)
            np.testing.assert_array_equal(cg.anchors, cw.anchors)


def test_chain_lanes_sv_spanning_join():
    """The SV-preserving chain join must survive the device path."""
    from lesv_tpu.ops.chain_jax import chain_lanes

    L = 15
    # two colinear runs separated by a 5kb deletion-style subject gap
    q1 = np.arange(0, 2000, 40, dtype=np.int64)
    s1 = q1 + 500
    q2 = np.arange(2100, 4100, 40, dtype=np.int64)
    s2 = q2 + 500 + 5000
    q = np.concatenate([q1, q2])
    s = np.concatenate([s1, s2])
    M = 128
    qoff = np.full((1, M), 0x7FFFFFFF, np.int32)
    soff = np.full((1, M), 0xFFFFFFFF, np.uint32)
    valid = np.zeros((1, M), bool)
    qoff[0, : len(q)] = q
    soff[0, : len(s)] = s
    valid[0, : len(q)] = True

    import jax.numpy as jnp

    got = chain_lanes(jnp.asarray(qoff), jnp.asarray(soff),
                      jnp.asarray(valid), L, ChainConfig(), J=M)[0]
    want = extract_chains_np(q, s, L, ChainConfig())
    assert len(got) == len(want) == 1   # joined into one SV-spanning chain
    assert got[0].qbeg == want[0].qbeg and got[0].send == want[0].send


def test_pair_matches_batch_equals_host():
    from lesv_tpu.ops.pairseed import pair_seeds
    from lesv_tpu.ops.pairseed_jax import pair_matches_batch

    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(4):
        s = random_genome(rng, int(rng.integers(2000, 6000)))
        start = int(rng.integers(0, len(s) - 1500))
        q = mutate_read(rng, s[start : start + 1400], err=0.1)
        pairs.append((q, s))
    # ambiguous-base case
    q0, s0 = pairs[0]
    q0 = q0.copy()
    q0[100:140] = 4
    pairs.append((q0, s0))

    qoff, soff, valid, total = pair_matches_batch(pairs)
    for i, (q, s) in enumerate(pairs):
        want_q, want_s = pair_seeds(q, s, k=10, q_stride=10, max_occ=8)
        got = set(zip(qoff[i][valid[i]].tolist(),
                      soff[i][valid[i]].astype(np.int64).tolist()))
        want = set(zip(want_q.tolist(), want_s.tolist()))
        assert got == want, f"pair {i}: {len(got)} vs {len(want)}"


def test_map_batch_device_equals_host_engine():
    """The device mapper engine must emit the same M4 set as the host
    oracle engine on a clean simulated case."""
    import dataclasses

    from lesv_tpu.config import LesvConfig
    from lesv_tpu.pipeline.mapper import map_all

    rng = np.random.default_rng(21)
    genome = random_genome(rng, 60_000)
    store = SeqStore.from_records([("chr1", genome)])
    cfg_d = LesvConfig()
    cfg_d.map.engine = "device"
    cfg_h = LesvConfig()
    cfg_h.map.engine = "host"
    index = KmerIndex.build(store, cfg_d.index)
    reads = []
    for i in range(6):
        start = int(rng.integers(0, 50_000))
        frag = genome[start : start + int(rng.integers(3000, 9000))]
        reads.append((f"r{i}", mutate_read(rng, frag, err=0.08)))

    m4_d, _ = map_all(reads, store, index, cfg_d)
    m4_h, _ = map_all(reads, store, index, cfg_h)
    key = lambda m: (m.qid, m.qdir, m.qoff, m.qend, m.soff, m.send, m.score)
    assert sorted(map(key, m4_d)) == sorted(map(key, m4_h))


def test_chain_scan_pallas_equals_xla_scan():
    """The Pallas chain-DP kernel (interpret mode on CPU) must match the
    XLA lax.scan kernel bit for bit on (f, p_rel, v), including
    genome-scale u32 subject offsets and the first-max tie rule."""
    import jax.numpy as jnp

    from lesv_tpu.ops.chain_jax import _chain_scan_kernel, sort_seeds_device
    from lesv_tpu.ops.chain_pallas import chain_scan_pallas

    rng = np.random.default_rng(3)
    B, M, J = 8, 512, 64
    qoff = np.zeros((B, M), np.int32)
    soff = np.zeros((B, M), np.uint32)
    valid = np.zeros((B, M), bool)
    for b in range(B):
        n = int(rng.integers(40, M))
        base = rng.integers(0, 3_000_000_000, dtype=np.uint64)
        q = np.sort(rng.integers(0, 20_000, n)).astype(np.int32)
        s = (base + q.astype(np.uint64)
             + rng.integers(0, 1600, n).astype(np.uint64))
        noise = rng.random(n) < 0.2
        s[noise] = base + rng.integers(0, 40_000, int(noise.sum()))
        qoff[b, :n] = q
        soff[b, :n] = s.astype(np.uint32)
        valid[b, :n] = True

    qs, ss, vs = sort_seeds_device(jnp.asarray(qoff), jnp.asarray(soff),
                                   jnp.asarray(valid))
    args = dict(J=J, length=15, max_dq=5000, max_dr=5000, bw=1500)
    f1, p1, v1 = _chain_scan_kernel(qs, ss, vs, **args)
    f2, p2, v2 = chain_scan_pallas(qs, ss, vs, interpret=True, **args)
    vs_np = np.asarray(vs)
    for a, b_ in ((f1, f2), (p1, p2), (v1, v2)):
        assert (np.asarray(a) == np.asarray(b_))[vs_np].all()
