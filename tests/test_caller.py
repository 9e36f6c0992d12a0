"""Caller contract tests: the pbsv-facing semantics of the native caller.

The reference's final stage is `pbsv discover -l 20` + `pbsv call
-t INS,DEL --max-ins-length 30k` (`x_hqx2callsv.sh:91,110-122`); pbsv
itself is not in this environment, so the caller's contract with those
documented flags is pinned here instead: signature minimum length,
INS-length cap, DEL/INS-only output, distance clustering with
length-dissimilarity splits, one-vote-per-read support, min support,
depth-fraction gate, and allele-fraction genotyping."""

import numpy as np
import pytest

from lesv_tpu.config import LesvConfig
from lesv_tpu.io.seqstore import SeqStore
from lesv_tpu.pipeline.caller import call_svs, discover_events
from lesv_tpu.pipeline.remap import RemapResult


def _read(name, pos, ops, seq_len=None, sid=0, gid=0):
    ops = np.asarray(ops, np.uint8)
    n_q = int((ops != 2).sum())
    n_s = int((ops != 1).sum())
    return RemapResult(
        name=name, global_id=0, rev=False, subject_id=sid, pos=pos,
        end=pos + n_s, ops=ops, seq=np.zeros(n_q, np.uint8),
        ident_perc=99.0, eff_ident_perc=99.0, group_id=gid, kind="DEL")


def _ops(m1, d=0, i=0, m2=400):
    return np.concatenate([np.full(m1, 0, np.uint8),
                           np.full(d, 2, np.uint8),
                           np.full(i, 1, np.uint8),
                           np.full(m2, 0, np.uint8)])


@pytest.fixture
def world():
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 60_000, dtype=np.uint8)
    sstore = SeqStore.from_records([("chr1", genome)])
    return sstore


def test_discover_min_sig_len_is_pbsv_l20(world):
    """`pbsv discover -l 20`: indels below 20bp are not signatures."""
    cfg = LesvConfig()
    r_small = _read("a", 1000, _ops(200, d=19))
    r_big = _read("b", 1000, _ops(200, d=20))
    evs = discover_events([r_small, r_big], cfg)
    assert [(e.kind, e.length) for e in evs] == [("DEL", 20)]


def test_discover_max_ins_length_cap(world):
    """`pbsv call --max-ins-length 30k`: longer insertions dropped."""
    cfg = LesvConfig()
    r_ok = _read("a", 1000, _ops(200, i=29_999))
    r_over = _read("b", 1000, _ops(200, i=30_001))
    evs = discover_events([r_ok, r_over], cfg)
    assert [(e.kind, e.length) for e in evs] == [("INS", 29_999)]


def test_call_min_support_and_votes_per_read(world):
    """pbsv-style support: one vote per READ; clusters below
    min_support produce no call."""
    cfg = LesvConfig()
    # 3 distinct reads at one DEL -> call; one read with two events of
    # the same cluster counts once
    rs = [_read(f"r{i}", 5000, _ops(100, d=60)) for i in range(3)]
    rs.append(_read("r0", 5000, _ops(100, d=60)))
    spans = [(0, 0, 60_000)] * 10
    calls = call_svs(rs, world, cfg, raw_spans=spans)
    assert len(calls) == 1 and calls[0].support == 3
    calls2 = call_svs(rs[:2], world, cfg, raw_spans=spans)
    assert calls2 == []


def test_cluster_distance_and_length_split(world):
    """Events further apart than cluster_dist (or with dissimilar
    lengths) form separate calls — pbsv's signature clustering shape."""
    cfg = LesvConfig()
    spans = [(0, 0, 60_000)] * 10
    near = [_read(f"a{i}", 5000 + i, _ops(100, d=60)) for i in range(3)]
    far = [_read(f"b{i}", 5000 + cfg.call.cluster_dist + 2000 + i,
                 _ops(100, d=60)) for i in range(3)]
    calls = call_svs(near + far, world, cfg, raw_spans=spans)
    assert len(calls) == 2
    # same position, wildly different lengths -> two clusters (only one
    # reaches min_support)
    mixed = ([_read(f"c{i}", 9000, _ops(100, d=60)) for i in range(3)]
             + [_read(f"d{i}", 9000, _ops(100, d=1500)) for i in range(3)])
    calls = call_svs(mixed, world, cfg, raw_spans=spans)
    assert sorted(c.length for c in calls) == [60, 1500]


def test_genotype_allele_fraction(world):
    """Hom/het split by support / local depth (pbsv's AD-ratio
    genotyping analogue, CallConfig.hom_genotype_frac)."""
    cfg = LesvConfig()
    rs = [_read(f"r{i}", 5000, _ops(100, d=80)) for i in range(4)]
    # depth 4: support 4/4 >= 0.55 -> 1/1
    calls = call_svs(rs, world, cfg, raw_spans=[(0, 0, 60_000)] * 4)
    assert calls[0].genotype == "1/1"
    # depth 10: support 4/10 < 0.55 -> 0/1
    calls = call_svs(rs, world, cfg, raw_spans=[(0, 0, 60_000)] * 10)
    assert calls[0].genotype == "0/1"


def test_only_ins_del_emitted(world):
    """`pbsv call -t INS,DEL`: the caller's output kinds are only
    INS/DEL and every call length >= min_sv_len."""
    cfg = LesvConfig()
    rs = ([_read(f"r{i}", 5000, _ops(100, d=45)) for i in range(3)]
          + [_read(f"q{i}", 20_000, _ops(100, i=500)) for i in range(3)])
    calls = call_svs(rs, world, cfg, raw_spans=[(0, 0, 60_000)] * 8)
    assert {c.kind for c in calls} == {"DEL", "INS"}
    assert all(c.length >= cfg.call.min_sv_len for c in calls)
