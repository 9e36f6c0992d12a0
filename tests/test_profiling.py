"""Tracing/profiling hooks (reference analogue: hbn_timing_begin/end,
`hbn_aux.h:97-106`, plus the gperftools hooks the reference left
commented out — here a real registry + JAX profiler integration)."""

import json
import os

from lesv_tpu.utils import profiling


def test_trace_report(tmp_path):
    profiling.reset()
    with profiling.trace("unit/a"):
        pass
    with profiling.trace("unit/a"):
        pass
    profiling.add("stage/x", 1.5)
    rep = profiling.report()
    assert rep["unit/a"]["count"] == 2
    assert rep["stage/x"]["total_s"] == 1.5
    p = str(tmp_path / "prof.json")
    profiling.dump_json(p)
    assert json.load(open(p))["unit/a"]["count"] == 2


def test_device_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("LESV_TPU_PROFILE", raising=False)
    with profiling.device_trace():
        pass


def test_device_trace_writes_xplane(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "prof")
    with profiling.device_trace(logdir):
        with profiling.annotate("unit-region"):
            jax.block_until_ready(jnp.ones(8) + 1)
    # TensorBoard XPlane output appears under plugins/profile
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler wrote no files"


def test_pipeline_emits_profile(tmp_path):
    import numpy as np

    from lesv_tpu.config import LesvConfig
    from lesv_tpu.pipeline.driver import run_pipeline
    from lesv_tpu.sim import plant_svs, random_genome, simulate_reads

    profiling.reset()
    rng = np.random.default_rng(0)
    genome = random_genome(rng, 60_000)
    donor, _ = plant_svs(rng, genome, n_del=1, n_ins=1, min_len=60,
                         max_len=120, margin=8_000, min_gap=9_000)
    reads = simulate_reads(rng, donor, coverage=6, mean_len=8_000,
                           min_len=3_000, err=0.05)
    out = str(tmp_path / "run")
    run_pipeline([("chr1", genome)], reads, LesvConfig(), out_dir=out)
    prof = json.load(open(os.path.join(out, "profile.json")))
    assert any(k.startswith("stage/") for k in prof)
    assert any(k.startswith("align/") for k in prof)
