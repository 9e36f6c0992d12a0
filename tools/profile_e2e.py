"""Warm-run span profile of the bench e2e workload.

Runs the exact bench.bench_e2e dataset through the pipeline twice (run 0
warms the jit cache), then dumps the profiling span table of the warm
run sorted by total time — the tool that decides where the next e2e
optimization goes.

Usage: python tools/profile_e2e.py [--out /tmp/profile_e2e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_e2e.json")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from lesv_tpu.config import LesvConfig
    from lesv_tpu.pipeline.driver import run_pipeline
    from lesv_tpu.sim import plant_svs, random_genome, simulate_reads
    from lesv_tpu.utils import profiling

    rng = np.random.default_rng(5)
    genome = random_genome(rng, 300_000)
    donor, truth = plant_svs(rng, genome, n_del=3, n_ins=3, min_len=50,
                             max_len=2_000, margin=20_000, min_gap=30_000)
    reads = simulate_reads(rng, donor, coverage=8, mean_len=8_000,
                           min_len=3_000, err=0.1)
    total_bases = sum(len(r) for _, r in reads)
    cfg = LesvConfig()
    rep = None
    for it in range(args.runs):
        profiling.reset()
        t0 = time.time()
        res = run_pipeline([("chr1", genome)], reads, cfg)
        wall = time.time() - t0
        spans = profiling.report()
        rep = {
            "run": it,
            "wall_s": round(wall, 2),
            "bases_per_sec": round(total_bases / wall),
            "timings": {k: round(v, 2) for k, v in res.timings.items()},
            "spans": dict(sorted(
                spans.items(),
                key=lambda kv: -kv[1]["total_s"])),
        }
        print(f"# run{it}: wall={wall:.1f}s "
              f"timings={rep['timings']}", file=sys.stderr)
    with open(args.out, "w") as fh:
        json.dump(rep, fh, indent=1)
    for k, v in list(rep["spans"].items())[:25]:
        print(f"{k:40s} n={v['count']:5d} total={v['total_s']:8.2f}s")


if __name__ == "__main__":
    main()
