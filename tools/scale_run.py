"""Scale shakeout: simulate a genome with planted SVs, run the full
pipeline, report stage timings + precision/recall vs the planted truth.

BASELINE.json config #1 analogue (E. coli-scale, CPU-runnable):

  python tools/scale_run.py --genome 1000000 --coverage 15 --out /tmp/run
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from lesv_tpu.config import LesvConfig
from lesv_tpu.pipeline.driver import run_pipeline
from lesv_tpu.sim import plant_svs, random_genome, simulate_reads


def evaluate(calls, truth, refdist=1000, len_ratio=0.7):
    """truvari-style matching: DEL/INS within refdist and size similarity."""
    matched = set()
    tp = 0
    for sv in truth.svs:
        best = None
        for i, c in enumerate(calls):
            if i in matched or c.kind != sv.kind:
                continue
            if abs(c.pos - sv.ref_pos) > refdist:
                continue
            if min(c.length, sv.length) < len_ratio * max(c.length, sv.length):
                continue
            if best is None or abs(c.pos - sv.ref_pos) < abs(calls[best].pos - sv.ref_pos):
                best = i
        if best is not None:
            matched.add(best)
            tp += 1
    fn = len(truth.svs) - tp
    fp = len(calls) - len(matched)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return dict(tp=tp, fp=fp, fn=fn, precision=prec, recall=rec, f1=f1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--coverage", type=float, default=15.0)
    ap.add_argument("--n-del", type=int, default=8)
    ap.add_argument("--n-ins", type=int, default=8)
    ap.add_argument("--err", type=float, default=0.1)
    ap.add_argument("--mean-len", type=int, default=12_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    genome = random_genome(rng, args.genome)
    donor, truth = plant_svs(rng, genome, n_del=args.n_del, n_ins=args.n_ins,
                             min_len=50, max_len=2_000,
                             margin=20_000, min_gap=30_000)
    reads = simulate_reads(rng, donor, coverage=args.coverage,
                           mean_len=args.mean_len, min_len=3_000,
                           err=args.err)
    total_bases = sum(len(r) for _, r in reads)
    print(f"sim: genome={args.genome} reads={len(reads)} "
          f"bases={total_bases/1e6:.1f}Mb ({time.time()-t0:.1f}s)",
          file=sys.stderr)

    t0 = time.time()
    res = run_pipeline([("chr1", genome)], reads, LesvConfig(),
                       out_dir=args.out, resume=bool(args.out))
    wall = time.time() - t0
    ev = evaluate(res.calls, truth)
    import resource

    print(json.dumps({
        "stats": res.stats,
        "timings": {k: round(v, 2) for k, v in res.timings.items()},
        "wall_s": round(wall, 1),
        "bases_per_sec": round(total_bases / wall),
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "eval": ev,
        "truth": [(s.kind, s.ref_pos, s.length) for s in truth.svs],
        "calls": [(c.kind, c.pos, c.length, c.support) for c in res.calls],
    }, indent=2))


if __name__ == "__main__":
    main()
