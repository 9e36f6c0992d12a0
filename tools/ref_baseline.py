"""Measure the actual reference binaries' throughput on this host.

Runs the reference stages 1-4 (qx2splitseq -> qx2map -> qx2m4x ->
qx2svr -> qx2svsig, the compute-dominant part of `scripts/lesv.sh`) on
the exact simulated input bench.py's e2e uses, and writes
BASELINE_MEASURED.json with bases/s.  bench.py reads that file to report
`vs_baseline` as ours / reference-on-the-same-host.

  python tools/ref_baseline.py [--threads N] [--out BASELINE_MEASURED.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from lesv_tpu.io.fasta import write_fasta
from lesv_tpu.sim import plant_svs, random_genome, simulate_reads
from tools.concordance import ensure_ref_bins, run_reference


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "BASELINE_MEASURED.json"))
    ap.add_argument("--wrk", default="/tmp/lesv_ref_baseline")
    args = ap.parse_args()

    # EXACTLY bench.bench_e2e's input
    rng = np.random.default_rng(5)
    genome = random_genome(rng, 300_000)
    donor, truth = plant_svs(rng, genome, n_del=3, n_ins=3, min_len=50,
                             max_len=2_000, margin=20_000, min_gap=30_000)
    reads = simulate_reads(rng, donor, coverage=8, mean_len=8_000,
                           min_len=3_000, err=0.1)
    total_bases = sum(len(r) for _, r in reads)

    bin_dir = ensure_ref_bins()
    if os.path.isdir(args.wrk):    # stale markers make stages no-ops
        import shutil

        shutil.rmtree(args.wrk)
    os.makedirs(args.wrk, exist_ok=True)
    ref_fa = os.path.join(args.wrk, "ref.fasta")
    reads_fa = os.path.join(args.wrk, "reads.fasta")
    write_fasta(ref_fa, [("chr1", genome)])
    write_fasta(reads_fa, reads)

    t0 = time.time()
    run_reference(bin_dir, args.wrk, reads_fa, ref_fa, args.threads)
    wall = time.time() - t0

    out = {
        "host": f"{os.cpu_count()} CPUs",
        "threads": args.threads,
        "genome": 300_000,
        "reads": len(reads),
        "total_bases": total_bases,
        "wall_s": round(wall, 1),
        "ref_bases_per_sec": round(total_bases / wall, 1),
        "stages": "split+map+m4x+svr+svsig+msvrg+csvrg+asvr "
                  "(lesv.sh stages 1-7, the full pre-pbsv pipeline — "
                  "matches the stages bench.bench_e2e times on ours)",
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
