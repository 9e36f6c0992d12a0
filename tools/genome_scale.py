"""Genome-scale (hg19-sized) index+map rung: bounded-RSS proof.

The reference bounds memory with <= 4Gb seqdb volumes and a nested
subject-vol x query-vol loop (`app/map/main.c:40-70`, `makehbndb.c:20-26`).
This tool demonstrates the lesv_tpu equivalent at hg19 scale: simulate an
N-Gb genome (24 chromosomes), persist it to the on-disk 2-bit store, then
run `map_all_volumes` (per-volume k-mer index, volume-local uint32
positions, per-(volume, batch) checkpoints) over a read sample while
tracking peak RSS.

  python tools/genome_scale.py --gbases 3.0 --vol-res 1000000000 \
      --reads 400 --out /tmp/gscale

Prints one JSON blob: peak_rss_gb, volumes, wall per phase, mapped reads.
The acceptance bar (VERDICT round-2 item 3): 3 Gb genome, peak RSS < 16 GB.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbases", type=float, default=3.0)
    ap.add_argument("--chroms", type=int, default=24)
    ap.add_argument("--vol-res", type=int, default=1_000_000_000)
    ap.add_argument("--reads", type=int, default=400)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--err", type=float, default=0.08)
    ap.add_argument("--out", default="/tmp/lesv_gscale")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platform_name", "cpu")

    from lesv_tpu.config import LesvConfig
    from lesv_tpu.io.seqstore import SeqStore
    from lesv_tpu.pipeline.mapper import map_all_volumes, subject_volumes
    from lesv_tpu.sim import mutate_read

    os.makedirs(args.out, exist_ok=True)
    store_dir = os.path.join(args.out, "store")
    rng = np.random.default_rng(0)
    n_total = int(args.gbases * 1e9)
    per_chrom = n_total // args.chroms

    report: dict = {"gbases": args.gbases, "chroms": args.chroms,
                    "vol_res": args.vol_res}

    t0 = time.time()
    if not os.path.exists(os.path.join(store_dir, "packed.npy")):
        # build + persist the store, then drop it and reopen via mmap
        recs = []
        for c in range(args.chroms):
            recs.append((f"chr{c + 1}",
                         rng.integers(0, 4, per_chrom, dtype=np.uint8)))
        store = SeqStore.from_records(recs)
        store.write(store_dir)
        del store, recs
    report["sim_s"] = round(time.time() - t0, 1)
    report["rss_after_sim_gb"] = round(rss_gb(), 2)

    store = SeqStore.open(store_dir, mmap=True)
    cfg = LesvConfig()
    cfg.map.max_subject_vol_res = args.vol_res
    cfg.map.engine = "host" if args.cpu else "device"
    vols = subject_volumes(store, args.vol_res)
    report["volumes"] = len(vols)

    # read sample: fragments of random chromosomes (mapping correctness
    # is covered by the test suite; this rung measures MEMORY + the
    # volume loop at scale, so low coverage suffices)
    reads = []
    for i in range(args.reads):
        sid = int(rng.integers(0, store.num_seqs))
        ssz = store.seq_size(sid)
        a = int(rng.integers(0, max(1, ssz - args.read_len)))
        frag = store.get(sid, a, min(a + args.read_len, ssz))
        reads.append((f"r{i}_s{sid}_{a}", mutate_read(rng, frag, args.err)))

    t0 = time.time()
    m4s, _ = map_all_volumes(reads, store, cfg,
                             ckpt_dir=os.path.join(args.out, "parts"))
    report["map_s"] = round(time.time() - t0, 1)
    report["m4s"] = len(m4s)
    mapped = {m.qid for m in m4s}
    report["reads_mapped"] = len(mapped)
    report["reads_total"] = len(reads)
    # every read maps back to its source chromosome
    correct = 0
    for m in m4s:
        name = reads[m.qid][0]
        src_sid = int(name.split("_s")[1].split("_")[0])
        if m.sid == src_sid:
            correct += 1
    report["m4s_on_source_chrom"] = correct
    report["peak_rss_gb"] = round(rss_gb(), 2)
    report["rss_under_16gb"] = report["peak_rss_gb"] < 16.0
    with open(os.path.join(args.out, "genome_scale.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
