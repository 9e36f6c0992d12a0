"""Reference-pipeline F1 on the SAME simulation as tools/f1_eval.py.

Runs the ACTUAL reference binaries (stages 1-7, `lesv.sh` order) on the
diploid case from `f1_eval.build_case`, feeds the reference's remapped
SAM (the pbsv input, `map_cns_sv_read.c` output) into OUR native caller
(`pipeline/caller.py`), and scores BOTH pipelines against the same
truth.  This gives the headline F1 a baseline measured on identical
input — "the reference would lose those FNs identically" becomes a
measurement instead of a claim.

Usage:
  python tools/ref_f1.py --genome 1000000 --coverage 20 --n-sv 30 \
      --seeds 0 1 2 --out /tmp/lesv_ref_f1 --json-out ACCURACY_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from concordance import ensure_ref_bins, parse_m4_text, run_reference  # noqa: E402
from f1_eval import build_case, evaluate  # noqa: E402

from lesv_tpu.config import LesvConfig  # noqa: E402
from lesv_tpu.io.fasta import encode_seq, write_fasta  # noqa: E402
from lesv_tpu.io.seqstore import SeqStore  # noqa: E402
from lesv_tpu.pipeline.caller import call_svs  # noqa: E402
from lesv_tpu.pipeline.remap import RemapResult  # noqa: E402

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_OPC = {"M": 0, "=": 0, "X": 0, "I": 1, "D": 2}


def _gid_of(qname: str) -> int:
    """Group id from the reference's `_svr:qdir:sid:gid:sfrom:sto`
    header codec (`sv_read_group_file_name.cpp:124-129`)."""
    m = re.search(r"_svr:\d+:\d+:(\d+):", qname)
    return int(m.group(1)) if m else 0


def parse_ref_sam_full(cns_dir: str, sid_of: dict[str, int]
                       ) -> list[RemapResult]:
    """Reference remapped SAM -> RemapResult records for our caller."""
    out: list[RemapResult] = []
    for fn in sorted(os.listdir(cns_dir)):
        if not fn.endswith(".sam"):
            continue
        with open(os.path.join(cns_dir, fn)) as fh:
            for line in fh:
                if line.startswith("@"):
                    continue
                c = line.rstrip("\n").split("\t")
                if len(c) < 11 or c[2] == "*" or c[5] == "*":
                    continue
                qname, flag, rname = c[0], int(c[1]), c[2]
                pos, cigar, seq = int(c[3]) - 1, c[5], c[9]
                codes = encode_seq(seq)
                ops: list[np.ndarray] = []
                lead = 0
                ref_adv = 0
                seen_aln = False
                for num, op in _CIG_RE.findall(cigar):
                    n = int(num)
                    if op in ("S", "H"):
                        if not seen_aln and op == "S":
                            lead += n
                        continue
                    if op in _OPC:
                        seen_aln = True
                        ops.append(np.full(n, _OPC[op], np.uint8))
                        if op != "I":
                            ref_adv += n
                if not ops:
                    continue
                opsa = np.concatenate(ops)
                n_q = int((opsa != 2).sum())     # query consumed
                out.append(RemapResult(
                    name=qname, global_id=len(out),
                    rev=bool(flag & 16), subject_id=sid_of[rname],
                    pos=pos, end=pos + ref_adv, ops=opsa,
                    seq=codes[lead : lead + n_q], ident_perc=0.0,
                    eff_ident_perc=0.0, group_id=_gid_of(qname),
                    kind=""))
    return out


def reference_calls(seed: int, args, bin_dir: str):
    """Run reference stages 1-7 on the case, then OUR caller on its SAM."""
    genome, trf, reads, truth = build_case(seed, args)
    wrk = os.path.join(args.out, f"refpipe_seed{seed}")
    done = os.path.join(wrk, "refpipe.done")
    if getattr(args, "reuse_ref", False) and os.path.exists(done):
        art = {"cns": os.path.join(wrk, "svr_group_cns"),
               "m4": os.path.join(wrk, "map.m4")}
        wall = 0.0
    else:
        if os.path.isdir(wrk):
            shutil.rmtree(wrk)
        os.makedirs(wrk, exist_ok=True)
        ref_fa = os.path.join(wrk, "ref.fasta")
        reads_fa = os.path.join(wrk, "reads.fasta")
        write_fasta(ref_fa, [("chr1", genome)])
        write_fasta(reads_fa, reads)
        t0 = time.time()
        art = run_reference(bin_dir, wrk, reads_fa, ref_fa, args.threads)
        wall = time.time() - t0
        with open(done, "w") as fh:
            fh.write("ok\n")
    sstore = SeqStore.from_records([("chr1", genome)])
    remapped = parse_ref_sam_full(art["cns"], {"chr1": 0})
    # depth spans from the reference's own M4 (best alignment per read)
    best: dict[str, tuple] = {}
    for m in parse_m4_text(art["m4"]):
        cur = best.get(m["qname"])
        if cur is None or m["score"] > cur[0]:
            best[m["qname"]] = (m["score"], 0, m["soff"], m["send"])
    raw_spans = [(sid, so, se) for _, sid, so, se in best.values()]
    calls = call_svs(remapped, sstore, LesvConfig(), raw_spans=raw_spans)
    ev = evaluate(calls, truth)
    return dict(eval=ev, calls=len(calls), remapped=len(remapped),
                wall_s=round(wall, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--coverage", type=float, default=20.0)
    ap.add_argument("--n-sv", type=int, default=30)
    ap.add_argument("--min-len", type=int, default=40)
    ap.add_argument("--max-len", type=int, default=30_000)
    ap.add_argument("--het-frac", type=float, default=0.4)
    ap.add_argument("--no-trf", dest="trf", action="store_false")
    ap.add_argument("--trf-frac", type=float, default=0.15)
    ap.add_argument("--cluster-frac", type=float, default=0.1)
    ap.add_argument("--err", type=float, default=0.08)
    ap.add_argument("--mean-len", type=int, default=12_000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--out", default="/tmp/lesv_ref_f1")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--reuse-ref", action="store_true",
                    help="reuse a completed reference-pipeline run dir")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    bin_dir = ensure_ref_bins()

    per_seed = []
    for seed in args.seeds:
        ref_rep = reference_calls(seed, args, bin_dir)
        rep = dict(seed=seed, reference=ref_rep)
        if not args.skip_ours:
            from f1_eval import run_case

            ours = run_case(seed, args, LesvConfig())
            rep["ours"] = dict(eval=ours["eval"], calls=ours["calls"],
                               wall_s=ours["wall_s"],
                               timings=ours["timings"])
            rep["ours_minus_ref_f1"] = round(
                ours["eval"]["f1"] - ref_rep["eval"]["f1"], 4)
        per_seed.append(rep)
        print(json.dumps(rep, indent=2))

    out = {
        "config": {k: getattr(args, k) for k in
                   ("genome", "coverage", "n_sv", "min_len", "max_len",
                    "het_frac", "trf_frac", "cluster_frac", "err",
                    "mean_len", "seeds")},
        "per_seed": per_seed,
        "ref_f1_mean": round(float(np.mean(
            [r["reference"]["eval"]["f1"] for r in per_seed])), 4),
    }
    if not args.skip_ours:
        out["our_f1_mean"] = round(float(np.mean(
            [r["ours"]["eval"]["f1"] for r in per_seed])), 4)
        out["ours_beats_or_ties_ref_all_seeds"] = all(
            r["ours"]["eval"]["f1"] >= r["reference"]["eval"]["f1"] - 1e-9
            for r in per_seed)
    path = args.json_out or os.path.join(args.out, "ref_f1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_seed"}))


if __name__ == "__main__":
    main()
