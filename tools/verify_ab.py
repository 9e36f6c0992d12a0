"""A/B integration check: the full pipeline must produce IDENTICAL calls
with the Pallas fill (LESV_TPU_PALLAS=auto) and the XLA scan fill
(LESV_TPU_PALLAS=0) — the backends are bit-identical by construction,
so any divergence is an integration bug (bucketing, padding, layout).

Usage (each side resumes from stage checkpoints, so rerun until both
complete if compiles blow the clock):

  python tools/verify_ab.py --out-a /tmp/vA.run --out-b /tmp/vB.run

Exits 0 and prints PASS only when both sides ran and their call sets
match exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_side(out_dir: str, pallas: str, args) -> dict | None:
    env = dict(os.environ, LESV_TPU_PALLAS=pallas)
    cmd = [sys.executable, os.path.join(HERE, "scale_run.py"),
           "--genome", str(args.genome), "--coverage", str(args.coverage),
           "--n-del", str(args.n_del), "--n-ins", str(args.n_ins),
           "--mean-len", str(args.mean_len), "--seed", str(args.seed),
           "--out", out_dir]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=args.timeout)
    if r.returncode != 0:
        print(f"[{pallas}] FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
              file=sys.stderr)
        return None
    return json.loads(r.stdout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=500_000)
    ap.add_argument("--coverage", type=float, default=8.0)
    ap.add_argument("--n-del", type=int, default=4)
    ap.add_argument("--n-ins", type=int, default=4)
    ap.add_argument("--mean-len", type=int, default=8_000)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--out-a", default="/tmp/verify_ab_pallas")
    ap.add_argument("--out-b", default="/tmp/verify_ab_xla")
    args = ap.parse_args()

    a = run_side(args.out_a, "auto", args)
    b = run_side(args.out_b, "0", args)
    if a is None or b is None:
        print("BLOCKED: one side did not complete (rerun to resume)")
        sys.exit(2)
    ca, cb = a["calls"], b["calls"]
    if ca != cb:
        only_a = [c for c in ca if c not in cb]
        only_b = [c for c in cb if c not in ca]
        print(f"FAIL: calls differ (pallas-only {only_a}, xla-only {only_b})")
        sys.exit(1)
    print(json.dumps({"verdict": "PASS", "n_calls": len(ca),
                      "eval_pallas": a["eval"], "eval_xla": b["eval"],
                      "wall_pallas_s": a["wall_s"],
                      "wall_xla_s": b["wall_s"]}))


if __name__ == "__main__":
    main()
