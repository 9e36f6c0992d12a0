"""Microbench for the Pallas fill kernel: variants + ablations.

Usage: python tools/kbench.py [--i16 0|1] [--shapes B,Q,W ...]
Chained-dispatch timing (see bench.py methodology).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--i16", type=int, default=None,
                    help="force i16 (1) / i32 (0); default: auto gate")
    def _k_arg(v):
        k = int(v)
        if k < 2:
            raise argparse.ArgumentTypeError("--k must be >= 2 (timing "
                                             "subtracts one fill)")
        return k

    ap.add_argument("--k", type=_k_arg, default=16)
    ap.add_argument("--shapes", nargs="*",
                    default=["2048,512,128", "1024,1024,256",
                             "256,4096,512"])
    ap.add_argument("--free-end", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops.align_pallas import _pallas_fill_jit
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()
    cfg = AlignConfig()
    rng = np.random.default_rng(0)
    K = args.k

    for spec in args.shapes:
        B, Q, W = map(int, spec.split(","))
        S = Q + W
        s = rng.integers(0, 4, (B, S), dtype=np.uint8)
        from lesv_tpu.sim import mutate_read
        q = np.zeros((B, Q), np.uint8)
        qlen = np.zeros(B, np.int32)
        slen = np.zeros(B, np.int32)
        for i in range(B):
            m = mutate_read(rng, s[i, :Q], err=0.1)[:Q]
            q[i, : len(m)] = m
            qlen[i] = len(m)
            slen[i] = min(S - 1, len(m) + int(rng.integers(0, W // 4)))
        jq, js, jql, jsl = (jnp.asarray(q), jnp.asarray(s),
                            jnp.asarray(qlen), jnp.asarray(slen))

        variants = [False, True] if args.i16 is None else [bool(args.i16)]
        for i16 in variants:
            def fill(ql):
                return _pallas_fill_jit(
                    jq, js, ql, jsl, W, "diag", args.free_end, cfg.match,
                    cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
                    cfg.gap_open2, cfg.gap_ext2, i16=i16)

            @jax.jit
            def many(ql, K=K, fill=fill):
                def body(i, carry):
                    ql, acc = carry
                    out = fill(ql)
                    sc = out[1].ravel()[0].astype(jnp.int32)
                    return (jnp.minimum(ql, jnp.abs(sc) + jnp.int32(Q)),
                            acc + sc)
                return jax.lax.fori_loop(0, K, body, (ql, jnp.int32(0)))[1]

            @jax.jit
            def one(ql, fill=fill):
                out = fill(ql)
                return out[1].ravel()[0].astype(jnp.int32)

            def t(f):
                try:
                    np.asarray(f(jql))
                except Exception as e:
                    print(f"FAIL i16={i16}: {type(e).__name__}: "
                          f"{str(e)[:200]}", file=sys.stderr)
                    return None
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(jql))
                    best = min(best, time.perf_counter() - t0)
                return best

            tm, to = t(many), t(one)
            if tm is None or to is None:
                continue
            dt = max((tm - to) / (K - 1), 1e-9)
            cells = B * Q * W
            print(f"B={B} Q={Q} W={W} i16={int(i16)} "
                  f"free_end={int(args.free_end)}: {dt*1e3:.2f} ms/fill "
                  f"-> {cells/dt/1e9:.2f} Gcells/s")


if __name__ == "__main__":
    main()
