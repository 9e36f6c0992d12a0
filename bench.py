"""Benchmark: banded dual-affine alignment kernel throughput on the
current accelerator (the pipeline's speed-of-light component per
BASELINE.json: "banded-DP extension inner loop").

Prints ONE JSON line:
  {"metric": "align_kernel_cells_per_sec", "value": N, "unit": "cells/s",
   "vs_baseline": N}

vs_baseline: the reference's inner loop is ksw2_extd2_sse
(`algo/ksw2_extd2_sse.c`) on a 48x 2.50GHz host (README.md:17-19).
Published ksw2 throughput is ~1 Gcell/s/core for SSE int8 banded DP;
48 cores => ~48e9 cells/s is the baseline estimate used here (to be
replaced by a measured number once the reference binary is benchmarked on
matched hardware).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_CELLS_PER_SEC = 48e9


def bench_kernel():
    import jax

    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops.align_jax import _kernel_jit
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()
    cfg = AlignConfig()
    rng = np.random.default_rng(0)

    # one realistic bucket: consensus/mapper segment fill
    # (B, Q, S, W) — fill-only timing (traceback is host-side and overlaps)
    shapes = [
        (256, 256, 512, 128),
        (64, 1024, 2048, 256),
    ]
    total_cells = 0.0
    total_time = 0.0
    for B, Q, S, W in shapes:
        s = rng.integers(0, 4, (B, S), dtype=np.uint8)
        from lesv_tpu.sim import mutate_read

        q = np.zeros((B, Q), np.uint8)
        qlen = np.zeros(B, np.int32)
        slen = np.full(B, 0, np.int32)
        for i in range(B):
            m = mutate_read(rng, s[i, :Q], err=0.1)[:Q]
            q[i, : len(m)] = m
            qlen[i] = len(m)
            slen[i] = min(S - 1, len(m) + rng.integers(0, W // 4))
        args = (q, s, qlen, slen)
        import jax.numpy as jnp

        jargs = tuple(jnp.asarray(a) for a in args)

        def run():
            out = _kernel_jit(*jargs, W, "diag", False,
                              cfg.match, cfg.mismatch, cfg.gap_open1,
                              cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2)
            jax.block_until_ready(out)
            return out

        run()  # compile
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            run()
        dt = (time.time() - t0) / iters
        cells = B * Q * W
        print(f"# shape B={B} Q={Q} W={W}: {dt*1000:.1f} ms "
              f"-> {cells/dt/1e9:.2f} Gcells/s", file=sys.stderr)
        total_cells += cells * iters
        total_time += dt * iters
    return total_cells / total_time


def main():
    value = bench_kernel()
    print(json.dumps({
        "metric": "align_kernel_cells_per_sec",
        "value": value,
        "unit": "cells/s",
        "vs_baseline": value / BASELINE_CELLS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
