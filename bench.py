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

Methodology: per-dispatch timing is unreliable on tunneled/async device
transports, so each measurement jits ONE executable that chains K fills
with a data dependency the compiler cannot fold away, and times
(K fills + 1 round trip) minus (1 fill + 1 round trip).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_CELLS_PER_SEC = 48e9
K = 16  # chained fills per dispatch


def _chained(fill, jql, K):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(ql):
        def body(i, carry):
            ql, acc = carry
            out = fill(ql)
            sc = out[1].ravel()[0].astype(jnp.int32)
            # opaque dep: value == ql always, but XLA cannot prove it
            return (jnp.minimum(ql, jnp.abs(sc) + jql), acc + sc)

        return jax.lax.fori_loop(0, K, body, (ql, jnp.int32(0)))[1]

    return many


def _time(f, jql):
    best = 1e9
    np.asarray(f(jql))  # compile + run
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(jql))
        best = min(best, time.time() - t0)
    return best


def bench_kernel():
    import jax
    import jax.numpy as jnp

    from lesv_tpu.config import AlignConfig
    from lesv_tpu.ops.align_jax import _kernel_jit
    from lesv_tpu.utils.jaxinit import setup_jax

    setup_jax()
    cfg = AlignConfig()
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"

    # realistic buckets: consensus/mapper segment fills
    # (fill-only timing: traceback is host-side and overlaps)
    shapes = [
        (256, 256, 128),
        (64, 1024, 256),
    ] if not on_tpu else [
        (1024, 1024, 256),
        (2048, 512, 128),
        (256, 4096, 512),
    ]
    k = K if on_tpu else 4
    best_cells = 0.0
    for B, Q, W in shapes:
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

        def xla_fill(ql):
            return _kernel_jit(jq, js, ql, jsl, W, "diag", False,
                               cfg.match, cfg.mismatch, cfg.gap_open1,
                               cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2)

        fills = {"xla": xla_fill}
        if on_tpu:
            from lesv_tpu.ops.align_pallas import (
                _pallas_fill_jit,
                pallas_supported,
            )

            if pallas_supported(B, Q, S, W):
                import lesv_tpu.ops.align_pallas as ap

                def _mk(i16):
                    def pallas_fill(ql):
                        return _pallas_fill_jit(
                            jq, js, ql, jsl, W, "diag", False, cfg.match,
                            cfg.mismatch, cfg.gap_open1, cfg.gap_ext1,
                            cfg.gap_open2, cfg.gap_ext2, i16=i16)

                    return pallas_fill

                want_i16 = (ap._i16_ok(Q, W, cfg.match, cfg.mismatch,
                                       cfg.gap_open1, cfg.gap_ext1,
                                       cfg.gap_open2, cfg.gap_ext2)
                            and not ap._I16_BROKEN)
                pallas_fill = _mk(want_i16)
                if want_i16:
                    try:     # same gated fallback as production
                        np.asarray(pallas_fill(jql)[1])
                    except Exception as e:
                        if not ap._is_lowering_error(e):
                            raise
                        ap._I16_BROKEN = True
                        print("# i16 Pallas lowering unavailable on this "
                              "libtpu (see DESIGN.md); benching i32",
                              file=sys.stderr)
                        pallas_fill = _mk(False)
                fills["pallas"] = pallas_fill

        cells = B * Q * W
        for name, fill in fills.items():
            t_many = _time(_chained(fill, jql, k), jql)
            t_one = _time(_chained(fill, jql, 1), jql)
            dt = max((t_many - t_one) / (k - 1), 1e-9)
            rate = cells / dt
            extra = ""
            if name == "pallas":
                import math

                from lesv_tpu.ops import align_pallas as ap

                variant = ("i16" if ap._i16_ok(
                    Q, W, cfg.match, cfg.mismatch, cfg.gap_open1,
                    cfg.gap_ext1, cfg.gap_open2, cfg.gap_ext2)
                    and not ap._I16_BROKEN else "i32")
                # VPU roofline: ~45 vector ops/cell + 2*log2(W) scan ops;
                # v5e VPU peak ~= 8*128*4 ALUs * 0.94GHz = 3.9e12 ops/s
                # (see DESIGN.md "Kernel roofline")
                ops_cell = 45 + 2 * math.log2(W)
                extra = (f" [{variant}, ~{rate * ops_cell / 3.9e12:.0%}"
                         f" of VPU peak]")
            print(f"# B={B} Q={Q} W={W} {name}: {dt*1e3:.2f} ms/fill "
                  f"-> {rate/1e9:.2f} Gcells/s{extra}", file=sys.stderr)
            best_cells = max(best_cells, rate)
    return best_cells


def bench_e2e():
    """End-to-end pipeline throughput (bases/s) on a simulated dataset.

    Three runs: the first warms the persistent XLA compile cache, the
    best of the remaining two is reported (steady-state throughput —
    the reference never pays compiles, and the tunneled transport has
    heavy run-to-run variance).  Baseline: the actual reference
    binaries' wall clock for stages 1-7 on the SAME input and host,
    measured once by tools/ref_baseline.py into BASELINE_MEASURED.json.
    """
    import os

    import jax

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
    walls = []
    for it in range(3):
        profiling.reset()
        t0 = time.time()
        res = run_pipeline([("chr1", genome)], reads, cfg)
        walls.append(time.time() - t0)
        print(f"# e2e run{it}: {walls[-1]:.1f}s calls={len(res.calls)} "
              f"timings={ {k: round(v, 1) for k, v in res.timings.items()} }",
              file=sys.stderr)
    # run0 warms the compile cache; the tunneled device's wall clock has
    # heavy run-to-run variance (shared transport), so steady-state
    # throughput is the best of the two warm runs
    wall = min(walls[1:])
    bases_per_sec = total_bases / wall
    ref = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as fh:
            ref = json.load(fh)
    except Exception:
        pass
    vs = None
    if ref and ref.get("ref_bases_per_sec"):
        vs = bases_per_sec / ref["ref_bases_per_sec"]
        print(f"# reference ({ref.get('threads')}T same host): "
              f"{ref['ref_bases_per_sec']:.0f} bases/s -> ratio {vs:.2f}; "
              f"48-core-extrapolated ratio "
              f"{bases_per_sec / (ref['ref_bases_per_sec'] * 24):.3f}",
              file=sys.stderr)
    return bases_per_sec, vs


def main():
    kern = bench_kernel()
    print(f"# kernel: {kern/1e9:.2f} Gcells/s "
          f"(vs 48-core ksw2 estimate: {kern / BASELINE_CELLS_PER_SEC:.2f})",
          file=sys.stderr)
    e2e, vs = bench_e2e()
    print(json.dumps({
        "metric": "e2e_bases_per_sec",
        "value": e2e,
        "unit": "bases/s",
        "vs_baseline": vs if vs is not None
        else kern / BASELINE_CELLS_PER_SEC,
        "kernel_cells_per_sec": kern,
        "kernel_vs_48core_ksw2": kern / BASELINE_CELLS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
