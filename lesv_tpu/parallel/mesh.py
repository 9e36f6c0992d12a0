"""Device-mesh data parallelism for the mapping compute.

The reference scales with `-grid node_id num_nodes` query-volume striding
over a shared filesystem (`app/map/main.c:35-55`); the TPU-native design is
pure data parallelism over read/segment batches on a
``jax.sharding.Mesh(('data',))``:

* the k-mer index and the 2-bit reference are replicated per host
  (in_specs ``P()``);
* read/alignment batches are sharded on the batch axis via `shard_map`;
* per-shard chain/alignment statistics merge with `psum` (the
  cross-host SV-signature merge itself is host-side record exchange —
  `lesv_tpu.parallel.dist.JaxExchange.allgather`).

Two jitted sharded steps cover the device pipeline:
`sharded_seed_chain_step` (windowed seeding -> seed sort -> chain DP,
the front half of qx2map) and `sharded_align_step` (the banded
dual-affine fill).  Both are tested on an 8-device virtual CPU mesh
(tests/conftest.py) and compiled for N devices by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lesv_tpu.config import AlignConfig, ChainConfig, SeedingConfig
from lesv_tpu.ops.align_jax import banded_align_kernel


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# -- production-path mesh context -------------------------------------------
# `use_mesh` makes the pipeline's device dispatches (the alignment fill,
# ops/align_jax.banded_align_dispatch) shard their batches over the mesh
# instead of round-robining whole chunks across devices — the whole
# mapping is then one SPMD program per chunk (`app/map/main.c:35-55`'s
# sharding done by the XLA partitioner).

import contextlib

_ACTIVE: list[Mesh] = []


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    _ACTIVE.append(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE.pop()


def active_mesh() -> Mesh | None:
    import os

    if os.environ.get("LESV_TPU_MESH", "auto") == "0":
        return None
    if _ACTIVE:
        return _ACTIVE[-1]
    return _auto_mesh()


def _auto_mesh() -> Mesh | None:
    """A mesh over all local devices when more than one real chip is
    present (the production multi-chip path without explicit opt-in).
    Virtual CPU meshes must opt in via `use_mesh` (tests)."""
    global _AUTO
    if _AUTO is _UNSET:
        devs = jax.local_devices()
        _AUTO = (make_mesh(len(devs))
                 if len(devs) > 1 and jax.default_backend() != "cpu"
                 else None)
    return _AUTO


_UNSET = object()
_AUTO: Mesh | None | object = _UNSET


def _fill_out_specs(axis: str, pallas_layout: bool):
    """Out specs for the fill kernel: dirs batch axis differs by kernel
    ((R, W, B) from Pallas, (B, R, W) from the XLA scan)."""
    dirs = P(None, None, axis) if pallas_layout else P(axis, None, None)
    return (dirs, P(axis), P(axis), P(axis), P(axis))


import functools


@functools.lru_cache(maxsize=256)
def _sharded_fill(mesh: Mesh, W: int, mode: str, free_end: bool,
                  cfg_key: tuple, use_pallas: bool, interpret: bool):
    """Cached jitted shard_map of the banded fill over ``mesh`` — the
    production fill path when >1 device is visible (batch sharded on
    'data', all scalars/params static)."""
    from jax.experimental.shard_map import shard_map

    cfg = AlignConfig(**dict(cfg_key))
    axis = mesh.axis_names[0]

    def local(q, s, qlen, slen):
        if use_pallas:
            from lesv_tpu.ops.align_pallas import (
                pallas_banded_align_kernel,
            )

            return pallas_banded_align_kernel(
                q, s, qlen, slen, W, mode, cfg, free_end=free_end,
                interpret=interpret)
        return banded_align_kernel(q, s, qlen, slen, W, mode, cfg,
                                   free_end=free_end)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=_fill_out_specs(axis, use_pallas),
        check_rep=False,
    )
    return jax.jit(sharded)


def mesh_fill(mesh: Mesh, q, s, qlen, slen, W: int, mode: str,
              cfg: AlignConfig, free_end: bool, use_pallas: bool,
              interpret: bool = False):
    """Run the banded fill sharded over ``mesh`` (batch padded to a
    multiple of the mesh size by the caller)."""
    cfg_key = tuple(sorted(
        (f, getattr(cfg, f)) for f in
        ("match", "mismatch", "gap_open1", "gap_ext1", "gap_open2",
         "gap_ext2")))
    fn = _sharded_fill(mesh, W, mode, free_end, cfg_key, use_pallas,
                       interpret)
    return fn(q, s, qlen, slen)


def sharded_align_step(mesh: Mesh, W: int, mode: str,
                       cfg: AlignConfig | None = None):
    """Build a jitted, mesh-sharded alignment-fill step.

    The batch is sharded over the 'data' axis; outputs: per-lane scores /
    end cells (sharded) plus psum-merged totals (ok-lane count, score
    sum) — the per-shard reduction the driver logs per batch.
    """
    cfg = cfg or AlignConfig()
    axis = mesh.axis_names[0]

    def step(q, s, qlen, slen):
        dirs, score, end_i, end_b, ok = banded_align_kernel(
            q, s, qlen, slen, W, mode, cfg, free_end=False)
        n_ok = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis)
        total_score = jax.lax.psum(
            jnp.sum(jnp.where(ok, score, 0)), axis)
        return score, end_b, ok, n_ok, total_score

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


def sharded_seed_chain_step(mesh: Mesh, k: int,
                            M: int = 2048, J: int = 64,
                            seeding: SeedingConfig | None = None,
                            chain: ChainConfig | None = None):
    """Build a jitted, mesh-sharded seeding + chain-DP step — the device
    front half of the mapper (ops.seeding_jax + ops.chain_jax) with real
    shardings: reads sharded on the batch axis, the k-mer index
    replicated (``P()``), per-shard best-chain stats psum-merged.

    Returns step(codes, qlen, hash_hi, hash_lo, start, positions) ->
    (f (B, M) sharded, best (B,) sharded, n_chained (), score_sum ()).
    """
    from jax.experimental.shard_map import shard_map

    from lesv_tpu.ops.chain_jax import _chain_scan_kernel, sort_seeds_device
    from lesv_tpu.ops.seeding_jax import (
        _seed_match_kernel,
        sampled_offsets_static,
    )

    seeding = seeding or SeedingConfig()
    chain = chain or ChainConfig()
    axis = mesh.axis_names[0]

    def step(codes, qlen, hash_hi, hash_lo, start, positions):
        offs = jnp.asarray(sampled_offsets_static(
            codes.shape[1], k, seeding.query_stride, seeding))
        qoff, soff, valid, total = _seed_match_kernel(
            codes, qlen, offs, hash_hi, hash_lo, start, positions,
            k=k, max_occ=seeding.max_query_kmer_occ, M=M,
            n_index=hash_hi.shape[0])
        qs, ss, vs = sort_seeds_device(qoff, soff, valid)
        f, p_rel, v = _chain_scan_kernel(
            qs, ss, vs, J=J, length=k, max_dq=chain.max_dist_qry,
            max_dr=chain.max_dist_ref, bw=chain.max_band_width)
        best = jnp.max(jnp.where(vs, f, 0), axis=1)
        n_chained = jax.lax.psum(
            jnp.sum((best >= chain.min_chain_score).astype(jnp.int32)),
            axis)
        score_sum = jax.lax.psum(jnp.sum(best), axis)
        return f, best, n_chained, score_sum

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis, None), P(axis), P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)
