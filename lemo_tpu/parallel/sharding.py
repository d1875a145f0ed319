"""SPMD scaling over a jax device mesh.

The reference has no distributed layer at all (single GPU everywhere,
SURVEY.md §2.8); scale here comes from sharding the *embarrassingly
parallel* axes of the workloads over ICI with jax.sharding + jit:

- prior training: data-parallel batches (replicated params, sharded
  batch; XLA inserts the gradient all-reduce);
- AMASS fitting: clips are independent -> shard the clip axis; within a
  clip the parallel Stage-1 mode also shards frames (the
  sequence-parallel analog of the reference's sliding windows);
- PROX: windows of one recording are sequentially dependent through their
  warm starts, but different recordings shard trivially.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def data_parallel_step(train_step, mesh: Mesh, axis_name: str = "dp"):
    """Wrap a `(params, opt_state, batch, *rest) -> (params, opt_state,
    metrics)` train step so the batch is sharded over the mesh and params/
    optimizer state stay replicated. XLA inserts the psum for gradients."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis_name))

    def place(params, opt_state, batch, *rest):
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        batch = jax.device_put(batch, shard)
        return train_step(params, opt_state, batch, *rest)

    return place


def clip_sharded_fit(fit_fn, mesh: Mesh, axis_name: str = "dp"):
    """Shard a batched fit `f(batched_inputs...) -> outputs` over clips:
    every argument's leading axis is the clip axis."""
    shard = NamedSharding(mesh, P(axis_name))

    def run(*batched):
        batched = tuple(jax.device_put(b, shard) for b in batched)
        return fit_fn(*batched)

    return run


def shard_frames(mesh: Mesh, pytree, axis_name: str = "dp"):
    """Place a per-frame pytree (leading axis = frames) sharded over the
    mesh — sequence-parallel layout for the temporal fits."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), pytree)
