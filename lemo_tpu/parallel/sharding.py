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


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Bring up jax.distributed for a multi-host pod (no-op on one host).

    On TPU pods the three arguments are discovered from the environment;
    pass them explicitly on other fabrics. Returns the process index.
    Every host must then build the SAME mesh (make_pod_mesh) and run the
    same jitted program — XLA routes collectives over ICI within a slice
    and DCN across slices.
    """
    if num_processes is not None and num_processes > 1 \
            or coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def make_pod_mesh(dp: int | None = None, within: int | None = None,
                  axis_names: tuple[str, str] = ("dp", "win")) -> Mesh:
    """2-D mesh over all devices of a (possibly multi-host) runtime:
    outer `dp` axis for independent work (recordings/clips; ride DCN when
    hosts are separate slices), inner `within` axis for work that
    communicates (windows of one recording, frame-sharded fits; rides
    ICI). Defaults: dp = number of processes (1 locally), within = the
    rest.

    Uses mesh_utils.create_device_mesh so device order follows the
    physical torus instead of enumeration order (minimizes hop counts on
    real pods; identical to a reshape on CPU meshes).
    """
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if dp is None:
        dp = max(jax.process_count(), 1)
    if within is None:
        within = n // dp
    if dp * within != n:
        raise ValueError(f"dp*within = {dp}*{within} != {n} devices")
    devs = mesh_utils.create_device_mesh((dp, within))
    return Mesh(devs, axis_names)


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
    if mesh.devices.size > 1 and getattr(fit_fn, "_lemo_fused", False):
        raise ValueError(
            "this batched fitter was built with fused=True; under a "
            "multi-device mesh GSPMD treats the fused pallas_call as an "
            "opaque custom call and gathers its ~64 MB dirs operand to "
            "one device — rebuild with fused=False "
            "(make_temporal_fitter_batched(..., fused=False))")
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
