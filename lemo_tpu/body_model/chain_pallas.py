"""Kinematic-chain composition as a single Pallas TPU kernel.

The chain is the latency anchor of the SMPL-X forward: ~1.2 ms of a
~4.3 ms Stage-2 optimizer step (fwd+bwd, B=100, v5e) for ~0.4 MFLOP of
actual math. In XLA it is ~50-150 small HLO ops (level-parallel
selections + composes and their transposes) whose per-op overhead —
not their FLOPs — sets the cost: A/Bs showed the time is invariant to
op COUNT (packed-affine halves the einsums, measures the same) and to
STRUCTURE (the serial 54-step walk matches the 12-level schedule).
Inside ONE Pallas program the same serial walk is ~2k VPU instructions
on [1, B] rows with no op dispatch between them.

Layout: rotation/translation PLANES [9, Jp, B] / [3, Jp, B] — joints on
sublanes (one row per joint), batch on lanes, padded to a multiple of
128 (wider batches simply span multiple lane tiles). All buffers are a
few hundred KB — everything lives in VMEM.

The wrapper `rigid_transform_chain_pallas` matches
`lbs.rigid_transform_chain_level` exactly (same contract, f32) and is
differentiable via a custom VJP whose backward is the reverse-order
sweep in a second kernel:

    forward:   G[j] = G[p] @ L[j]         (affine compose)
    backward:  dL[j]   = G[p]^T dG[j]
               dG[p]  += dG[j] L[j]^T  (+ dt outer terms)

Reference semantics: human_body_prior/body_model/lbs.py:208-263
(batch_rigid_transform)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on the CPU test mesh
    return jax.default_backend() != "tpu"


def _fwd_kernel(parents_ref, rl_ref, tl_ref, rg_ref, tg_ref):
    """Serial chain walk. rl/rg: [9, Jp, B]; tl/tg: [3, Jp, B];
    parents: SMEM [Jp] int32. Row j of plane 3*m+n holds R[m, n] for
    joint j across the batch lanes."""
    J = parents_ref.shape[0]

    # root: G[0] = L[0]
    for k in range(9):
        rg_ref[k, 0:1, :] = rl_ref[k, 0:1, :]
    for k in range(3):
        tg_ref[k, 0:1, :] = tl_ref[k, 0:1, :]

    def body(j, _):
        p = parents_ref[j]
        # G[j] = G[p] @ L[j]; t_g[j] = R_g[p] @ t_l[j] + t_g[p]
        gp = [rg_ref[k, pl.ds(p, 1), :] for k in range(9)]      # [1, B] x9
        lj = [rl_ref[k, pl.ds(j, 1), :] for k in range(9)]
        tj = [tl_ref[k, pl.ds(j, 1), :] for k in range(3)]
        tp = [tg_ref[k, pl.ds(p, 1), :] for k in range(3)]
        for m in range(3):
            for n in range(3):
                acc = gp[3 * m + 0] * lj[0 + n]
                acc += gp[3 * m + 1] * lj[3 + n]
                acc += gp[3 * m + 2] * lj[6 + n]
                rg_ref[3 * m + n, pl.ds(j, 1), :] = acc
        for m in range(3):
            acc = gp[3 * m + 0] * tj[0] + gp[3 * m + 1] * tj[1] \
                + gp[3 * m + 2] * tj[2] + tp[m]
            tg_ref[m, pl.ds(j, 1), :] = acc
        return 0

    jax.lax.fori_loop(1, J, body, 0)


def _bwd_kernel(parents_ref, rl_ref, tl_ref, rg_ref, drg_in_ref,
                dtg_in_ref, drl_ref, dtl_ref, sg_ref, st_ref):
    """Reverse sweep. The incoming cotangents are copied into VMEM
    scratch (sg/st) and accumulated there with child contributions
    (children are processed before parents because parents[j] < j)."""
    J = parents_ref.shape[0]
    sg_ref[:] = drg_in_ref[:]
    st_ref[:] = dtg_in_ref[:]

    def body(i, _):
        j = J - 1 - i            # walk j = J-1 .. 1

        p = parents_ref[j]
        gp = [rg_ref[k, pl.ds(p, 1), :] for k in range(9)]
        lj = [rl_ref[k, pl.ds(j, 1), :] for k in range(9)]
        tj = [tl_ref[k, pl.ds(j, 1), :] for k in range(3)]
        dgj = [sg_ref[k, pl.ds(j, 1), :] for k in range(9)]
        dtj = [st_ref[k, pl.ds(j, 1), :] for k in range(3)]

        # dL[j] = G[p]^T dG[j]
        for m in range(3):
            for n in range(3):
                acc = gp[0 + m] * dgj[0 + n]
                acc += gp[3 + m] * dgj[3 + n]
                acc += gp[6 + m] * dgj[6 + n]
                drl_ref[3 * m + n, pl.ds(j, 1), :] = acc
        # dt_l[j] = R_g[p]^T dt_g[j]
        for m in range(3):
            acc = gp[0 + m] * dtj[0] + gp[3 + m] * dtj[1] \
                + gp[6 + m] * dtj[2]
            dtl_ref[m, pl.ds(j, 1), :] = acc
        # dG[p] += dG[j] L[j]^T + dt_g[j] (x) t_l[j]
        for m in range(3):
            for n in range(3):
                acc = dgj[3 * m + 0] * lj[3 * n + 0]
                acc += dgj[3 * m + 1] * lj[3 * n + 1]
                acc += dgj[3 * m + 2] * lj[3 * n + 2]
                acc += dtj[m] * tj[n]
                sg_ref[3 * m + n, pl.ds(p, 1), :] = \
                    sg_ref[3 * m + n, pl.ds(p, 1), :] + acc
        # dt_g[p] += dt_g[j]
        for m in range(3):
            st_ref[m, pl.ds(p, 1), :] = \
                st_ref[m, pl.ds(p, 1), :] + dtj[m]
        return 0

    jax.lax.fori_loop(0, J - 1, body, 0)
    # root: dL[0] = dG[0], dt_l[0] = dt_g[0]
    for k in range(9):
        drl_ref[k, 0:1, :] = sg_ref[k, 0:1, :]
    for k in range(3):
        dtl_ref[k, 0:1, :] = st_ref[k, 0:1, :]


def _pad_to(x, mult):
    return (-x) % mult


# lane-axis (frame-batch) tile: the folded window-parallel fitter pushes
# W*T frames through one forward — unblocked, the backward's VMEM refs +
# scratch scale with B (~38 MB at B≈3k). Each B-block is independent
# (the bwd scratch is re-initialized from the inputs every grid step).
TILE_B = 512


def _tb(B: int) -> int:
    return TILE_B if B % TILE_B == 0 else 128


def _chain_fwd_call(rl, tl, parents_arr):
    Jp, B = rl.shape[1], rl.shape[2]
    tb = _tb(B)
    vspec = lambda c: pl.BlockSpec((c, Jp, tb), lambda b: (0, 0, b))  # noqa: E731
    rg, tg = pl.pallas_call(
        _fwd_kernel,
        grid=(B // tb,),
        out_shape=(jax.ShapeDtypeStruct((9, Jp, B), rl.dtype),
                   jax.ShapeDtypeStruct((3, Jp, B), rl.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vspec(9), vspec(3)],
        out_specs=(vspec(9), vspec(3)),
        interpret=_interpret(),
    )(parents_arr, rl, tl)
    return rg, tg


def _chain_bwd_call(rl, tl, rg, drg, dtg, parents_arr):
    Jp, B = rl.shape[1], rl.shape[2]
    tb = _tb(B)
    vspec = lambda c: pl.BlockSpec((c, Jp, tb), lambda b: (0, 0, b))  # noqa: E731
    drl, dtl = pl.pallas_call(
        _bwd_kernel,
        grid=(B // tb,),
        out_shape=(jax.ShapeDtypeStruct((9, Jp, B), rl.dtype),
                   jax.ShapeDtypeStruct((3, Jp, B), rl.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vspec(9), vspec(3), vspec(9), vspec(9), vspec(3)],
        out_specs=(vspec(9), vspec(3)),
        scratch_shapes=[pltpu.VMEM((9, Jp, tb), rl.dtype),
                        pltpu.VMEM((3, Jp, tb), rl.dtype)],
        interpret=_interpret(),
    )(parents_arr, rl, tl, rg, drg, dtg)
    return drl, dtl


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chain_planes(rl, tl, parents_tuple):
    """(R_l, t_l) planes [9/3, Jp, B] -> (R_g, t_g) planes."""
    parents_arr = jnp.asarray(np.asarray(parents_tuple, np.int32))
    return _chain_fwd_call(rl, tl, parents_arr)


def _chain_planes_fwd(rl, tl, parents_tuple):
    parents_arr = jnp.asarray(np.asarray(parents_tuple, np.int32))
    rg, tg = _chain_fwd_call(rl, tl, parents_arr)
    return (rg, tg), (rl, tl, rg)


def _chain_planes_bwd(parents_tuple, res, cts):
    rl, tl, rg = res
    drg, dtg = cts
    parents_arr = jnp.asarray(np.asarray(parents_tuple, np.int32))
    drl, dtl = _chain_bwd_call(rl, tl, rg, drg, dtg, parents_arr)
    return drl, dtl


_chain_planes.defvjp(_chain_planes_fwd, _chain_planes_bwd)


def rigid_transform_chain_pallas(rot_mats, joints, parents):
    """Drop-in replacement for lbs.rigid_transform_chain_level.

    rot_mats [B, J, 3, 3], joints [B, J, 3], parents static ints
    (parents[j] < j required — true for every SMPL-family topology).
    Returns (posed_joints [B, J, 3], rel [B, J, 3, 4])."""
    B, J = joints.shape[0], joints.shape[1]
    parents = np.asarray(parents, np.int64)
    if J > 1 and not (parents[1:] < np.arange(1, J)).all():
        # fall back for exotic topologies
        from lemo_tpu.body_model.lbs import rigid_transform_chain_level
        return rigid_transform_chain_level(rot_mats, joints, parents)

    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    jpad = _pad_to(J, 8)
    bpad = _pad_to(B, LANE)
    Jp, Bp = J + jpad, B + bpad
    parents_padded = np.concatenate(
        [parents.astype(np.int32), np.zeros(jpad, np.int32)])

    # planes: [B, J, 3, 3] -> [3, 3, J, B] -> [9, Jp, Bp]
    rl = jnp.transpose(rot_mats, (2, 3, 1, 0)).reshape(9, J, B)
    tl = jnp.transpose(rel_joints, (2, 1, 0))                    # [3, J, B]
    rl = jnp.pad(rl, ((0, 0), (0, jpad), (0, bpad)))
    tl = jnp.pad(tl, ((0, 0), (0, jpad), (0, bpad)))

    rg, tg = _chain_planes(rl, tl, tuple(int(p) for p in parents_padded))

    Rg = jnp.transpose(rg[:, :J, :B].reshape(3, 3, J, B), (3, 2, 0, 1))
    tg_ = jnp.transpose(tg[:, :J, :B], (2, 1, 0))                # [B, J, 3]

    posed_joints = tg_
    rel_t = tg_ - jnp.einsum("bjmn,bjn->bjm", Rg, joints,
                             precision=jax.lax.Precision.HIGHEST)
    rel = jnp.concatenate([Rg, rel_t[..., None]], axis=-1)
    return posed_joints, rel
