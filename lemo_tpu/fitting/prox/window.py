"""Sliding-window PROX fitting: one window = one jitted optimization.

Capability parity with fit_temp_loadprox_slide.py:53-706 — warm-start from
the previous stage's pkls, stage-weighted SMPLify loss, overlap-consistency
gradient freezing, per-frame pkl results — re-designed so the entire
900-step Adam fit runs as a single device computation.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import SmplxModel, make_forward_fn
from lemo_tpu.body_model import vposer as vp
from lemo_tpu.fitting.adam import piecewise_lr, run_adam
from lemo_tpu.fitting.prox.losses import ProxStatic, ProxWeights, \
    make_prox_loss, to_world


@dataclasses.dataclass
class WindowResult:
    params: dict[str, np.ndarray]       # optimized per-frame smplx params
    pose_embedding: np.ndarray          # [T, 32]
    body_pose: np.ndarray               # [T, 63]
    final_loss: float
    loss_history: np.ndarray
    term_history: dict[str, np.ndarray] | None = None  # per-step loss terms


def init_opt_vars(prox_params: dict[str, jnp.ndarray], T: int):
    """Warm-start optimization variables from PROXD/previous-stage params
    (fit_temp_loadprox_slide.py:494-505). Betas are averaged over the
    window and frozen (:497-498, :511)."""
    mean_betas = prox_params["betas"].mean(axis=0, keepdims=True)
    betas = jnp.broadcast_to(mean_betas, (T, mean_betas.shape[1]))
    opt_vars = {
        "transl": prox_params["transl"],
        "global_orient": prox_params["global_orient"],
        "left_hand_pose": prox_params["left_hand_pose"],
        "right_hand_pose": prox_params["right_hand_pose"],
        "jaw_pose": prox_params["jaw_pose"],
        "leye_pose": prox_params["leye_pose"],
        "reye_pose": prox_params["reye_pose"],
        "expression": prox_params["expression"],
        "pose_embedding": prox_params["pose_embedding"],
    }
    return opt_vars, betas


def overlap_grad_mask(T: int, first_window: bool, overlap_frac: float = 0.15):
    """Zero gradients of the first 15% of frames on non-first windows
    (fitting_temp_slide.py:283-289) so overlapped frames keep the previous
    window's solution."""
    erase_n = 0 if first_window else int(T * overlap_frac)
    frame_w = (jnp.arange(T) >= erase_n).astype(jnp.float32)

    def mask(grads):
        def apply(g):
            if g.ndim >= 1 and g.shape[0] == T:
                return g * frame_w.reshape((T,) + (1,) * (g.ndim - 1))
            return g
        return jax.tree_util.tree_map(apply, grads)

    return mask


def fit_window(
    model: SmplxModel,
    vposer_params: dict,
    joint_mapper: np.ndarray,
    static: ProxStatic,
    weights: ProxWeights,
    prox_params: dict[str, jnp.ndarray],
    first_window: bool,
    maxiters: int = 900,
    lr: float = 0.005,
) -> WindowResult:
    T = static.gt_joints.shape[0]
    fwd = make_forward_fn(model)
    opt_vars, betas = init_opt_vars(prox_params, T)

    loss_fn = make_prox_loss(fwd, model.consts, joint_mapper, vposer_params,
                             static, weights,
                             model.config.num_expressions)

    lr_table = piecewise_lr([(0, lr)], maxiters)
    gmask = overlap_grad_mask(T, first_window)

    @jax.jit
    def run(ov, betas):
        final, losses, terms = run_adam(
            lambda v: loss_fn(v, betas), ov, maxiters, lr_table,
            grad_mask=gmask, has_aux=True)
        return final, losses, terms

    final, losses, terms = run(opt_vars, betas)

    body_pose = vp.decode(vposer_params, final["pose_embedding"], "aa")
    params_np = {k: np.asarray(v) for k, v in final.items()
                 if k != "pose_embedding"}
    params_np["betas"] = np.asarray(betas)
    params_np["body_pose"] = np.asarray(body_pose)
    term_history = ({k: np.asarray(v) for k, v in terms.items()
                     if hasattr(v, "shape")}
                    if isinstance(terms, dict) else None)
    return WindowResult(
        params=params_np,
        pose_embedding=np.asarray(final["pose_embedding"]),
        body_pose=np.asarray(body_pose),
        final_loss=float(losses[-1]),
        loss_history=np.asarray(losses),
        term_history=term_history,
    )


def save_window_pkls(result: WindowResult, frame_names: list[str],
                     result_folder: str, person_id: int = 0,
                     camera_params: dict | None = None) -> list[str]:
    """Per-frame pkl results in the reference's exact output schema
    (fit_temp_loadprox_slide.py:577-594): each frame a dict of [1, ...]
    arrays keyed transl/global_orient/betas/body_pose/pose_embedding/
    left_hand_pose/.../expression (+ camera_*)."""
    paths = []
    for i, fn in enumerate(frame_names):
        rec: dict[str, Any] = {}
        if camera_params:
            for k, v in camera_params.items():
                rec[f"camera_{k}"] = np.asarray(v)[None]
        for k, v in result.params.items():
            rec[k] = v[i][None]
        rec["pose_embedding"] = result.pose_embedding[i][None]
        rec["body_pose"] = result.body_pose[i][None]
        folder = os.path.join(result_folder, fn)
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, f"{person_id:03d}.pkl")
        with open(path, "wb") as fh:
            pickle.dump(rec, fh, protocol=2)
        paths.append(path)
    return paths
