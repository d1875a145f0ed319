"""Camera / body-translation initialization for PROX fitting.

Capability parity with the SMPLify-X init stage the reference carries:
`guess_init` (fitting_temp_slide.py:59-133 — depth estimate from 2D/3D
limb-length ratios) and `SMPLifyCameraInitLoss`
(fitting_temp_slide.py:1066-1123 — torso-keypoint + depth-regularized
translation fit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# torso edges used for the focal-length depth guess (main SMPLify-X
# convention: shoulders/hips in OpenPose numbering)
DEFAULT_EDGE_IDXS = ((5, 12), (2, 9))
# torso joints for the init loss (cmd_parser default init_joints_idxs)
DEFAULT_INIT_JOINTS = (9, 12, 2, 5)


def guess_init_depth(joints_3d: jnp.ndarray, joints_2d: jnp.ndarray,
                     focal_length: float = 5000.0,
                     edge_idxs=DEFAULT_EDGE_IDXS) -> jnp.ndarray:
    """Estimate camera/body depth from limb-length ratios.

    joints_3d [B, K, 3] (model joints at init pose), joints_2d [B, K, 2]
    detections. Returns init translation [B, 3] = (0, 0, f * h3d/h2d).
    """
    d3, d2 = [], []
    for a, b in edge_idxs:
        d3.append(joints_3d[:, a] - joints_3d[:, b])
        d2.append(joints_2d[:, a] - joints_2d[:, b])
    l3 = jnp.linalg.norm(jnp.stack(d3, 1), axis=-1).mean(axis=1)  # [B]
    l2 = jnp.linalg.norm(jnp.stack(d2, 1), axis=-1).mean(axis=1)
    est_d = focal_length * (l3 / jnp.maximum(l2, 1e-6))
    zeros = jnp.zeros_like(est_d)
    return jnp.stack([zeros, zeros, est_d], axis=1)


def camera_init_loss(proj_joints: jnp.ndarray, gt_joints: jnp.ndarray,
                     transl: jnp.ndarray,
                     trans_estimation: jnp.ndarray | None,
                     init_joints_idxs=DEFAULT_INIT_JOINTS,
                     data_weight: float = 1.0,
                     depth_loss_weight: float = 1e2) -> jnp.ndarray:
    """Torso-joint squared reprojection + depth regularization
    (SMPLifyCameraInitLoss.forward, camera_mode='fixed')."""
    idx = jnp.asarray(init_joints_idxs)
    err = (gt_joints[:, idx] - proj_joints[:, idx]) ** 2
    loss = err.sum() * data_weight ** 2
    if trans_estimation is not None:
        loss = loss + depth_loss_weight ** 2 * (
            (transl[:, 2] - trans_estimation[:, 2]) ** 2).sum()
    return loss


def fit_camera_init(forward_fn, consts, joint_mapper, camera,
                    init_params: dict, gt_joints: jnp.ndarray,
                    trans_estimation: jnp.ndarray | None = None,
                    num_steps: int = 30, lr: float = 0.01):
    """Optimize global translation/orientation against torso keypoints
    before the main fit. Returns updated {transl, global_orient}."""
    jm = jnp.asarray(joint_mapper)
    opt_vars = {"transl": init_params["transl"],
                "global_orient": init_params["global_orient"]}
    frozen = {k: v for k, v in init_params.items() if k not in opt_vars}

    def loss_fn(v):
        params = {**frozen, **v}
        out = forward_fn(params, consts)
        proj = camera.project(out["joints"][:, jm, :])
        return camera_init_loss(proj, gt_joints, v["transl"],
                                trans_estimation)

    opt = optax.adam(lr)

    @jax.jit
    def run(v):
        state = opt.init(v)

        def step(c, _):
            v, state = c
            loss, g = jax.value_and_grad(loss_fn)(v)
            u, state = opt.update(g, state, v)
            return (optax.apply_updates(v, u), state), loss

        (v, _), losses = jax.lax.scan(step, (v, state), None,
                                      length=num_steps)
        return v, losses

    return run(opt_vars)
