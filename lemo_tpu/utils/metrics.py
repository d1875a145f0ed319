"""Quantitative evaluation metrics for fitted sequences.

The reference exposes the GT hooks (fitting loader returns world
transforms + GT smplx params, optimize_loader_amass_new.py:283-308) but
computes the paper's accuracy numbers offline. This module provides them
directly: global/local marker error, MPJPE, acceleration error, and
foot-skate measures.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def apply_world_transform(points: jnp.ndarray, transf: jnp.ndarray):
    """[..., 3] points through a [4, 4] homogeneous transform (the GT
    transform the fitting loader returns)."""
    return points @ transf[:3, :3].T + transf[:3, 3]


def marker_error(pred: jnp.ndarray, gt: jnp.ndarray) -> dict:
    """Mean / median / max Euclidean error over [..., M, 3] marker sets."""
    d = jnp.linalg.norm(pred - gt, axis=-1)
    return {"mean": float(d.mean()), "median": float(jnp.median(d)),
            "max": float(d.max())}


def mpjpe(pred_joints: jnp.ndarray, gt_joints: jnp.ndarray,
          align_root: bool = False) -> float:
    """Mean per-joint position error [T, J, 3]; optional root alignment."""
    if align_root:
        pred_joints = pred_joints - pred_joints[:, :1]
        gt_joints = gt_joints - gt_joints[:, :1]
    return float(jnp.linalg.norm(pred_joints - gt_joints, axis=-1).mean())


def accel_error(pred: jnp.ndarray, gt: jnp.ndarray, fps: float = 30.0):
    """Mean acceleration-magnitude difference — the temporal-smoothness
    accuracy measure used in motion-prior evaluations."""
    def accel(x):
        return (x[2:] - 2 * x[1:-1] + x[:-2]) * fps * fps

    return float(jnp.linalg.norm(accel(pred) - accel(gt), axis=-1).mean())


def foot_skate(verts: jnp.ndarray, contact_lbl: jnp.ndarray,
               foot_ids: dict, fps: float = 30.0,
               thresh: float = 0.1) -> float:
    """Fraction of labeled-contact foot-vertex frames whose speed exceeds
    `thresh` m/s (the artifact the friction losses suppress)."""
    vel = jnp.linalg.norm((verts[1:] - verts[:-1]) * fps, axis=-1)  # [T-1,V]
    total, skate = 0.0, 0.0
    for i, part in enumerate(["left_heel", "right_heel", "left_toe",
                              "right_toe"]):
        ids = jnp.asarray(np.asarray(foot_ids[part]))
        v = vel[:, ids]
        w = contact_lbl[:-1, i][:, None]
        skate += float(((v > thresh) * w).sum())
        total += float((jnp.ones_like(v) * w).sum())
    return skate / max(total, 1.0)
