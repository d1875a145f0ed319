"""Quaternion helpers (Holden motion-processing conventions) in pure JAX.

Capability parity with the subset of `utils/Quaternions.py` and
`utils/Pivots.py` that the reference loaders and fitters actually use:
`Quaternions.between`, `from_angle_axis`, multiplication, vector rotation,
negation (conjugate), and `Pivots.from_quaternions` (y-heading extraction,
forward='z', plane='xz').

Layout: quaternions are arrays [..., 4] ordered (w, x, y, z). All ops are
vectorized and jit/vmap/scan friendly (no data-dependent branching).
"""

from __future__ import annotations

import jax.numpy as jnp


def qmul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q ⊗ r, both [..., 4] (broadcastable)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (inverse for unit quaternions); reference's ``-q``."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4].

    Equivalent to the reference's ``Quaternions * vectors``
    (`utils/Quaternions.py:109-112`: ``(q * (v_quat * -q)).imaginaries``),
    but computed with the expanded cross-product identity (cheaper on VPU).
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """angle [...] + axis [..., 3] -> quaternion [..., 4].

    Matches `Quaternions.from_angle_axis` (utils/Quaternions.py:402-407)
    including the 1e-10 axis-norm regularizer.
    """
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-10)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def between(v0: jnp.ndarray, v1: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating v0 into v1 (both [..., 3]).

    Matches `Quaternions.between` (utils/Quaternions.py:396-400):
    q = normalize([ |v0||v1| + v0·v1 , v0 × v1 ]).
    """
    a = jnp.cross(v0, v1)
    w = jnp.sqrt((v0**2).sum(-1) * (v1**2).sum(-1)) + (v0 * v1).sum(-1)
    q = jnp.concatenate([w[..., None], a], axis=-1)
    return qnormalize(q)


def pivot_from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Heading angle about +y: rotate forward=[0,0,1] by q, take
    arctan2(dir_x, dir_z).

    Matches `Pivots.from_quaternions(..., forward='z', plane='xz')`
    (utils/Pivots.py:78-88).
    """
    fwd = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., 2].set(1.0)
    d = qrot(q, fwd)
    return jnp.arctan2(d[..., 0], d[..., 2])


def qid(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion(s) with the given batch shape."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)
