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
    q = normalize([ |v0||v1| + v0·v1 , v0 × v1 ]) — including its
    antipodal pole: v0 = -v1 yields the zero quaternion and normalizes
    to NaN (the rotation axis is ambiguous). Callers whose vectors live
    in a known plane should build the rotation from the plane's axis and
    atan2 instead (see data/repr.py:local_markers_4chan heading removal).
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


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical linear interpolation between unit quaternions.

    Capability parity with `Quaternions.slerp` (utils/Quaternions.py:376-394):
    shortest-arc (flips q1 when the dot is negative), with the
    nearly-parallel case falling back to normalized lerp. `t` broadcasts
    against the batch shape.
    """
    t = jnp.asarray(t)[..., None]
    d = (q0 * q1).sum(-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    # clamp for acos; near-parallel -> lerp (sin(theta) ~ 0)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    near = sin_t < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_t))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_t))
    return qnormalize(w0 * q0 + w1 * q1)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions [..., 4] -> rotation matrices [..., 3, 3].

    Same map as `Quaternions.transforms` (utils/Quaternions.py:339-360).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4].

    Branch-free Shepperd's method (per-element `where` select of the four
    stability cases instead of the reference's data-dependent indexing in
    `Quaternions.from_transforms`, utils/Quaternions.py:424-455) so it
    jits/vmaps on TPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # four candidate decompositions; each is numerically good when its
    # pivot (under the sqrt) is the largest
    s0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 2.0
    c0 = mk(0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0)
    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 2.0
    c1 = mk((m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1)
    s2 = jnp.sqrt(jnp.clip(1.0 + m11 - m00 - m22, 1e-12, None)) * 2.0
    c2 = mk((m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2)
    s3 = jnp.sqrt(jnp.clip(1.0 + m22 - m00 - m11, 1e-12, None)) * 2.0
    c3 = mk((m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3)

    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    alt = jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3))
    q = jnp.where((tr > 0)[..., None], c0, alt)
    return qnormalize(q)


def to_euler(q: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """Unit quaternions -> intrinsic euler angles [..., 3].

    Covers the 'xyz' and 'yzx' orders the reference's
    `Quaternions.euler` implements (utils/Quaternions.py:311-330).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    if order == "xyz":
        ex = jnp.arctan2(2 * (x * w - y * z), 1 - 2 * (x * x + y * y))
        ey = jnp.arcsin(jnp.clip(2 * (x * z + y * w), -1, 1))
        ez = jnp.arctan2(2 * (z * w - x * y), 1 - 2 * (y * y + z * z))
        return jnp.stack([ex, ey, ez], axis=-1)
    if order == "yzx":
        # angles are returned in order-string order: [theta_y, theta_z, theta_x]
        ex = jnp.arctan2(2 * (x * w - z * y), 1 - 2 * (x * x + z * z))
        ey = jnp.arctan2(2 * (y * w - x * z), 1 - 2 * (y * y + z * z))
        ez = jnp.arcsin(jnp.clip(2 * (x * y + z * w), -1, 1))
        return jnp.stack([ey, ez, ex], axis=-1)
    raise NotImplementedError(f"euler order {order!r}")


def from_euler(e: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """Intrinsic euler angles [..., 3] -> unit quaternions.

    Parity with `Quaternions.from_euler` (utils/Quaternions.py:409-422):
    composes per-axis quaternions in the given order (world=False).
    """
    axes = {"x": jnp.array([1.0, 0.0, 0.0]),
            "y": jnp.array([0.0, 1.0, 0.0]),
            "z": jnp.array([0.0, 0.0, 1.0])}
    q = None
    for i, ax in enumerate(order):
        qi = from_angle_axis(e[..., i], jnp.broadcast_to(
            axes[ax], e.shape[:-1] + (3,)).astype(e.dtype))
        q = qi if q is None else qmul(q, qi)
    return q
