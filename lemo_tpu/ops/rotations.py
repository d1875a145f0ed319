"""Rotation representation conversions as pure JAX functions.

Capability parity with the reference stack's rotation utilities
(`utils/utils.py:50-137` ContinousRotReprDecoder / convert_to_6D_rot /
convert_to_3D_rot, and `human_body_prior/body_model/lbs.py:166-205`
batch_rodrigues / transform_mat) — re-derived from the math, written for
XLA: everything is shape-polymorphic over a single leading batch axis,
branch-free, and differentiable (guarded for the zero-angle singularity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def aa_to_matrot(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3] (Rodrigues).

    Matches the reference `batch_rodrigues` (lbs.py:166-193) including its
    `norm(aa + 1e-8)` regularization so converted checkpoints and fitted
    parameters round-trip identically.
    """
    batch_shape = aa.shape[:-1]
    aa = aa.reshape(-1, 3)
    angle = jnp.linalg.norm(aa + _EPS, axis=1, keepdims=True)  # [N, 1]
    rot_dir = aa / angle

    cos = jnp.cos(angle)[:, None]  # [N, 1, 1]
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=aa.dtype)[None]
    rot = ident + sin * K + (1.0 - cos) * jnp.matmul(
        K, K, precision=jax.lax.Precision.HIGHEST)
    # HIGHEST: bf16 K@K puts ~0.4% error on rotation entries, which is
    # millimeters once applied to meter-scale geometry
    return rot.reshape(*batch_shape, 3, 3)


def aa_to_matrot_planes(p: jnp.ndarray) -> jnp.ndarray:
    """Plane-major Rodrigues: axis-angle planes [3, J, B] -> rotation
    planes [9, J, B] (row k = 3m+n holds R[m, n]).

    Algebraically identical to :func:`aa_to_matrot` (same `aa + 1e-8`
    regularization; K^2 written in its closed form r r^T - I for unit r),
    expressed as pure elementwise ops on the planes so XLA fuses the
    whole conversion into the surrounding plane-layout pipeline — no
    [B, J, 3, 3] intermediate, no transposes (the fused LBS path,
    lbs._lbs_fused)."""
    x = p[0] + _EPS
    y = p[1] + _EPS
    z = p[2] + _EPS
    angle = jnp.sqrt(x * x + y * y + z * z)
    rx, ry, rz = x / angle, y / angle, z / angle
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    C = 1.0 - c
    return jnp.stack([
        c + C * rx * rx, -s * rz + C * rx * ry, s * ry + C * rx * rz,
        s * rz + C * rx * ry, c + C * ry * ry, -s * rx + C * ry * rz,
        -s * ry + C * rx * rz, s * rx + C * ry * rz, c + C * rz * rz,
    ])


def matrot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4] (w, x, y, z).

    Branchless Shepperd-style conversion: computes all four candidate
    solutions and selects the numerically safest by largest diagonal
    combination, which keeps gradients finite everywhere.
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]

    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate built from w
    w_w = _safe_sqrt(qw2) * 0.5
    q_w = jnp.stack(
        [4 * w_w**2, m21 - m12, m02 - m20, m10 - m01], axis=1
    ) / (4.0 * w_w[:, None])
    q_w = q_w.at[:, 0].set(w_w)
    # candidate built from x
    x_x = _safe_sqrt(qx2) * 0.5
    q_x = jnp.stack(
        [m21 - m12, 4 * x_x**2, m01 + m10, m02 + m20], axis=1
    ) / (4.0 * x_x[:, None])
    q_x = q_x.at[:, 1].set(x_x)
    # candidate built from y
    y_y = _safe_sqrt(qy2) * 0.5
    q_y = jnp.stack(
        [m02 - m20, m01 + m10, 4 * y_y**2, m12 + m21], axis=1
    ) / (4.0 * y_y[:, None])
    q_y = q_y.at[:, 2].set(y_y)
    # candidate built from z
    z_z = _safe_sqrt(qz2) * 0.5
    q_z = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, 4 * z_z**2], axis=1
    ) / (4.0 * z_z[:, None])
    q_z = q_z.at[:, 3].set(z_z)

    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=1)  # [N, 4]
    choice = jnp.argmax(scores, axis=1)  # [N]
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=1)  # [N, 4, 4]
    q = jnp.take_along_axis(cands, choice[:, None, None].repeat(4, -1), axis=1)[
        :, 0
    ]
    # canonical sign: w >= 0
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return q.reshape(*batch_shape, 4)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions [..., 4] (w, x, y, z) -> axis-angle [..., 3]."""
    batch_shape = q.shape[:-1]
    q = q.reshape(-1, 4)
    w = jnp.clip(q[:, 0], -1.0, 1.0)
    xyz = q[:, 1:]
    # sqrt(x + eps) form, NOT linalg.norm: d norm/d xyz at the identity
    # rotation (xyz == 0) is 0/0 = NaN, and a NaN here survives the
    # where() below via the chain rule — a fit warm-started at exactly
    # zero rotation would freeze on its first step (NaN guard).
    sin_half = jnp.sqrt((xyz ** 2).sum(axis=1) + 1e-24)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < _EPS, 2.0, angle / jnp.maximum(sin_half, _EPS))
    return (xyz * scale[:, None]).reshape(*batch_shape, 3)


def matrot_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> axis-angle [..., 3].

    Same route (matrix -> quaternion -> axis-angle) as the reference's
    torchgeometry-based `ContinousRotReprDecoder.matrot2aa`
    (utils/utils.py:73-81).
    """
    return quat_to_aa(matrot_to_quat(R))


def rot6d_to_matrot(x: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6-D rotation representation [..., 6] -> matrices [..., 3, 3].

    Gram-Schmidt construction, matching `ContinousRotReprDecoder.decode`
    (utils/utils.py:63-70): the 6 numbers are the first two COLUMNS of the
    rotation matrix, stored row-interleaved (i.e. reshape(-1, 3, 2)).
    """
    batch_shape = x.shape[:-1]
    m = x.reshape(-1, 3, 2)
    a1, a2 = m[:, :, 0], m[:, :, 1]
    # sqrt(x + eps) norms: linalg.norm has a NaN gradient at 0, which a
    # degenerate 6-D input would propagate even through the division guard
    b1 = a1 / jnp.sqrt((a1 ** 2).sum(axis=1, keepdims=True) + 1e-24)
    dot = jnp.sum(b1 * a2, axis=1, keepdims=True)
    b2u = a2 - dot * b1
    b2 = b2u / jnp.sqrt((b2u ** 2).sum(axis=1, keepdims=True) + 1e-24)
    b3 = jnp.cross(b1, b2)
    R = jnp.stack([b1, b2, b3], axis=-1)  # columns
    return R.reshape(*batch_shape, 3, 3)


def matrot_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> 6-D representation [..., 6].

    Takes the first two columns (matches `convert_to_6D_rot`,
    utils/utils.py:94-107: `xr_mat[:, :, :-1].reshape([-1, 6])`).
    """
    batch_shape = R.shape[:-2]
    return R.reshape(*batch_shape, 9)[..., jnp.array([0, 1, 3, 4, 6, 7])]


def aa_to_rot6d(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> 6-D representation [..., 6]."""
    return matrot_to_rot6d(aa_to_matrot(aa))


def rot6d_to_aa(x: jnp.ndarray) -> jnp.ndarray:
    """6-D representation [..., 6] -> axis-angle [..., 3]."""
    return matrot_to_aa(rot6d_to_matrot(x))


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotation [..., 3, 3] + translation [..., 3] -> homogeneous [..., 4, 4].

    Equivalent of smplx `transform_mat` (reference lbs.py:196-205).
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    t = t.reshape(-1, 3, 1)
    top = jnp.concatenate([R, t], axis=2)  # [N, 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype)[None, None, :],
        (R.shape[0], 1, 4),
    )
    T = jnp.concatenate([top, bottom], axis=1)
    return T.reshape(*batch_shape, 4, 4)


def pack_params_6d(x72: jnp.ndarray) -> jnp.ndarray:
    """[T, 72] body params (transl3 + aa-rot3 + rest) -> [T, 75] with 6-D rot.

    Equivalent of `convert_to_6D_rot` (utils/utils.py:94-107).
    """
    xt, xr, xb = x72[:, :3], x72[:, 3:6], x72[:, 6:]
    return jnp.concatenate([xt, aa_to_rot6d(xr), xb], axis=-1)


def unpack_params_6d(x75: jnp.ndarray) -> jnp.ndarray:
    """[T, 75] (transl3 + rot6d + rest) -> [T, 72] with axis-angle rot.

    Equivalent of `convert_to_3D_rot` (utils/utils.py:111-123).
    """
    xt, xr, xb = x75[:, :3], x75[:, 3:9], x75[:, 9:]
    return jnp.concatenate([xt, rot6d_to_aa(xr), xb], axis=-1)


def rotate_by_matrix(points: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Apply [3, 3] rotation to [..., 3] points (right-multiply convention
    `p @ R` used throughout the reference for frame-0 normalization)."""
    return jnp.matmul(points, R)


batched_aa_to_matrot = jax.vmap(aa_to_matrot)
