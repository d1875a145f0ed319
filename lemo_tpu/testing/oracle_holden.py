"""Independent numpy oracle for the Holden motion-image transform and the
global-trajectory reconstruction.

These re-derive the reference semantics of `utils/utils.py:184-265`
(`reconstruct_global_body`, `get_local_markers_4chan`) in plain numpy with
explicit quaternion formulas, sharing no code with either the reference's
`Quaternions`/`Pivots` classes or :mod:`lemo_tpu.data.repr` — they exist so
the JAX implementations can be pinned against an independent derivation of
the same math at production shapes (the golden `res_opt_amass_temp` layout:
[119, 72] params, [119, 4] contact labels, 67 SSM2 markers).

Conventions (z-up world in, z-up world out):
- y/z swap into (x, up, fwd) space, put-on-floor, reference-joint row;
- heading removal via the quaternion taking the smoothed forward direction
  to +z, pivot angles about +y measured as atan2(d_x, d_z);
- the 4-channel image stacks [local pose | contact] with broadcast root
  x/z velocity and heading angular velocity.
"""

from __future__ import annotations

import numpy as np


# --- quaternion helpers (w, x, y, z), vectorized over leading axes -------

def _q_normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _q_between(u, v):
    """Quaternion rotating vector(s) u onto v (shortest arc)."""
    w = (np.sqrt((u ** 2).sum(-1) * (v ** 2).sum(-1))
         + (u * v).sum(-1))[..., None]
    return _q_normalize(np.concatenate([w, np.cross(u, v)], axis=-1))


def _q_angle_axis(angle, axis):
    axis = np.asarray(axis, np.float64)
    axis = axis / (np.linalg.norm(axis) + 1e-10)
    half = np.asarray(angle, np.float64) / 2.0
    return np.concatenate([np.cos(half)[..., None],
                           np.sin(half)[..., None] * axis], axis=-1)


def _q_mul(a, b):
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def _q_rot(q, v):
    """Rotate [.., 3] vectors by [.., 4] quaternions (broadcasting)."""
    qv = q[..., 1:]
    t = 2.0 * np.cross(qv, v)
    return v + q[..., :1] * t + np.cross(qv, t)


def _pivot(q):
    """Heading angle about +y: where the quaternion sends +z, projected to
    the xz plane (atan2(d_x, d_z))."""
    d = _q_rot(q, np.broadcast_to(np.array([0.0, 0.0, 1.0]),
                                  q.shape[:-1] + (3,)))
    return np.arctan2(d[..., 0], d[..., 2])


# --- oracles --------------------------------------------------------------

def reconstruct_global_body_np(body_joints: np.ndarray,
                               rot_0_pivot: float) -> np.ndarray:
    """Sequentially integrate per-frame root motion back to world coords.

    body_joints: [T, 1+N+1, 3] — zero reference row, local pelvis+points,
    and a trailing global-trajectory row (vel_x, vel_y, rot_vel). Returns
    [T, N, 3] world z-up (leading reference row dropped), matching
    reference `reconstruct_global_body` (utils/utils.py:184-203).
    """
    body_joints = np.asarray(body_joints, np.float64)
    root = body_joints[:, -1]
    root_r, root_x, root_z = root[:, 2], root[:, 0], root[:, 1]
    body = body_joints[:, :-1][:, :, [0, 2, 1]].copy()  # (x, up, fwd)

    y = np.array([0.0, 1.0, 0.0])
    q = _q_angle_axis(-np.float64(rot_0_pivot), y)
    trans = np.zeros(3)
    out = np.empty_like(body)
    for i in range(body.shape[0]):
        f = _q_rot(q[None], body[i])
        f[:, 0] += trans[0]
        f[:, 2] += trans[2]
        out[i] = f
        q = _q_mul(_q_angle_axis(-root_r[i], y), q)
        trans = trans + _q_rot(q, np.array([root_x[i], 0.0, root_z[i]]))
    return out[:, :, [0, 2, 1]][:, 1:, :]


def get_local_markers_4chan_np(pelvis_and_markers: np.ndarray,
                               contact_lbls: np.ndarray,
                               smooth_forward: bool = False,
                               slots=(26, 56, 27, 57)):
    """Holden local 4-channel image from [T, 1+67, 3] z-up trajectories.

    Matches reference `get_local_markers_4chan` (utils/utils.py:209-265):
    returns (img [4, T-1, (1+67)*3+4], rot_0_pivot). `slots` are the
    (sdr_l, sdr_r, hip_l, hip_r) marker slot indices (0-based into the 67
    markers).
    """
    from scipy.ndimage import gaussian_filter1d

    body = np.asarray(pelvis_and_markers, np.float64)[:, :, [0, 2, 1]].copy()
    body[:, :, 1] -= body[:, :, 1].min()

    reference = body[:, 0] * np.array([1.0, 0.0, 1.0])
    body = np.concatenate([reference[:, None], body], axis=1)  # [T, 2+67, 3]

    velocity = (body[1:, 0:1] - body[:-1, 0:1]).copy()

    body[:, :, 0] -= body[:, 0:1, 0]
    body[:, :, 2] -= body[:, 0:1, 2]

    sdr_l, sdr_r, hip_l, hip_r = (s + 2 for s in slots)  # +ref +pelvis rows
    across = (body[:, sdr_r] - body[:, sdr_l]) + \
        (body[:, hip_r] - body[:, hip_l])
    across /= np.linalg.norm(across, axis=-1, keepdims=True)
    forward = np.cross(across, np.array([[0.0, 1.0, 0.0]]))
    if smooth_forward:
        forward = gaussian_filter1d(forward, 20, axis=0, mode="nearest")
    forward /= np.linalg.norm(forward, axis=-1, keepdims=True)

    target = np.broadcast_to(np.array([0.0, 0.0, 1.0]), forward.shape)
    rotation = _q_between(forward, target)          # [T, 4]
    body = _q_rot(rotation[:, None], body)

    velocity = _q_rot(rotation[1:, None], velocity)
    q_conj = rotation[:-1] * np.array([1.0, -1.0, -1.0, -1.0])
    rvelocity = _pivot(_q_mul(rotation[1:], q_conj))  # [T-1]
    rot_0_pivot = _pivot(rotation[0])

    body = body[:, :, [0, 2, 1]]
    local = body[:-1, 1:, :].reshape(body.shape[0] - 1, -1)

    chan_local = np.concatenate(
        [local, np.asarray(contact_lbls, np.float64)[:-1]], axis=-1)
    d = chan_local.shape[-1]
    Tm1 = chan_local.shape[0]
    gx = np.repeat(velocity[:, :, 0], d).reshape(Tm1, d)
    gy = np.repeat(velocity[:, :, 2], d).reshape(Tm1, d)
    gr = np.repeat(rvelocity[:, None], d).reshape(Tm1, d)
    img = np.stack([chan_local, gx, gy, gr], axis=0)
    return img, rot_0_pivot
