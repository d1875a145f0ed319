"""Motion-image body representations, fully jittable.

Capability parity with the reference's representation builders, re-written
as pure JAX so they run on-device both during preprocessing and *inside*
fitting losses:

- frame-0 normalization (pelvis at origin, body facing +y)
  (train_loader_smooth.py:130-143)
- foot-contact labels from marker velocity + height
  (train_loader_infill.py:175-200, fitting_temp_slide.py:795-817)
- the Holden-style local 4-channel "motion image"
  (train_loader_infill.py:216-275, utils/utils.py:209-265)
- global trajectory reconstruction, a sequential scan over frames
  (utils/utils.py:184-203) — here a lax.scan

Conventions preserved exactly: the y/z swap into (x, up, fwd) space, the
put-on-floor shift, reference-joint trajectory, heading removal via
`between(forward, z)` quaternions, and pivot angles about +y.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lemo_tpu.data import markers as mk
from lemo_tpu.ops import quaternions as quat
from lemo_tpu.ops.signal import gaussian_filter1d_nearest


def frame0_normalizer(joints_frame0: jnp.ndarray):
    """Rotation/origin that puts frame-0 pelvis at the origin facing +y.

    joints_frame0: [J>=3, 3] first-frame joints (0 pelvis, 1/2 hips).
    Returns (transf_rotmat [3,3], origin [3]); apply as
    (x - origin) @ transf_rotmat. (train_loader_smooth.py:132-143)
    """
    x_axis = joints_frame0[2] - joints_frame0[1]
    x_axis = x_axis.at[-1].set(0.0)
    x_axis = x_axis / jnp.linalg.norm(x_axis)
    z_axis = jnp.array([0.0, 0.0, 1.0], joints_frame0.dtype)
    y_axis = jnp.cross(z_axis, x_axis)
    y_axis = y_axis / jnp.linalg.norm(y_axis)
    R = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    return R, joints_frame0[0]


def normalize_to_frame0(points: jnp.ndarray, joints_frame0: jnp.ndarray):
    """Apply the frame-0 normalizer to a [T, N, 3] trajectory."""
    R, origin = frame0_normalizer(joints_frame0)
    return jnp.matmul(points - origin, R)


def contact_labels_from_markers(markers: jnp.ndarray, fps: float = 30.0,
                                vel_thresh: float = 0.22,
                                z_margin: float = 0.10) -> jnp.ndarray:
    """Binary foot-contact labels [T, 4] (lheel, rheel, ltoe, rtoe).

    markers: [T, 67, 3] in a z-up frame. Velocity < 0.22 m/s AND height
    below min+0.10 m => contact; last frame uses the height criterion only
    (train_loader_infill.py:175-200).
    """
    feet = markers[:, mk.FOOT_MARKER_SLOTS, :]  # [T, 4, 3]
    vel = jnp.linalg.norm((feet[1:] - feet[:-1]) * fps, axis=-1)  # [T-1, 4]
    vel_contact = (jnp.abs(vel) < vel_thresh).astype(markers.dtype)
    vel_contact = jnp.concatenate(
        [vel_contact, jnp.zeros((1, 4), markers.dtype)], axis=0)  # [T, 4]

    z_thres = jnp.min(markers[:, :, -1]) + z_margin
    height_contact = (feet[:, :, 2] < z_thres).astype(markers.dtype)

    lbl = vel_contact * height_contact
    return lbl.at[-1].set(height_contact[-1])


def _forward_direction(body_xzy: jnp.ndarray, sdr_l, sdr_r, hip_l, hip_r,
                       smooth: bool, filterwidth: int = 20) -> jnp.ndarray:
    across = (body_xzy[:, sdr_r] - body_xzy[:, sdr_l]) + (
        body_xzy[:, hip_r] - body_xzy[:, hip_l])
    # norm clamps are exact no-ops for healthy bodies (‖across‖ ≈ 0.5 m)
    # and keep a degenerate frame finite instead of 0/0 -> NaN
    across = across / jnp.maximum(
        jnp.linalg.norm(across, axis=-1, keepdims=True), 1e-12)
    forward = jnp.cross(across, jnp.array([[0.0, 1.0, 0.0]], body_xzy.dtype))
    if smooth:
        forward = gaussian_filter1d_nearest(forward, float(filterwidth), axis=0)
    return forward / jnp.maximum(
        jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-12)


def local_markers_4chan(pelvis_and_markers: jnp.ndarray,
                        contact_lbls: jnp.ndarray,
                        smooth_forward: bool = False,
                        direction_slots: tuple | None = None):
    """Holden-style local 4-channel motion image.

    pelvis_and_markers: [T, 1+67, 3] in z-up world/frame-0 coords (row 0 is
    the pelvis joint); contact_lbls: [T, 4].

    Returns (img [4, T-1, d=(1+67)*3+4], rot_0_pivot scalar). Channel 0 is
    [local pose | contact labels]; channels 1-3 broadcast the root x/y
    velocity and heading angular velocity. Mirrors
    utils/utils.py:209-265 (`smooth_forward=False`, the in-loss/fit-loader
    variant) and train_loader_infill.py:216-275 (`smooth_forward=True`).
    """
    body = pelvis_and_markers[:, :, jnp.array([0, 2, 1])]  # y/z swap -> (x,z,y)

    # put on floor (axis 1 is now 'up')
    body = body.at[:, :, 1].add(-jnp.min(body[:, :, 1]))

    # add reference joint: pelvis projected to the floor plane
    reference = body[:, 0] * jnp.array([1.0, 0.0, 1.0], body.dtype)
    body = jnp.concatenate([reference[:, None], body], axis=1)  # [T, 2+67, 3]

    # root velocity in the floor plane
    velocity = body[1:, 0:1] - body[:-1, 0:1]  # [T-1, 1, 3]

    # to local coordinates
    body = body.at[:, :, 0].add(-body[:, 0:1, 0])
    body = body.at[:, :, 2].add(-body[:, 0:1, 2])

    # heading removal. `direction_slots` are shoulder/hip row indices into
    # the INPUT array (before the reference row is prepended); the marker
    # default is slot+1 for the pelvis row (train_loader_infill.py:234-237;
    # joint modes pass the joint indices directly).
    sdr_l, sdr_r, hip_l, hip_r = direction_slots or (
        mk.SDR_L + 1, mk.SDR_R + 1, mk.HIP_L + 1, mk.HIP_R + 1)
    fwd = _forward_direction(body, sdr_l + 1, sdr_r + 1,
                             hip_l + 1, hip_r + 1, smooth_forward)
    # forward = across x ŷ lies in the xz-plane, so the frame-alignment
    # rotation into target=ẑ is exactly a y-rotation by -atan2(f_x, f_z).
    # The reference builds it as Quaternions.between(forward, target)
    # (utils/utils.py:242-244), which is the SAME rotation but returns
    # NaN at the antipode forward = -ẑ (zero quaternion, normalized):
    # a body warm-started facing exactly -z — observed on TPU, where the
    # bf16 body forward lands on the pole that f32 CPU narrowly misses —
    # poisoned the whole window. atan2 is exact there (atan2(0,-1) = pi).
    theta = jnp.arctan2(fwd[:, 0], fwd[:, 2])
    rotation = quat.from_angle_axis(
        -theta, jnp.array([0.0, 1.0, 0.0], body.dtype))  # [T, 4]
    body = quat.qrot(rotation[:, None, :], body)

    velocity = quat.qrot(rotation[1:, None, :], velocity)  # [T-1, 1, 3]
    rvelocity = quat.pivot_from_quaternion(
        quat.qmul(rotation[1:], quat.qconj(rotation[:-1])))  # [T-1]
    rot_0_pivot = quat.pivot_from_quaternion(rotation[0])

    body = body[:, :, jnp.array([0, 2, 1])]  # swap back
    local = body[:-1, 1:, :].reshape(body.shape[0] - 1, -1)  # [T-1, (1+67)*3]

    chan_local = jnp.concatenate([local, contact_lbls[:-1]], axis=-1)  # [T-1, d]
    d = chan_local.shape[-1]
    gx = jnp.broadcast_to(velocity[:, :, 0], (velocity.shape[0], d))
    gy = jnp.broadcast_to(velocity[:, :, 2], (velocity.shape[0], d))
    gr = jnp.broadcast_to(rvelocity[:, None], (velocity.shape[0], d))
    img = jnp.stack([chan_local, gx, gy, gr], axis=0)  # [4, T-1, d]
    return img, rot_0_pivot


def local_markers_flat(pelvis_and_markers: jnp.ndarray,
                       contact_lbls: jnp.ndarray,
                       smooth_forward: bool = False):
    """Single-channel local representation [T-1, 3 + (1+67)*3 + 4]:
    [global vel x, y, rot vel | local pose | contact labels] — the
    'local_markers' body mode (train_loader_infill.py:261-264). Returns
    (flat image, rot_0_pivot)."""
    img4, rot0 = local_markers_4chan(pelvis_and_markers, contact_lbls,
                                     smooth_forward=smooth_forward)
    local_and_contact = img4[0]            # [T-1, d]
    gvel = jnp.stack([img4[1][:, 0], img4[2][:, 0], img4[3][:, 0]], axis=1)
    return jnp.concatenate([gvel, local_and_contact], axis=-1), rot0


def local_joint_image(joints: jnp.ndarray,
                      joints_frame0: jnp.ndarray) -> jnp.ndarray:
    """[T, K, 3] joints -> pelvis-relative flat image [T, K*3]
    (mode='local_joints', train_loader_smooth.py:158-162)."""
    j = normalize_to_frame0(joints, joints_frame0)
    rel = j.at[:, 1:].add(-j[:, 0:1])
    return rel.reshape(rel.shape[0], -1)


def global_marker_image(markers: jnp.ndarray,
                        joints_frame0: jnp.ndarray) -> jnp.ndarray:
    """[T, n, 3] markers -> frame-0-normalized flat clip image [T, n*3]
    (the smoothness-prior representation, train_loader_smooth.py:164-167).
    """
    m = normalize_to_frame0(markers, joints_frame0)
    return m.reshape(m.shape[0], -1)


@partial(jax.jit, static_argnames=())
def reconstruct_global_body(body_joints: jnp.ndarray,
                            rot_0_pivot: jnp.ndarray) -> jnp.ndarray:
    """Integrate per-frame root motion back to world coordinates.

    body_joints: [T, 1+N+1, 3] = zero row + local(pelvis+markers) + global
    trajectory row (vel_x, vel_y, rot_vel broadcast) — the exact layout the
    fitters assemble before calling the reference
    `reconstruct_global_body` (utils/utils.py:184-203). Returns
    [T, N+1, 3] (drops the leading zero row), z-up.

    The frame loop is a lax.scan carrying (heading quaternion, planar
    translation).
    """
    root_traj = body_joints[:, -1]  # [T, 3]
    root_r, root_x, root_z = root_traj[:, 2], root_traj[:, 0], root_traj[:, 1]
    body = body_joints[:, :-1]  # [T, 1+N, 3]
    body = body[:, :, jnp.array([0, 2, 1])]  # y/z swap

    y_axis = jnp.array([0.0, 1.0, 0.0], body.dtype)
    q0 = quat.from_angle_axis(-rot_0_pivot.reshape(()), y_axis)

    def step(carry, inp):
        rotation, translation = carry
        frame, r_i, x_i, z_i = inp
        out = quat.qrot(rotation[None, :], frame)
        out = out.at[:, 0].add(translation[0])
        out = out.at[:, 2].add(translation[2])
        rotation = quat.qmul(quat.from_angle_axis(-r_i, y_axis), rotation)
        step_vec = quat.qrot(rotation[None, :],
                             jnp.stack([x_i, jnp.zeros_like(x_i), z_i])[None])[0]
        translation = translation + step_vec
        return (rotation, translation), out

    init = (q0, jnp.zeros(3, body.dtype))
    _, out = jax.lax.scan(step, init, (body, root_r, root_x, root_z))
    out = out[:, :, jnp.array([0, 2, 1])]  # swap back
    return out[:, 1:, :]
