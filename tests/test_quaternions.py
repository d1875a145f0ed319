"""Quaternion helper tests vs scipy ground truth."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from lemo_tpu.ops import quaternions as q

RNG = np.random.RandomState(1)


def _scipy_q(n):
    quat = R.random(n, random_state=RNG).as_quat()  # (x,y,z,w)
    return np.concatenate([quat[:, 3:], quat[:, :3]], axis=1)  # (w,x,y,z)


def test_qmul_matches_scipy():
    a, b = _scipy_q(32), _scipy_q(32)
    ours = np.asarray(q.qmul(jnp.asarray(a), jnp.asarray(b)))
    ra = R.from_quat(np.concatenate([a[:, 1:], a[:, :1]], 1))
    rb = R.from_quat(np.concatenate([b[:, 1:], b[:, :1]], 1))
    ref = (ra * rb).as_quat()
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], 1)
    # sign-insensitive comparison
    sign = np.sign(np.sum(ours * ref, axis=1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-6)


def test_qrot_matches_scipy():
    a = _scipy_q(32)
    v = RNG.randn(32, 3)
    ours = np.asarray(q.qrot(jnp.asarray(a), jnp.asarray(v)))
    ref = R.from_quat(np.concatenate([a[:, 1:], a[:, :1]], 1)).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_between_rotates_v0_to_v1():
    v0 = RNG.randn(64, 3)
    v1 = RNG.randn(64, 3)
    quat = q.between(jnp.asarray(v0), jnp.asarray(v1))
    out = np.asarray(q.qrot(quat, jnp.asarray(v0 / np.linalg.norm(v0, axis=1, keepdims=True))))
    ref = v1 / np.linalg.norm(v1, axis=1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_from_angle_axis_matches_scipy():
    ang = RNG.uniform(-np.pi, np.pi, 32)
    axis = RNG.randn(32, 3)
    ours = np.asarray(q.from_angle_axis(jnp.asarray(ang), jnp.asarray(axis)))
    rv = axis / np.linalg.norm(axis, axis=1, keepdims=True) * ang[:, None]
    ref = R.from_rotvec(rv).as_quat()
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], 1)
    sign = np.sign(np.sum(ours * ref, axis=1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-6)


def test_pivot_heading():
    # rotation by angle theta about +y maps z->(sin, 0, cos): pivot == theta
    theta = RNG.uniform(-np.pi, np.pi, 16)
    quat = q.from_angle_axis(jnp.asarray(theta), jnp.asarray(np.tile([0.0, 1.0, 0.0], (16, 1))))
    piv = np.asarray(q.pivot_from_quaternion(quat))
    np.testing.assert_allclose(piv, theta, atol=1e-5)


def test_conj_inverts():
    a = _scipy_q(16)
    out = np.asarray(q.qmul(jnp.asarray(a), q.qconj(jnp.asarray(a))))
    ident = np.tile([1.0, 0, 0, 0], (16, 1))
    np.testing.assert_allclose(out, ident, atol=1e-6)


def test_slerp_matches_scipy():
    from scipy.spatial.transform import Slerp
    a, b = _scipy_q(16), _scipy_q(16)
    t = 0.37
    ours = np.asarray(q.slerp(jnp.asarray(a), jnp.asarray(b), t))
    for i in range(16):
        key = R.from_quat(np.stack([
            np.concatenate([a[i, 1:], a[i, :1]]),
            np.concatenate([b[i, 1:], b[i, :1]])]))
        ref = Slerp([0.0, 1.0], key)([t]).as_quat()[0]
        ref = np.concatenate([ref[3:], ref[:3]])
        sign = np.sign(np.sum(ours[i] * ref))
        np.testing.assert_allclose(ours[i], ref * sign, atol=1e-5)


def test_slerp_endpoints_and_parallel():
    a = _scipy_q(8)
    np.testing.assert_allclose(np.asarray(q.slerp(a, a, 0.5)), a, atol=1e-6)
    out0 = np.asarray(q.slerp(a, _scipy_q(8), 0.0))
    sign = np.sign(np.sum(out0 * a, axis=1, keepdims=True))
    np.testing.assert_allclose(out0 * sign, a, atol=1e-6)


def test_matrix_roundtrip_matches_scipy():
    a = _scipy_q(64)
    m = np.asarray(q.to_matrix(jnp.asarray(a)))
    ref = R.from_quat(np.concatenate([a[:, 1:], a[:, :1]], 1)).as_matrix()
    np.testing.assert_allclose(m, ref, atol=1e-6)
    back = np.asarray(q.from_matrix(jnp.asarray(m)))
    sign = np.sign(np.sum(back * a, axis=1, keepdims=True))
    np.testing.assert_allclose(back * sign, a, atol=1e-5)


def test_euler_roundtrip():
    for order in ("xyz", "yzx"):
        a = _scipy_q(64)
        e = np.asarray(q.to_euler(jnp.asarray(a), order))
        back = np.asarray(q.from_euler(jnp.asarray(e), order))
        sign = np.sign(np.sum(back * a, axis=1, keepdims=True))
        np.testing.assert_allclose(back * sign, a, atol=1e-5)


def test_from_euler_matches_scipy_intrinsic():
    e = RNG.uniform(-np.pi, np.pi, (32, 3))
    ours = np.asarray(q.from_euler(jnp.asarray(e), "xyz"))
    ref = R.from_euler("XYZ", e).as_quat()
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], 1)
    sign = np.sign(np.sum(ours * ref, axis=1, keepdims=True))
    np.testing.assert_allclose(ours, ref * sign, atol=1e-6)
