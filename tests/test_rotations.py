"""Rotation-math parity tests.

Ground truths come from scipy.spatial.transform.Rotation (independent
implementation), not from the reference repo.
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from lemo_tpu.ops import rotations as rot


RNG = np.random.RandomState(0)


def random_aa(n):
    v = RNG.randn(n, 3)
    # keep angles in (0, pi) to make axis-angle unique
    norm = np.linalg.norm(v, axis=1, keepdims=True)
    ang = RNG.uniform(0.05, np.pi - 0.05, (n, 1))
    return v / norm * ang


class TestAAMatrot:
    def test_matches_scipy(self):
        aa = random_aa(64)
        ours = np.asarray(rot.aa_to_matrot(jnp.asarray(aa, jnp.float32)))
        ref = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_zero_angle_safe(self):
        aa = jnp.zeros((4, 3), jnp.float32)
        m = rot.aa_to_matrot(aa)
        np.testing.assert_allclose(np.asarray(m), np.eye(3)[None].repeat(4, 0), atol=1e-5)
        # gradient finite at 0
        g = jax.grad(lambda a: rot.aa_to_matrot(a).sum())(aa)
        assert np.isfinite(np.asarray(g)).all()

    def test_roundtrip(self):
        aa = random_aa(128).astype(np.float32)
        m = rot.aa_to_matrot(jnp.asarray(aa))
        back = np.asarray(rot.matrot_to_aa(m))
        np.testing.assert_allclose(back, aa, atol=1e-4)


class TestQuat:
    def test_matrot_to_quat_matches_scipy(self):
        aa = random_aa(64)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        ours = np.asarray(rot.matrot_to_quat(jnp.asarray(m)))  # (w,x,y,z)
        ref = R.from_matrix(m).as_quat()  # (x,y,z,w)
        ref = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
        ref = ref * np.where(ref[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_near_pi_rotations(self):
        axes = np.eye(3)
        aa = axes * (np.pi - 1e-3)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        back = np.asarray(rot.matrot_to_aa(jnp.asarray(m)))
        ref = R.from_matrix(m).as_rotvec()
        # rotation-equivalent comparison
        np.testing.assert_allclose(
            R.from_rotvec(back).as_matrix(), R.from_rotvec(ref).as_matrix(), atol=1e-3
        )


class TestRot6D:
    def test_roundtrip_matrix(self):
        aa = random_aa(64)
        m = R.from_rotvec(aa).as_matrix().astype(np.float32)
        six = rot.matrot_to_rot6d(jnp.asarray(m))
        back = np.asarray(rot.rot6d_to_matrot(six))
        np.testing.assert_allclose(back, m, atol=1e-5)

    def test_gram_schmidt_projects_noise(self):
        x = jnp.asarray(RNG.randn(32, 6), jnp.float32)
        m = np.asarray(rot.rot6d_to_matrot(x))
        eye = np.einsum("nij,nkj->nik", m, m)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(32, 0), atol=1e-5)
        det = np.linalg.det(m)
        np.testing.assert_allclose(det, np.ones(32), atol=1e-5)

    def test_pack_unpack_params(self):
        x72 = RNG.randn(10, 72).astype(np.float32)
        x72[:, 3:6] = random_aa(10)
        x75 = rot.pack_params_6d(jnp.asarray(x72))
        assert x75.shape == (10, 75)
        back = np.asarray(rot.unpack_params_6d(x75))
        np.testing.assert_allclose(back[:, :3], x72[:, :3], atol=1e-6)
        np.testing.assert_allclose(back[:, 6:], x72[:, 6:], atol=1e-6)
        # rotation part round-trips as a rotation
        np.testing.assert_allclose(
            R.from_rotvec(back[:, 3:6]).as_matrix(),
            R.from_rotvec(x72[:, 3:6]).as_matrix(),
            atol=1e-4,
        )


class TestTransformMat:
    def test_homogeneous(self):
        m = R.from_rotvec(random_aa(8)).as_matrix().astype(np.float32)
        t = RNG.randn(8, 3).astype(np.float32)
        T = np.asarray(rot.transform_mat(jnp.asarray(m), jnp.asarray(t)))
        np.testing.assert_allclose(T[:, :3, :3], m, atol=1e-6)
        np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-6)
        np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=0)


class TestJitVmap:
    def test_jit_and_vmap_consistency(self):
        aa = jnp.asarray(random_aa(16).reshape(4, 4, 3), jnp.float32)
        direct = rot.aa_to_matrot(aa)
        vm = jax.vmap(rot.aa_to_matrot)(aa)
        jt = jax.jit(rot.aa_to_matrot)(aa)
        np.testing.assert_allclose(np.asarray(direct), np.asarray(vm), atol=1e-6)
        np.testing.assert_allclose(np.asarray(direct), np.asarray(jt), atol=1e-6)


class TestGradientsAtSingularities:
    """rot6d -> aa must have finite gradients at the identity rotation:
    a fit warm-started at exactly zero rotation otherwise NaNs on its
    first backward pass and the NaN guard silently freezes the whole fit
    (regression: quat_to_aa used linalg.norm, whose grad at 0 is NaN)."""

    def test_rot6d_to_aa_grad_at_identity(self):
        r6 = rot.aa_to_rot6d(jnp.zeros((2, 3)))
        g = jax.grad(lambda r: rot.rot6d_to_aa(r).sum())(r6)
        assert np.isfinite(np.asarray(g)).all()

    def test_rot6d_to_aa_grad_near_identity(self):
        for scale in (1e-6, 1e-3, 1e-1):
            aa = jnp.asarray(RNG.randn(4, 3) * scale, jnp.float32)
            g = jax.grad(lambda r: rot.rot6d_to_aa(r).sum())(
                rot.aa_to_rot6d(aa))
            assert np.isfinite(np.asarray(g)).all(), scale

    def test_matrot_to_aa_grad_at_pi_rotations(self):
        # 180-degree rotations exercise the non-w quaternion candidates
        aa = jnp.asarray(np.eye(3, dtype=np.float32) * np.pi)
        g = jax.grad(lambda a: rot.matrot_to_aa(
            rot.aa_to_matrot(a)).sum())(aa)
        assert np.isfinite(np.asarray(g)).all()

    def test_values_unchanged_by_guard(self):
        aa = jnp.asarray(random_aa(32), jnp.float32)
        back = np.asarray(rot.rot6d_to_aa(rot.aa_to_rot6d(aa)))
        np.testing.assert_allclose(
            R.from_rotvec(back).as_matrix(),
            R.from_rotvec(np.asarray(aa)).as_matrix(), atol=1e-4)
