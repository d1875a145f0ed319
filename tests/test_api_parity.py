"""API-parity pieces: BodyModel wrapper, camera init, representation
modes, LocalFlatStats."""

import numpy as np
import jax.numpy as jnp
import pytest

from lemo_tpu.body_model.body_model_api import BodyModel, BodyModelWithPoser
from lemo_tpu.data import amass
from lemo_tpu.data.stats import LocalFlatStats
from lemo_tpu.fitting.prox import camera_init as ci
from lemo_tpu.fitting.prox.camera import PerspectiveCamera
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(55)


@pytest.fixture(scope="module")
def md():
    return synthetic_smplx_npz(num_verts=300, seed=6)


class TestBodyModelAPI:
    def test_forward_surface(self, md):
        bm = BodyModel(md, batch_size=2)
        out = bm()
        assert out.v.shape == (2, 300, 3)
        assert out.Jtr.shape == (2, 55, 3)
        assert out.full_pose.shape == (2, 165)
        assert out.f.shape[1] == 3

    def test_named_params(self, md):
        bm = BodyModel(md)
        out = bm(trans=jnp.asarray([[1.0, 0, 0]]),
                 root_orient=jnp.asarray([[0.0, 0, 0.5]]),
                 pose_body=jnp.asarray(RNG.randn(1, 63) * 0.1, jnp.float32),
                 pose_hand=jnp.asarray(RNG.randn(1, 90) * 0.1, jnp.float32),
                 betas=jnp.asarray(RNG.randn(1, 10) * 0.3, jnp.float32))
        base = bm()
        assert not np.allclose(np.asarray(out.v), np.asarray(base.v))

    def test_vposer_variant(self, md):
        bm = BodyModelWithPoser(md)
        out = bm(poZ_body=jnp.asarray(RNG.randn(3, 32) * 0.5, jnp.float32))
        assert out.v.shape == (3, 300, 3)


class TestCameraInit:
    def test_depth_guess_scales_with_focal(self):
        j3 = jnp.asarray(RNG.randn(2, 25, 3), jnp.float32)
        j2 = jnp.asarray(RNG.randn(2, 25, 2) * 100, jnp.float32)
        t1 = ci.guess_init_depth(j3, j2, 1000.0)
        t2 = ci.guess_init_depth(j3, j2, 2000.0)
        np.testing.assert_allclose(np.asarray(t2[:, 2]),
                                   2 * np.asarray(t1[:, 2]), rtol=1e-5)
        assert (np.asarray(t1[:, :2]) == 0).all()

    def test_fit_camera_init_reduces_error(self, md):
        from lemo_tpu.body_model import load_model, make_forward_fn
        from lemo_tpu.body_model.vertex_ids import smpl_to_openpose

        model = load_model(md, use_pca=True, num_pca_comps=12)
        fwd = make_forward_fn(model)
        cam = PerspectiveCamera(1000.0, 1000.0, (960.0, 540.0))
        mapper = smpl_to_openpose()
        gt = model.zero_params(2)
        gt["transl"] = jnp.asarray([[0.1, 0.2, 2.5], [0, 0.3, 2.8]])
        out = fwd(gt, model.consts)
        gt2d = cam.project(out["joints"][:, jnp.asarray(mapper), :])

        init = model.zero_params(2)
        init["transl"] = jnp.asarray([[0.0, 0.0, 2.0], [0, 0, 2.0]])
        fitted, losses = ci.fit_camera_init(
            fwd, model.consts, mapper, cam, init, gt2d, num_steps=60,
            lr=0.05)
        assert float(losses[-1]) < float(losses[0])
        err = np.abs(np.asarray(fitted["transl"]) - np.asarray(gt["transl"]))
        assert err.mean() < 0.3


class TestRepresentationModes:
    @pytest.fixture(scope="class")
    def setup(self, md):
        import tempfile
        from lemo_tpu.testing.synthetic import write_amass_dataset

        root = write_amass_dataset(tempfile.mkdtemp(), "TotalCapture",
                                   seqs_per_subject=1, num_frames=480)
        models = {g: synthetic_smplx_npz(num_verts=300, gender=g)
                  for g in ("male", "female")}
        builder = amass.AmassRepresentationBuilder(models)
        clips = amass.scan_amass(["TotalCapture"], root)
        return builder, clips

    def test_local_markers_flat(self, setup):
        builder, clips = setup
        img, pivot = builder.local_markers(clips[0], 120)
        assert img.shape == (119, 3 + 68 * 3 + 4)
        assert np.isfinite(float(pivot))

    def test_joint_modes(self, setup):
        builder, clips = setup
        gj = builder.global_joints(clips[0], 120)
        lj = builder.local_joints(clips[0], 120)
        assert gj.shape == (120, 75) and lj.shape == (120, 75)
        # local mode: pelvis column is absolute, others relative
        lj = np.asarray(lj).reshape(120, 25, 3)
        gj = np.asarray(gj).reshape(120, 25, 3)
        np.testing.assert_allclose(lj[:, 0], gj[:, 0], atol=1e-6)
        np.testing.assert_allclose(lj[:, 1:], gj[:, 1:] - gj[:, :1],
                                   atol=1e-5)

    def test_flat_stats(self, setup):
        builder, clips = setup
        images, _ = amass.build_dataset(builder, clips, "local_markers")
        stats = LocalFlatStats.compute(images)
        assert (stats.Xmean[-4:] == 0).all()
        assert (stats.Xstd[-4:] == 1).all()
        norm = stats.normalize(jnp.asarray(images))
        assert np.isfinite(np.asarray(norm)).all()
