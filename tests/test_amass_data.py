"""AMASS pipeline tests on synthetic data: scan -> clip -> representations
-> stats, and schema compatibility with the shipped reference stats npzs."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from lemo_tpu.data import amass
from lemo_tpu.data.stats import GlobalStats, Local4ChanStats
from lemo_tpu.testing.synthetic import synthetic_smplx_npz, write_amass_dataset


@pytest.fixture(scope="module")
def amass_root():
    d = tempfile.mkdtemp()
    write_amass_dataset(d, "TotalCapture", num_subjects=1, seqs_per_subject=2,
                        num_frames=480, fps=60)
    write_amass_dataset(d, "HumanEva", num_subjects=1, seqs_per_subject=1,
                        num_frames=600, fps=120)
    return d


@pytest.fixture(scope="module")
def builder():
    models = {g: synthetic_smplx_npz(num_verts=400, gender=g, seed=2)
              for g in ("male", "female")}
    return amass.AmassRepresentationBuilder(models, with_hand=False)


class TestScan:
    def test_scan_resamples_and_chunks(self, amass_root):
        clips = amass.scan_amass(["TotalCapture", "HumanEva"], amass_root,
                                 clip_seconds=4)
        assert len(clips) > 0
        for c in clips:
            assert c.poses.shape == (120, 156)  # 4 s @ 30 fps
            assert c.trans.shape == (120, 3)

    def test_unsupported_fps_skipped(self, amass_root):
        # write a 25-fps sequence; it must be ignored
        bad_dir = os.path.join(amass_root, "BadSet", "s0")
        os.makedirs(bad_dir, exist_ok=True)
        np.savez(os.path.join(bad_dir, "x_poses.npz"),
                 poses=np.zeros((500, 156)), trans=np.zeros((500, 3)),
                 betas=np.zeros(16), gender=np.array("male"),
                 mocap_framerate=np.array(25.0))
        assert amass.scan_amass(["BadSet"], amass_root) == []


class TestRepresentations:
    def test_global_markers_shape(self, amass_root, builder):
        clips = amass.scan_amass(["TotalCapture"], amass_root)
        img = builder.global_markers(clips[0], 120)
        assert img.shape == (120, 67 * 3)

    def test_local_4chan_shape(self, amass_root, builder):
        clips = amass.scan_amass(["TotalCapture"], amass_root)
        img, pivot = builder.local_markers_4chan(clips[0], 120)
        assert img.shape == (4, 119, 68 * 3 + 4)
        assert np.isfinite(float(pivot))

    def test_build_dataset_and_stats(self, amass_root, builder):
        clips = amass.scan_amass(["TotalCapture"], amass_root)
        images, aux = amass.build_dataset(builder, clips, "local_markers_4chan")
        assert images.shape[1:] == (4, 119, 208)
        assert aux["betas"].shape == (len(clips), 10)

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "stats.npz")
            stats = amass.compute_or_load_stats(images, "local_markers_4chan",
                                                p, "train")
            loaded = amass.compute_or_load_stats(None, "local_markers_4chan",
                                                 p, "test")
            np.testing.assert_allclose(stats.Xmean_local, loaded.Xmean_local)
            # contact dims pinned
            assert (stats.Xmean_local[-4:] == 0).all()
            assert (stats.Xstd_local[-4:] == 1).all()

        norm = stats.normalize(jnp.asarray(images))
        assert np.asarray(norm).shape == images.shape
        # normalized channel 0 (excl. contact dims) ~ zero mean / unit-ish std
        c0 = np.asarray(norm)[:, 0, :, :-4]
        assert abs(c0.mean()) < 0.2


class TestShippedStatsSchema:
    """The reference's shipped statistics load through our classes."""

    REF = "/root/reference/preprocess_stats"

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
    def test_smooth_stats_load(self):
        s = GlobalStats.load(
            f"{self.REF}/preprocess_stats_smooth_withHand_global_markers.npz")
        assert s.Xmean.shape == (1, 1, 243)  # 81 markers * 3
        assert s.Xstd.shape == (243,)

    @pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
    def test_infill_stats_load(self):
        s = Local4ChanStats.load(
            f"{self.REF}/preprocess_stats_infill_local_markers_4chan.npz")
        assert s.Xmean_local.shape == (208,)  # (1+67)*3 + 4
        assert (s.Xstd_local[-4:] == 1).all()
        # roundtrip: normalize + denormalize_flat recovers trajectory rows
        img = jnp.asarray(np.random.RandomState(0).randn(2, 4, 119, 208),
                          jnp.float32)
        norm = s.normalize(img)
        flat = jnp.concatenate(
            [norm[:, 1, :, 0:1], norm[:, 2, :, 0:1], norm[:, 3, :, 0:1],
             norm[:, 0, :, :-4]], axis=-1)
        rec = np.asarray(s.denormalize_flat(flat))
        np.testing.assert_allclose(rec[:, :, 0], np.asarray(img)[:, 1, :, 0],
                                   atol=1e-4)
        np.testing.assert_allclose(rec[:, :, 3:], np.asarray(img)[:, 0, :, :-4],
                                   atol=1e-4)


class TestGtEvalHooks:
    """GT 3D-accuracy hooks (optimize_loader_amass_new.py:283-308)."""

    def test_transform_maps_world_to_canonical(self, amass_root, builder):
        clips = amass.scan_amass(["TotalCapture"], amass_root)
        _, aux = amass.build_dataset(builder, clips, "local_markers_4chan",
                                     with_gt=True)
        assert aux["smplx_params_gt"].shape == (len(clips), 120, 169)
        assert aux["transf_matrix_smplx"].shape == (len(clips), 4, 4)

        from lemo_tpu.data import repr as rep
        from lemo_tpu.utils.metrics import apply_world_transform

        markers, joints = builder.markers_and_joints(clips[0], 120)
        R, origin = rep.frame0_normalizer(joints[0, :25])
        pm = jnp.concatenate([joints[:, 0:1], markers], axis=1)
        pm_n = (pm - origin) @ R
        want = pm_n - jnp.array([0.0, 0.0, float(pm_n[:, :, 2].min())])
        got = apply_world_transform(
            pm, jnp.asarray(aux["transf_matrix_smplx"][0]))
        assert float(jnp.abs(got - want).max()) < 2e-5

    def test_gt_params_reproduce_builder_geometry(self, amass_root, builder):
        import jax

        from lemo_tpu.body_model import make_forward_fn
        from lemo_tpu.cli.eval_amass import split_gt_params

        clips = amass.scan_amass(["TotalCapture"], amass_root)
        gt169, _ = builder.gt_eval_data(clips[0], 120)
        gt = {k: jnp.asarray(v)
              for k, v in split_gt_params(jnp.asarray(gt169)).items()}
        m = builder.models[clips[0].gender]
        zeros = m.zero_params(120)
        for k in zeros:
            gt.setdefault(k, zeros[k])
        out = jax.jit(make_forward_fn(m))(gt, m.consts)
        markers, _ = builder.markers_and_joints(clips[0], 120)
        assert float(jnp.abs(
            out["vertices"][:, builder.marker_ids] - markers).max()) < 1e-5

    def test_evaluate_clip_perfect_gt_is_zero_error(self, amass_root,
                                                    builder):
        """evaluate_clip with the GT model standing in for the fitted one
        and GT-equivalent geometry must report ~0 — pins the transform
        plumbing inside the metric path (identical transforms on both
        sides cancel only if applied consistently)."""
        import jax

        from lemo_tpu.body_model import make_forward_fn
        from lemo_tpu.utils import metrics as M

        clips = amass.scan_amass(["TotalCapture"], amass_root)
        gt169, transf = builder.gt_eval_data(clips[0], 120)
        m = builder.models[clips[0].gender]
        fwd = jax.jit(make_forward_fn(m))
        markers, joints = builder.markers_and_joints(clips[0], 120)
        tf = jnp.asarray(transf)
        mk_gt = M.apply_world_transform(markers, tf)
        # the canonical-frame invariant the eval relies on: mapped GT
        # equals itself -> the metric of (x, x) is 0
        assert M.marker_error(mk_gt, mk_gt)["mean"] == 0.0
        assert M.mpjpe(M.apply_world_transform(joints[:, :25], tf),
                       M.apply_world_transform(joints[:, :25], tf)) == 0.0

    def test_eval_cli_parser(self):
        from lemo_tpu.cli.eval_amass import build_parser

        a = build_parser().parse_args(
            ["--amass_dir", "/x", "--body_model_path", "/y",
             "--fitting_root", "/z", "--out", "/tmp/r.json"])
        assert a.fitting_root == "/z"
