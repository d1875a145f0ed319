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
