"""Prior-trainer smoke tests: losses descend on synthetic data."""

import numpy as np
import jax

from lemo_tpu.train import infill as ti
from lemo_tpu.train import smooth as ts
from lemo_tpu.train import vposer as tv

RNG = np.random.RandomState(33)


def test_smooth_trainer_descends():
    # tiny synthetic clip images [N, T, d]
    images = RNG.randn(8, 40, 60).astype(np.float32) * 0.3
    cfg = ts.SmoothTrainConfig(batch_size=4, lr=1e-3)
    params, history = ts.train(images, images[:4], cfg, num_steps=8,
                               log_every=2)
    assert len(history) >= 2
    assert history[-1]["total"] < history[0]["total"]
    assert "test_loss_rec_v" in history[-1]


def test_infill_trainer_descends():
    images = RNG.randn(6, 4, 40, 208).astype(np.float32) * 0.3
    cfg = ti.InfillTrainConfig(batch_size=3, lr=1e-3)
    params, history = ti.train(images, cfg, num_steps=6, log_every=2)
    assert history[-1]["total"] < history[0]["total"]


def test_infill_random_mask_shapes():
    m = ti.random_marker_mask(jax.random.PRNGKey(0), 4, 208, 40)
    m = np.asarray(m)
    assert m.shape == (4, 208, 40)
    # pelvis rows never masked
    assert (m[:, :3] == 1).all()
    # some marker rows masked
    assert (m[:, 3:204] == 0).any()


def test_infill_random_mask_distribution():
    """Masked-marker count must match the reference's
    random.sample(range(67), random.randint(1, 6)): uniform over 1..6
    DISTINCT markers (train_infill_prior.py:147-168)."""
    m = np.asarray(ti.random_marker_mask(jax.random.PRNGKey(3),
                                         3000, 208, 4))
    # marker rows are [3:204] in groups of 3; count masked markers/sample
    marker_rows = m[:, 3:204, 0].reshape(-1, 67, 3)
    masked = (marker_rows == 0).all(-1)          # [B, 67]
    counts = masked.sum(-1)
    # distinct sampling: counts live exactly in {1..6}
    assert counts.min() >= 1 and counts.max() <= 6
    # uniform over 1..6 -> mean 3.5, each bucket ~1/6
    assert abs(counts.mean() - 3.5) < 0.15
    freq = np.bincount(counts, minlength=7)[1:7] / len(counts)
    assert (np.abs(freq - 1 / 6) < 0.04).all(), freq


def test_infill_prox_mask_conversion():
    prox = np.ones((2, 50, 201), np.float32)
    prox[0, :, 16 * 3:16 * 3 + 3] = 0  # left heel occluded
    img_mask = ti.prox_mask_to_image_mask(prox, 208, 40)
    assert img_mask.shape == (2, 208, 40)
    assert (img_mask[0, -4] == 0).all()   # left-heel contact row masked
    assert (img_mask[1, -4] == 1).all()


def test_vposer_trainer_descends():
    poses = (RNG.randn(64, 63) * 0.3).astype(np.float32)
    cfg = tv.VPoserTrainConfig(batch_size=16, lr=1e-3)
    params, history = tv.train(poses, cfg, num_steps=20, log_every=5)
    assert history[-1]["total"] < history[0]["total"] * 1.5
    assert np.isfinite(history[-1]["kl"])
