"""Signal helpers vs scipy / torch ground truth."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi
import torch
import torch.nn.functional as F

from lemo_tpu.ops import signal as sig

RNG = np.random.RandomState(2)


def test_gaussian_filter1d_nearest_matches_scipy():
    x = RNG.randn(119, 3).astype(np.float32)
    ours = np.asarray(sig.gaussian_filter1d_nearest(jnp.asarray(x), sigma=20.0, axis=0))
    ref = ndi.gaussian_filter1d(x, 20.0, axis=0, mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian_filter_other_axis():
    x = RNG.randn(4, 57).astype(np.float32)
    ours = np.asarray(sig.gaussian_filter1d_nearest(jnp.asarray(x), sigma=3.0, axis=1))
    ref = ndi.gaussian_filter1d(x, 3.0, axis=1, mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reflect_pad_matches_torch():
    x = RNG.randn(2, 1, 57, 119).astype(np.float32)
    ours = np.asarray(sig.reflect_pad_dt(jnp.asarray(x), pad_t=8, pad_d=1))
    ref = F.pad(torch.from_numpy(x), (8, 8, 1, 1), "reflect").numpy()
    np.testing.assert_allclose(ours, ref, atol=0)
    # unpad inverts
    back = np.asarray(sig.unpad_dt(jnp.asarray(ours)))
    np.testing.assert_allclose(back, x, atol=0)
