"""Signal-processing helpers: reflect padding and Gaussian smoothing.

These mirror the exact numerical behavior of the reference's
``F.pad(x, (8, 8, 1, 1), 'reflect')`` calls (e.g. train_smooth_prior.py:120)
and ``scipy.ndimage.gaussian_filter1d(..., mode='nearest')``
(loader/train_loader_infill.py:243-245) so that motion images and forward
directions are bit-comparable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def reflect_pad_dt(x: jnp.ndarray, pad_t: int = 8, pad_d: int = 1) -> jnp.ndarray:
    """Reflect-pad the trailing two axes of [..., d, T] by (pad_d, pad_t).

    Equivalent to torch ``F.pad(x, (pad_t, pad_t, pad_d, pad_d), 'reflect')``.
    """
    cfg = [(0, 0)] * (x.ndim - 2) + [(pad_d, pad_d), (pad_t, pad_t)]
    return jnp.pad(x, cfg, mode="reflect")


def unpad_dt(x: jnp.ndarray, pad_t: int = 8, pad_d: int = 1) -> jnp.ndarray:
    """Inverse of :func:`reflect_pad_dt` (crop [..., d+2p, T+2q] back)."""
    return x[..., pad_d:-pad_d, pad_t:-pad_t]


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Discrete Gaussian kernel identical to scipy.ndimage's internal one."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 / (sigma * sigma) * x**2)
    return (phi / phi.sum()).astype(np.float64)


def gaussian_filter1d_nearest(
    x: jnp.ndarray, sigma: float, axis: int = 0, truncate: float = 4.0
) -> jnp.ndarray:
    """`scipy.ndimage.gaussian_filter1d(x, sigma, axis, mode='nearest')`.

    Implemented as edge-padding + correlation so it stays jittable. The
    kernel is a compile-time constant.
    """
    kernel = jnp.asarray(gaussian_kernel1d(sigma, truncate), dtype=x.dtype)
    radius = (kernel.shape[0] - 1) // 2

    x = jnp.moveaxis(x, axis, 0)
    lead = x.shape[0]
    flat = x.reshape(lead, -1)

    cfg = [(radius, radius), (0, 0)]
    padded = jnp.pad(flat, cfg, mode="edge")  # 'nearest' == edge replication

    # vectorized correlation along axis 0 via a 1-D convolution
    import jax.lax as lax

    lhs = padded.T[:, None, :]  # [cols, 1, L+2r]
    rhs = kernel[::-1][None, None, :]  # [1, 1, K]
    res = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [cols, 1, L]
    out = res[:, 0, :].T
    out = out.reshape(x.shape)
    return jnp.moveaxis(out, 0, axis)
