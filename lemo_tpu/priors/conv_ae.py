"""Convolutional motion priors as pure functions over torch-layout params.

Capability parity with the reference's two prior networks:

- the occlusion-infilling auto-encoder ``AE`` (models/AE.py:78-108): five
  Conv-LReLU-Conv-LReLU-MaxPool encoder blocks (1/4 -> 32 -> 64 -> 128 ->
  256 -> 256 channels, pooling stride 2) and five transposed-conv decoder
  blocks whose output sizes are pinned to the encoder intermediates;
- the smoothness prior ``Enc``/``Dec`` pair (models/AE_sep.py:77-123):
  same conv topology but split into separate encoder/decoder so the
  fitters can run the encoder alone; LEMO's shipped checkpoint uses
  ``downsample=False, z_channel=64`` — all convolutions stride 1, no
  pooling, so z keeps the input's spatial extent.

Parameters are stored in a flat dict keyed by the torch ``state_dict``
names (``enc_blc1.main.0.weight`` etc.) with torch memory layout
(Conv2d: [O, I, kH, kW]; ConvTranspose2d: [I, O, kH, kW]). This makes
checkpoint conversion from the shipped ``runs/15217/*.pkl`` a pure
``jnp.asarray`` pass and allows bit-level parity tests against torch.

Everything here is jit/vmap/grad-safe; output sizes are resolved at trace
time from static shapes (the reference's dynamic ``output_size=`` argument
becomes a compile-time constant).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_NCHW = ("NCHW", "OIHW", "NCHW")


# ---------------------------------------------------------------------------
# torch-semantics primitives
# ---------------------------------------------------------------------------

def conv2d(x, w, b, stride=(1, 1), padding=(1, 1)):
    """torch.nn.functional.conv2d semantics; x [N,C,H,W], w [O,I,kH,kW]."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_NCHW,
    )
    return y + b[None, :, None, None]


def conv_transpose2d(x, w, b, stride, padding, out_hw):
    """torch ConvTranspose2d with torch's ``output_size=`` semantics.

    x [N,I,H,W], w [I,O,kH,kW] (torch layout). `out_hw` pins the output
    spatial size exactly like torch's output_size argument: torch solves
    output_padding = out - ((in-1)*stride - 2*pad + kernel) and pads the
    bottom/right. Implemented as an input-dilated convolution with the
    spatially-flipped, axis-swapped kernel.
    """
    kh, kw = w.shape[2], w.shape[3]
    sh, sw = stride
    ph, pw = padding
    in_h, in_w = x.shape[2], x.shape[3]
    oph = out_hw[0] - ((in_h - 1) * sh - 2 * ph + kh)
    opw = out_hw[1] - ((in_w - 1) * sw - 2 * pw + kw)
    if not (0 <= oph < sh or (oph == 0 and sh == 1)) or not (
        0 <= opw < sw or (opw == 0 and sw == 1)
    ):
        raise ValueError(
            f"requested output size {out_hw} unreachable from input "
            f"{(in_h, in_w)} with stride {stride} kernel {(kh, kw)}"
        )
    w_t = jnp.flip(w, (2, 3)).swapaxes(0, 1)  # [O, I, kH, kW]
    y = lax.conv_general_dilated(
        x, w_t,
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oph),
                 (kw - 1 - pw, kw - 1 - pw + opw)],
        lhs_dilation=(sh, sw),
        dimension_numbers=_NCHW,
    )
    return y + b[None, :, None, None]


def max_pool2d(x, kernel=(3, 3), stride=(2, 2), padding=(1, 1)):
    """torch MaxPool2d semantics (implicit -inf padding)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=[(0, 0), (0, 0),
                 (padding[0], padding[0]), (padding[1], padding[1])],
    )


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _enc_block(p, prefix, x, *, kernel, pool, pool_stride):
    pad = kernel // 2
    x = leaky_relu(conv2d(x, p[f"{prefix}.main.0.weight"],
                          p[f"{prefix}.main.0.bias"], (1, 1), (pad, pad)))
    x = leaky_relu(conv2d(x, p[f"{prefix}.main.2.weight"],
                          p[f"{prefix}.main.2.bias"], (1, 1), (pad, pad)))
    if pool:
        x = max_pool2d(x, (3, 3), pool_stride, (1, 1))
    return x


def _dec_block(p, prefix, x, out_hw, *, kernel, stride, final_act=True):
    pad = kernel // 2
    x = conv_transpose2d(x, p[f"{prefix}.deconv1.weight"],
                         p[f"{prefix}.deconv1.bias"], stride, (pad, pad),
                         out_hw)
    x = leaky_relu(x)
    x = conv_transpose2d(x, p[f"{prefix}.deconv2.weight"],
                         p[f"{prefix}.deconv2.bias"], (1, 1), (pad, pad),
                         out_hw)
    if final_act:
        x = leaky_relu(x)
    return x


# ---------------------------------------------------------------------------
# infill AE (models/AE.py topology)
# ---------------------------------------------------------------------------

def infill_ae_forward(params, x, *, kernel=3, downsample=True):
    """AE.forward (models/AE.py:93-108): returns (reconstruction, z).

    x: [N, C_in, d, T]. Decoder output sizes are pinned to the encoder
    intermediates exactly as the reference passes ``x_down*.size()``.
    """
    pool_stride = (2, 2) if downsample else (2, 1)
    sizes = [x.shape[2:]]
    h = x
    feats = []
    for i in range(1, 6):
        h = _enc_block(params, f"enc_blc{i}", h, kernel=kernel,
                       pool=True, pool_stride=pool_stride)
        feats.append(h)
        sizes.append(h.shape[2:])
    z = h  # [N, 256, d/32, T/32]

    dec_stride = (2, 2) if downsample else (2, 1)
    h = _dec_block(params, "dec_blc1", z, sizes[4], kernel=kernel,
                   stride=dec_stride)
    h = _dec_block(params, "dec_blc2", h, sizes[3], kernel=kernel,
                   stride=dec_stride)
    h = _dec_block(params, "dec_blc3", h, sizes[2], kernel=kernel,
                   stride=dec_stride)
    h = _dec_block(params, "dec_blc4", h, sizes[1], kernel=kernel,
                   stride=dec_stride)
    rec = _dec_block(params, "dec_blc5", h, sizes[0], kernel=kernel,
                     stride=dec_stride, final_act=False)
    return rec, z


# ---------------------------------------------------------------------------
# smoothness Enc / Dec (models/AE_sep.py topology)
# ---------------------------------------------------------------------------

def smooth_enc_forward(params, x, *, downsample=False):
    """Enc.forward (models/AE_sep.py:91-99): returns (z, sizes tuple).

    With downsample=False (the shipped LEMO configuration) there is no
    pooling at all — z has the same spatial extent as the input.
    """
    sizes = [x.shape[2:]]
    h = x
    for i in range(1, 6):
        h = _enc_block(params, f"enc_blc{i}", h, kernel=3,
                       pool=downsample, pool_stride=(2, 2))
        sizes.append(h.shape[2:])
    return h, tuple(sizes)


def smooth_dec_forward(params, z, sizes, *, downsample=False):
    """Dec.forward (models/AE_sep.py:117-123)."""
    stride = (2, 2) if downsample else (1, 1)
    h = _dec_block(params, "dec_blc1", z, sizes[4], kernel=3, stride=stride)
    h = _dec_block(params, "dec_blc2", h, sizes[3], kernel=3, stride=stride)
    h = _dec_block(params, "dec_blc3", h, sizes[2], kernel=3, stride=stride)
    h = _dec_block(params, "dec_blc4", h, sizes[1], kernel=3, stride=stride)
    return _dec_block(params, "dec_blc5", h, sizes[0], kernel=3,
                      stride=stride, final_act=False)


# ---------------------------------------------------------------------------
# initialization / checkpoint conversion
# ---------------------------------------------------------------------------

def _init_conv(key, o, i, k):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) weight,
    uniform(+-1/sqrt(fan_in)) bias — so training-from-scratch matches the
    reference recipe's starting statistics."""
    k1, k2 = jax.random.split(key)
    fan_in = i * k * k
    bound_w = math.sqrt(2.0 / (1 + 5.0)) * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(k1, (o, i, k, k), jnp.float32, -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (o,), jnp.float32, -bound_b, bound_b)
    return w, b


def _init_deconv(key, i, o, k):
    k1, k2 = jax.random.split(key)
    fan_in = o * k * k  # torch fan_in uses weight.size(1)*k*k = out_ch for transpose
    bound_w = math.sqrt(2.0 / (1 + 5.0)) * math.sqrt(3.0 / fan_in)
    w = jax.random.uniform(k1, (i, o, k, k), jnp.float32, -bound_w, bound_w)
    bound_b = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(k2, (o,), jnp.float32, -bound_b, bound_b)
    return w, b


def _enc_channels(z_channel):
    if z_channel == 256:
        c2, c3 = 128, 256
    elif z_channel == 64:
        c2, c3 = 64, 64
    else:
        raise ValueError(z_channel)
    return [32, 64, c2, c3, c3]


def init_infill_ae(key, in_channel=4, kernel=3):
    """Fresh parameters for the infill AE (channels 32/64/128/256/256)."""
    chans = [in_channel, 32, 64, 128, 256, 256]
    params = {}
    keys = jax.random.split(key, 20)
    ki = iter(keys)
    for i in range(1, 6):
        w, b = _init_conv(next(ki), chans[i], chans[i - 1], kernel)
        params[f"enc_blc{i}.main.0.weight"], params[f"enc_blc{i}.main.0.bias"] = w, b
        w, b = _init_conv(next(ki), chans[i], chans[i], kernel)
        params[f"enc_blc{i}.main.2.weight"], params[f"enc_blc{i}.main.2.bias"] = w, b
    dec_io = [(256, 256), (256, 128), (128, 64), (64, 32), (32, 1)]
    for i, (ci, co) in enumerate(dec_io, start=1):
        w, b = _init_deconv(next(ki), ci, co, kernel)
        params[f"dec_blc{i}.deconv1.weight"], params[f"dec_blc{i}.deconv1.bias"] = w, b
        w, b = _init_deconv(next(ki), co, co, kernel)
        params[f"dec_blc{i}.deconv2.weight"], params[f"dec_blc{i}.deconv2.bias"] = w, b
    return params


def init_smooth_enc(key, z_channel=64):
    chans = [1] + _enc_channels(z_channel)
    params = {}
    keys = iter(jax.random.split(key, 10))
    for i in range(1, 6):
        w, b = _init_conv(next(keys), chans[i], chans[i - 1], 3)
        params[f"enc_blc{i}.main.0.weight"], params[f"enc_blc{i}.main.0.bias"] = w, b
        w, b = _init_conv(next(keys), chans[i], chans[i], 3)
        params[f"enc_blc{i}.main.2.weight"], params[f"enc_blc{i}.main.2.bias"] = w, b
    return params


def init_smooth_dec(key, z_channel=64):
    c = _enc_channels(z_channel)
    dec_io = [(c[4], c[4]), (c[4], c[2]), (c[2], 64), (64, 32), (32, 1)]
    params = {}
    keys = iter(jax.random.split(key, 10))
    for i, (ci, co) in enumerate(dec_io, start=1):
        w, b = _init_deconv(next(keys), ci, co, 3)
        params[f"dec_blc{i}.deconv1.weight"], params[f"dec_blc{i}.deconv1.bias"] = w, b
        w, b = _init_deconv(next(keys), co, co, 3)
        params[f"dec_blc{i}.deconv2.weight"], params[f"dec_blc{i}.deconv2.bias"] = w, b
    return params


def load_torch_state_dict(path: str) -> dict[str, jnp.ndarray]:
    """Convert a torch ``state_dict`` checkpoint (e.g. the shipped
    smoothness prior ``runs/15217/Enc_last_model.pkl``) into the flat param
    dict these forwards consume. Layout is preserved 1:1."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older checkpoints (e.g. torch<1.6 zip-less pickles) need the
        # legacy loader; only use on checkpoints you trust
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: jnp.asarray(v.numpy()) for k, v in sd.items()
            if hasattr(v, "numpy")}


def save_state_dict(params: dict[str, Any], path: str) -> None:
    """Persist params as a plain npz (torch-free checkpoint format)."""
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_state_dict_npz(path: str) -> dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in np.load(path).items()}
