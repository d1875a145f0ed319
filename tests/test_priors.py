"""Motion-prior network parity vs torch.

Two layers of evidence:
1. primitive parity — our conv/deconv/pool vs torch.nn.functional;
2. full-network, real-checkpoint parity — the shipped smoothness-prior
   weights (reference runs/15217/{Enc,Dec}_last_model.pkl) run through our
   pure-JAX forward vs a torch.nn.functional composition of the same
   state_dict (written here, independently, from the architecture spec).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from lemo_tpu.priors import conv_ae

RNG = np.random.RandomState(3)
REF_RUNS = "/root/reference/runs/15217"


# ---------------------------------------------------------------------------
# primitive parity
# ---------------------------------------------------------------------------

def test_conv2d_matches_torch():
    x = RNG.randn(2, 3, 11, 17).astype(np.float32)
    w = RNG.randn(5, 3, 3, 3).astype(np.float32)
    b = RNG.randn(5).astype(np.float32)
    ours = np.asarray(conv_ae.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=1, padding=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("stride,in_hw,out_hw", [
    ((2, 2), (13, 30), (26, 60)),
    ((2, 2), (13, 30), (25, 59)),   # output_padding 0 branch
    ((2, 1), (26, 60), (52, 60)),
    ((1, 1), (26, 60), (26, 60)),
])
def test_conv_transpose_matches_torch(stride, in_hw, out_hw):
    x = RNG.randn(2, 4, *in_hw).astype(np.float32)
    w = RNG.randn(4, 6, 3, 3).astype(np.float32)  # [I, O, kH, kW]
    b = RNG.randn(6).astype(np.float32)
    oph = out_hw[0] - ((in_hw[0] - 1) * stride[0] - 2 + 3)
    opw = out_hw[1] - ((in_hw[1] - 1) * stride[1] - 2 + 3)
    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=1, output_padding=(oph, opw)).numpy()
    ours = np.asarray(conv_ae.conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, (1, 1), out_hw))
    assert ours.shape == ref.shape == (2, 6, *out_hw)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_maxpool_matches_torch():
    x = RNG.randn(2, 3, 27, 59).astype(np.float32)
    ours = np.asarray(conv_ae.max_pool2d(jnp.asarray(x), (3, 3), (2, 2), (1, 1)))
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)
    ours2 = np.asarray(conv_ae.max_pool2d(jnp.asarray(x), (3, 3), (2, 1), (1, 1)))
    ref2 = F.max_pool2d(torch.from_numpy(x), (3, 3), (2, 1), 1).numpy()
    np.testing.assert_allclose(ours2, ref2, atol=0)


# ---------------------------------------------------------------------------
# torch functional re-composition of the reference architectures
# (independent spec-level reimplementation used as ground truth)
# ---------------------------------------------------------------------------

def torch_enc_forward(sd, x, downsample=False):
    h = x
    for i in range(1, 6):
        h = F.leaky_relu(F.conv2d(h, sd[f"enc_blc{i}.main.0.weight"],
                                  sd[f"enc_blc{i}.main.0.bias"], 1, 1), 0.2)
        h = F.leaky_relu(F.conv2d(h, sd[f"enc_blc{i}.main.2.weight"],
                                  sd[f"enc_blc{i}.main.2.bias"], 1, 1), 0.2)
        if downsample:
            h = F.max_pool2d(h, 3, 2, 1)
    return h


def torch_dec_forward(sd, z, sizes, downsample=False):
    stride = 2 if downsample else 1
    h = z
    for i, tgt in zip(range(1, 6), [sizes[4], sizes[3], sizes[2], sizes[1], sizes[0]]):
        in_hw = h.shape[2:]
        op = (tgt[0] - ((in_hw[0] - 1) * stride - 2 + 3),
              tgt[1] - ((in_hw[1] - 1) * stride - 2 + 3))
        h = F.leaky_relu(F.conv_transpose2d(h, sd[f"dec_blc{i}.deconv1.weight"],
                                            sd[f"dec_blc{i}.deconv1.bias"],
                                            stride, 1, op), 0.2)
        h2 = F.conv_transpose2d(h, sd[f"dec_blc{i}.deconv2.weight"],
                                sd[f"dec_blc{i}.deconv2.bias"], 1, 1, 0)
        h = h2 if i == 5 else F.leaky_relu(h2, 0.2)
    return h


def torch_infill_forward(sd, x, kernel=3):
    pad = kernel // 2
    h = x
    feats = []
    for i in range(1, 6):
        h = F.leaky_relu(F.conv2d(h, sd[f"enc_blc{i}.main.0.weight"],
                                  sd[f"enc_blc{i}.main.0.bias"], 1, pad), 0.2)
        h = F.leaky_relu(F.conv2d(h, sd[f"enc_blc{i}.main.2.weight"],
                                  sd[f"enc_blc{i}.main.2.bias"], 1, pad), 0.2)
        h = F.max_pool2d(h, 3, 2, 1)
        feats.append(h.shape[2:])
    z = h
    sizes = [x.shape[2:]] + feats
    h = z
    for i, tgt in zip(range(1, 6), [sizes[4], sizes[3], sizes[2], sizes[1], sizes[0]]):
        in_hw = h.shape[2:]
        op = (tgt[0] - ((in_hw[0] - 1) * 2 - 2 * pad + kernel),
              tgt[1] - ((in_hw[1] - 1) * 2 - 2 * pad + kernel))
        h = F.leaky_relu(F.conv_transpose2d(h, sd[f"dec_blc{i}.deconv1.weight"],
                                            sd[f"dec_blc{i}.deconv1.bias"],
                                            2, pad, op), 0.2)
        h2 = F.conv_transpose2d(h, sd[f"dec_blc{i}.deconv2.weight"],
                                sd[f"dec_blc{i}.deconv2.bias"], 1, pad, 0)
        h = h2 if i == 5 else F.leaky_relu(h2, 0.2)
    return h, z


# ---------------------------------------------------------------------------
# full-network parity
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(f"{REF_RUNS}/Enc_last_model.pkl"),
                    reason="shipped smoothness checkpoint not available")
def test_smooth_enc_real_checkpoint_parity():
    """Run the SHIPPED LEMO smoothness-prior encoder weights through our
    JAX forward and through torch.nn.functional; demand near-bit parity."""
    params = conv_ae.load_torch_state_dict(f"{REF_RUNS}/Enc_last_model.pkl")
    sd = torch.load(f"{REF_RUNS}/Enc_last_model.pkl", map_location="cpu",
                    weights_only=True)
    # a stats-normalized velocity clip image, padded like the fitters do:
    # [1, 1, d+2, T+16] with d=243 markers*3, T=119
    x = (RNG.randn(1, 1, 245, 135) * 0.7).astype(np.float32)
    z_jax, sizes = conv_ae.smooth_enc_forward(params, jnp.asarray(x),
                                              downsample=False)
    z_ref = torch_enc_forward(sd, torch.from_numpy(x), downsample=False).numpy()
    assert z_jax.shape == z_ref.shape  # [1, 64, 245, 135] — no pooling
    np.testing.assert_allclose(np.asarray(z_jax), z_ref, atol=2e-4)


@pytest.mark.skipif(not os.path.exists(f"{REF_RUNS}/Dec_last_model.pkl"),
                    reason="shipped smoothness checkpoint not available")
def test_smooth_dec_real_checkpoint_parity():
    enc_p = conv_ae.load_torch_state_dict(f"{REF_RUNS}/Enc_last_model.pkl")
    dec_p = conv_ae.load_torch_state_dict(f"{REF_RUNS}/Dec_last_model.pkl")
    enc_sd = torch.load(f"{REF_RUNS}/Enc_last_model.pkl", map_location="cpu",
                        weights_only=True)
    dec_sd = torch.load(f"{REF_RUNS}/Dec_last_model.pkl", map_location="cpu",
                        weights_only=True)
    x = (RNG.randn(1, 1, 245, 135) * 0.7).astype(np.float32)
    z, sizes = conv_ae.smooth_enc_forward(enc_p, jnp.asarray(x), downsample=False)
    rec = conv_ae.smooth_dec_forward(dec_p, z, sizes, downsample=False)

    z_t = torch_enc_forward(enc_sd, torch.from_numpy(x))
    rec_t = torch_dec_forward(dec_sd, z_t,
                              [x.shape[2:]] + [z_t.shape[2:]] * 5).numpy()
    assert rec.shape == rec_t.shape == x.shape
    np.testing.assert_allclose(np.asarray(rec), rec_t, atol=5e-4)


def test_infill_ae_random_weights_parity():
    """Infill AE (downsampling path incl. output_size arithmetic) vs torch
    on randomly initialized weights — the shipped AE checkpoint is a
    missing large blob, so random weights carry the parity burden."""
    key = jax.random.PRNGKey(0)
    params = conv_ae.init_infill_ae(key, in_channel=4, kernel=3)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
    # local_markers_4chan padded image: [1, 4, 208+2, 119+16]
    x = (RNG.randn(1, 4, 210, 135) * 0.5).astype(np.float32)
    rec, z = conv_ae.infill_ae_forward(params, jnp.asarray(x))
    rec_t, z_t = torch_infill_forward(sd, torch.from_numpy(x))
    assert rec.shape == tuple(rec_t.shape) and z.shape == tuple(z_t.shape)
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=2e-4)


def test_infill_ae_jit_grad():
    key = jax.random.PRNGKey(1)
    params = conv_ae.init_infill_ae(key, in_channel=4)
    x = jnp.asarray(RNG.randn(2, 4, 210, 135), jnp.float32)

    @jax.jit
    def loss_fn(p):
        rec, z = conv_ae.infill_ae_forward(p, x)
        return jnp.abs(rec[:, 0] - x[:, 0]).mean()

    g = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert sum(float(jnp.abs(v).sum()) for v in g.values()) > 0
