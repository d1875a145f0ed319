"""VPoser — the variational human pose prior — as pure JAX functions.

Capability parity with `human_body_prior/train/vposer_smpl.py:65-171`
(VPoser: BN+FC encoder to a 32-d Normal, FC decoder through the continuous
6-D rotation representation to 21 joint rotations). LEMO's fitting
pipelines only call ``decode(z, output_type='aa')``; the encoder and the
reparameterized sample are provided for the VPoser training capability.

Parameters live in a flat dict with torch ``state_dict`` keys
(``bodyprior_dec_fc1.weight`` etc.) so official VPoser checkpoints convert
via :func:`lemo_tpu.priors.conv_ae.load_torch_state_dict`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lemo_tpu.ops.rotations import matrot_to_aa, rot6d_to_matrot

NUM_JOINTS = 21
LATENT_DIM = 32
NUM_NEURONS = 512


def _linear(p, name, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def latent_dim(params: dict | None) -> int:
    """Latent size of a VPoser parameter dict (the decoder's input width);
    LATENT_DIM when params are absent. Saved pkls serialize a zero
    embedding of this size when use_vposer is off, so it must track the
    actual checkpoint rather than assume 32."""
    if params is None:
        return LATENT_DIM
    w = params.get("bodyprior_dec_fc1.weight")
    return LATENT_DIM if w is None else int(w.shape[1])


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def decode(params, z, output_type: str = "aa"):
    """z [B, 32] -> body pose.

    output_type 'aa' -> [B, 63] axis-angle (vposer_smpl.py:107-121);
    'matrot' -> [B, 1, 21, 9].
    """
    h = _lrelu(_linear(params, "bodyprior_dec_fc1", z))
    h = _lrelu(_linear(params, "bodyprior_dec_fc2", h))
    h = _linear(params, "bodyprior_dec_out", h)  # [B, 21*6]
    R = rot6d_to_matrot(h.reshape(-1, 6))  # [B*21, 3, 3]
    if output_type == "matrot":
        return R.reshape(z.shape[0], 1, NUM_JOINTS, 9)
    aa = matrot_to_aa(R)  # [B*21, 3]
    return aa.reshape(z.shape[0], NUM_JOINTS * 3)


def encode(params, pose_matrot, train: bool = False):
    """pose [B, n_features] (flattened matrot) -> (mu [B,32], sigma [B,32]).

    BatchNorm runs in inference mode against the stored running stats
    (the fitting pipelines never train the encoder); the VPoser trainer
    maintains the running stats itself.
    """
    x = pose_matrot.reshape(pose_matrot.shape[0], -1)
    x = _batchnorm(params, "bodyprior_enc_bn1", x)
    x = _lrelu(_linear(params, "bodyprior_enc_fc1", x))
    x = _batchnorm(params, "bodyprior_enc_bn2", x)
    x = _lrelu(_linear(params, "bodyprior_enc_fc2", x))
    mu = _linear(params, "bodyprior_enc_mu", x)
    logvar = _linear(params, "bodyprior_enc_logvar", x)
    sigma = jax.nn.softplus(logvar)
    return mu, sigma


def _batchnorm(p, name, x, eps=1e-5):
    mean = p[f"{name}.running_mean"]
    var = p[f"{name}.running_var"]
    w = p[f"{name}.weight"]
    b = p[f"{name}.bias"]
    return (x - mean) / jnp.sqrt(var + eps) * w + b


def init_vposer(key, num_joints: int = NUM_JOINTS, latent: int = LATENT_DIM,
                neurons: int = NUM_NEURONS) -> dict:
    """Fresh torch-layout VPoser parameters (torch Linear default init)."""
    n_features = num_joints * 9
    params = {}

    def lin(k, name, fan_in, fan_out):
        k1, k2 = jax.random.split(k)
        bound = 1.0 / math.sqrt(fan_in)
        params[f"{name}.weight"] = jax.random.uniform(
            k1, (fan_out, fan_in), jnp.float32, -bound, bound)
        params[f"{name}.bias"] = jax.random.uniform(
            k2, (fan_out,), jnp.float32, -bound, bound)

    keys = iter(jax.random.split(key, 8))
    lin(next(keys), "bodyprior_enc_fc1", n_features, neurons)
    lin(next(keys), "bodyprior_enc_fc2", neurons, neurons)
    lin(next(keys), "bodyprior_enc_mu", neurons, latent)
    lin(next(keys), "bodyprior_enc_logvar", neurons, latent)
    lin(next(keys), "bodyprior_dec_fc1", latent, neurons)
    lin(next(keys), "bodyprior_dec_fc2", neurons, neurons)
    lin(next(keys), "bodyprior_dec_out", neurons, num_joints * 6)
    for bn, dim in (("bodyprior_enc_bn1", n_features),
                    ("bodyprior_enc_bn2", neurons)):
        params[f"{bn}.weight"] = jnp.ones(dim)
        params[f"{bn}.bias"] = jnp.zeros(dim)
        params[f"{bn}.running_mean"] = jnp.zeros(dim)
        params[f"{bn}.running_var"] = jnp.ones(dim)
    return params
