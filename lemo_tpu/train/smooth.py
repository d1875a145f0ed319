"""Smoothness-prior training (train_smooth_prior.py:58-203 recipe).

Trains the Enc/Dec pair on *velocities* of global-marker clip images:
  loss = w_rec * L1(v, v_rec) + w_zs * mean((z[t+1] - z[t])^2)
with reflect padding (8, 8, 1, 1), Adam 1e-4, batch 60 — the shipped
checkpoint's exact configuration (runs/15217/params.json: z_channel 64,
downsample False, clip 4 s @ 30 fps, with-hand global markers).

TPU design: the train step is one jitted function over the parameter
pytree; data batches are device arrays produced by the AMASS pipeline.
The epoch loop supports sharding batches across a device mesh
(:mod:`lemo_tpu.parallel`).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lemo_tpu.ops.signal import reflect_pad_dt
from lemo_tpu.priors.conv_ae import (init_smooth_dec, init_smooth_enc,
                                     smooth_dec_forward, smooth_enc_forward)


@dataclasses.dataclass
class SmoothTrainConfig:
    lr: float = 1e-4
    batch_size: int = 60
    z_channel: int = 64
    downsample: bool = False
    input_padding: bool = True
    weight_loss_rec_v: float = 1.0
    weight_loss_z_smooth: float = 1000.0


def make_train_step(cfg: SmoothTrainConfig):
    opt = optax.adam(cfg.lr)

    def loss_fn(params, clip_img):
        # clip_img: [B, 1, d, T]; network input is the velocity
        v = clip_img[..., 1:] - clip_img[..., :-1]
        if cfg.input_padding:
            v = reflect_pad_dt(v)
        z, sizes = smooth_enc_forward(params["enc"], v,
                                      downsample=cfg.downsample)
        rec = smooth_dec_forward(params["dec"], z, sizes,
                                 downsample=cfg.downsample)
        loss_rec = jnp.abs(v - rec).mean()
        dz = z[..., 1:] - z[..., :-1]
        loss_zs = (dz ** 2).mean()
        total = cfg.weight_loss_rec_v * loss_rec + \
            cfg.weight_loss_z_smooth * loss_zs
        return total, {"loss_rec_v": loss_rec, "loss_z_smooth": loss_zs}

    @jax.jit
    def train_step(params, opt_state, clip_img):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, clip_img)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = loss
        return params, opt_state, metrics

    @jax.jit
    def eval_step(params, clip_img):
        _, metrics = loss_fn(params, clip_img)
        return metrics

    return train_step, eval_step, opt


def init_params(key, cfg: SmoothTrainConfig):
    k1, k2 = jax.random.split(key)
    return {"enc": init_smooth_enc(k1, cfg.z_channel),
            "dec": init_smooth_dec(k2, cfg.z_channel)}


def batches(images: np.ndarray, batch_size: int, rng: np.random.RandomState,
            shuffle: bool = True) -> Iterator[jnp.ndarray]:
    """[N, T, d] clip images -> [B, 1, d, T] device batches (the loader's
    permute, train_loader_smooth.py:216-219). Drops the last partial batch
    like the reference DataLoader (drop_last=True)."""
    idx = np.arange(len(images))
    if shuffle:
        rng.shuffle(idx)
    for s in range(0, len(idx) - batch_size + 1, batch_size):
        batch = images[idx[s:s + batch_size]]          # [B, T, d]
        yield jnp.asarray(batch.swapaxes(1, 2)[:, None])  # [B, 1, d, T]


def train(images_train: np.ndarray, images_test: np.ndarray | None,
          cfg: SmoothTrainConfig, num_steps: int, seed: int = 0,
          log_every: int = 500, callback=None):
    """Run the training loop; returns (params, history)."""
    rng = np.random.RandomState(seed)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    train_step, eval_step, opt = make_train_step(cfg)
    opt_state = opt.init(params)

    history = []
    step = 0
    while step < num_steps:
        for batch in batches(images_train, cfg.batch_size, rng):
            params, opt_state, metrics = train_step(params, opt_state, batch)
            step += 1
            if step % log_every == 0 or step == num_steps:
                rec = {k: float(v) for k, v in metrics.items()}
                rec["step"] = step
                if images_test is not None and len(images_test) >= 1:
                    test_m = eval_step(params, next(batches(
                        images_test, min(cfg.batch_size, len(images_test)),
                        rng, shuffle=False)))
                    rec.update({f"test_{k}": float(v)
                                for k, v in test_m.items()})
                history.append(rec)
                if callback:
                    callback(step, rec, params)
            if step >= num_steps:
                break
    return params, history
