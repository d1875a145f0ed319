"""Infilling-prior training (train_infill_prior.py:61-313 recipe).

Trains the 4-channel AE on local_markers_4chan images with the masking
curriculum: random 1-6 whole markers zeroed for the first 20 epochs, real
PROX occlusion masks afterwards; loss = 10 * L1(body rows) +
10 * L1(velocity of body rows) + 1 * BCE(contact-label rows), computed on
the reflect-padded images exactly as the reference does
(train_infill_prior.py:196-208 — the `[0:-5]` row slice excludes the 4
contact rows + 1 pad row; BCE covers the last 5 padded rows).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lemo_tpu.ops.signal import reflect_pad_dt
from lemo_tpu.priors.conv_ae import infill_ae_forward, init_infill_ae


@dataclasses.dataclass
class InfillTrainConfig:
    lr: float = 1e-4
    batch_size: int = 120
    in_channel: int = 4
    conv_k: int = 3
    input_padding: bool = True
    weight_loss_rec_body: float = 10.0
    weight_loss_rec_body_v: float = 10.0
    weight_loss_rec_contact_lbl: float = 1.0
    random_mask_epochs: int = 20  # curriculum switch point


def random_marker_mask(key, batch_size: int, d: int, T: int,
                       mode: str = "local_markers_4chan"):
    """Random 1-6 markers zeroed per sample (train_infill_prior.py:147-168).

    Exact distribution match with the reference's
    ``random.sample(range(67), random.randint(1, 6))``: top-6 indices of
    iid uniform scores are a uniformly-random DISTINCT 6-subset in random
    order, and activating the first n (n ~ uniform{1..6}) of a random
    ordering yields a uniform n-subset — all inside jit.
    """
    offset = 3 if mode == "local_markers_4chan" else 6
    k1, k2 = jax.random.split(key)
    n_mask = 6
    scores = jax.random.uniform(k1, (batch_size, 67))
    _, marker_ids = jax.lax.top_k(scores, n_mask)      # [B, 6] distinct
    n = jax.random.randint(k2, (batch_size, 1), 1, n_mask + 1)  # 1..6
    active = jnp.arange(n_mask)[None, :] < n           # first n active
    rows = marker_ids * 3 + offset  # [B, n_mask]

    # row r is zeroed when any active masked marker covers it
    r = jnp.arange(d)[None, :, None]                   # [1, d, 1]
    covered = (r >= rows[:, None, :]) & (r < rows[:, None, :] + 3)  # [B, d, n]
    zeroed = jnp.any(covered & active[:, None, :], axis=-1)        # [B, d]
    mask = jnp.where(zeroed[:, :, None], 0.0,
                     jnp.ones((batch_size, d, T)))

    # contact-row masking when foot markers are masked
    def foot_mask(rws, act):
        def has(slot):
            return jnp.any((rws == slot) & act)
        left = has(16) | has(30)
        right = has(47) | has(60)
        rows_c = jnp.ones((4, T))
        rows_c = rows_c.at[0].set(jnp.where(left, 0.0, 1.0))
        rows_c = rows_c.at[2].set(jnp.where(left, 0.0, 1.0))
        rows_c = rows_c.at[1].set(jnp.where(right, 0.0, 1.0))
        rows_c = rows_c.at[3].set(jnp.where(right, 0.0, 1.0))
        return rows_c

    contact = jax.vmap(foot_mask)(marker_ids, active)  # [B, 4, T]
    mask = mask.at[:, -4:, :].set(contact)
    return mask


def prox_mask_to_image_mask(prox_masks: np.ndarray, d: int, T: int,
                            mode: str = "local_markers_4chan") -> np.ndarray:
    """[B, T0, 67*3] PROX occlusion masks -> [B, d, T] channel-0 masks
    (train_infill_prior.py:170-188)."""
    B = prox_masks.shape[0]
    mm = prox_masks[:, :T].transpose(0, 2, 1)  # [B, 201, T]
    pelvis = np.ones((B, 3 if mode == "local_markers_4chan" else 6, T))
    left = (mm[:, 16 * 3:16 * 3 + 1] == 1) & (mm[:, 30 * 3:30 * 3 + 1] == 1)
    right = (mm[:, 47 * 3:47 * 3 + 1] == 1) & (mm[:, 60 * 3:60 * 3 + 1] == 1)
    contact = np.concatenate([left, right, left, right], axis=1).astype(
        mm.dtype)
    return np.concatenate([pelvis, mm, contact], axis=1)


def make_train_step(cfg: InfillTrainConfig):
    opt = optax.adam(cfg.lr)

    def loss_fn(params, clip_img, mask):
        # clip_img: [B, 4, d, T]; mask: [B, d, T] on channel 0
        x_in = clip_img.at[:, 0].multiply(mask)
        if cfg.input_padding:
            x_in = reflect_pad_dt(x_in)
            x_tgt = reflect_pad_dt(clip_img)
        else:
            x_tgt = clip_img
        rec, _ = infill_ae_forward(params, x_in, kernel=cfg.conv_k)

        body_t, body_r = x_tgt[:, 0, :-5], rec[:, 0, :-5]
        loss_body = jnp.abs(body_t - body_r).mean()
        vt = body_t[..., 1:] - body_t[..., :-1]
        vr = body_r[..., 1:] - body_r[..., :-1]
        loss_body_v = jnp.abs(vt - vr).mean()
        logits = rec[:, 0, -5:]
        labels = x_tgt[:, 0, -5:]
        loss_bce = optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        total = (cfg.weight_loss_rec_body * loss_body
                 + cfg.weight_loss_rec_body_v * loss_body_v
                 + cfg.weight_loss_rec_contact_lbl * loss_bce)
        return total, {"loss_rec_body": loss_body,
                       "loss_rec_body_v": loss_body_v,
                       "loss_rec_contact_lbl": loss_bce}

    @jax.jit
    def train_step(params, opt_state, clip_img, mask):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, clip_img, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = loss
        return params, opt_state, metrics

    @jax.jit
    def eval_step(params, clip_img, mask):
        _, m = loss_fn(params, clip_img, mask)
        return m

    @jax.jit
    def train_step_indexed(params, opt_state, images_dev, idx, key):
        """Device-resident variant: the whole corpus lives on device
        ([N, 4, d, T]); per step only [B] indices and a PRNG key cross
        the host boundary, and the random mask is built inside the jit.
        One dispatch per step, no per-step host batch uploads (those
        leaked host memory and dominated wall time through the tunneled
        TPU runtime)."""
        batch = images_dev[idx]                         # [B, 4, d, T]
        mask = random_marker_mask(key, idx.shape[0],
                                  batch.shape[2], batch.shape[3])
        return train_step_inner(params, opt_state, batch, mask)

    def train_step_inner(params, opt_state, clip_img, mask):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, clip_img, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = loss
        return params, opt_state, metrics

    train_step.indexed = train_step_indexed
    return train_step, eval_step, opt


def batches(images: np.ndarray, batch_size: int,
            rng: np.random.RandomState, shuffle: bool = True
            ) -> Iterator[jnp.ndarray]:
    """[N, 4, T, d] -> [B, 4, d, T] batches (permute of
    train_loader_infill.py:344-346)."""
    idx = np.arange(len(images))
    if shuffle:
        rng.shuffle(idx)
    for s in range(0, len(idx) - batch_size + 1, batch_size):
        yield jnp.asarray(images[idx[s:s + batch_size]].swapaxes(2, 3))


def train(images_train: np.ndarray, cfg: InfillTrainConfig, num_steps: int,
          prox_masks: np.ndarray | None = None, seed: int = 0,
          steps_per_epoch: int | None = None, log_every: int = 500,
          callback=None):
    rng = np.random.RandomState(seed)
    params = init_infill_ae(jax.random.PRNGKey(seed),
                            in_channel=cfg.in_channel, kernel=cfg.conv_k)
    train_step, eval_step, opt = make_train_step(cfg)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed + 1)

    # whole corpus resident on device in the training layout: per step
    # only indices + a key cross the host boundary (random-mask phase)
    images_dev = jnp.asarray(images_train.swapaxes(2, 3))

    spe = steps_per_epoch or max(len(images_train) // cfg.batch_size, 1)
    history = []
    step = 0
    while step < num_steps:
        idx_order = rng.permutation(len(images_train))
        for start in range(0, len(images_train) - cfg.batch_size + 1,
                           cfg.batch_size):
            idx_np = idx_order[start:start + cfg.batch_size]
            epoch = step // spe
            key, sub = jax.random.split(key)
            if epoch <= cfg.random_mask_epochs or prox_masks is None:
                params, opt_state, metrics = train_step.indexed(
                    params, opt_state, images_dev, jnp.asarray(idx_np),
                    sub)
            else:
                batch = images_dev[jnp.asarray(idx_np)]
                d, T = batch.shape[2], batch.shape[3]
                pick = rng.randint(0, len(prox_masks), cfg.batch_size)
                mask = jnp.asarray(
                    prox_mask_to_image_mask(prox_masks[pick], d, T))
                params, opt_state, metrics = train_step(params, opt_state,
                                                        batch, mask)
            step += 1
            if step % log_every == 0 or step == num_steps:
                rec = {k: float(v) for k, v in metrics.items()}
                rec["step"] = step
                history.append(rec)
                if callback:
                    callback(step, rec, params)
            if step >= num_steps:
                break
    return params, history
