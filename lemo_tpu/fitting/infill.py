"""Masked motion-infill inference with per-clip self-supervised finetuning.

Capability parity with the reference's infill stage
(opt_amass_perframe.py:117-190, fitting_temp_slide.py:820-941): the
pretrained infill AE is finetuned for 60 Adam steps at lr 3e-6 on the
reconstruction residual of the *visible* entries, then run once in eval
mode to produce the infilled motion image and contact labels.

TPU redesign: the whole stage — masking, padding, the 60-step finetune
scan, and the final forward — is one jitted computation. The "load
pretrained weights, finetune a copy" statefulness of the reference becomes
a pure function from (pretrained params, clip) to (infilled image,
contact labels).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lemo_tpu.data import markers as mk
from lemo_tpu.fitting.adam import run_adam
from lemo_tpu.ops.signal import reflect_pad_dt, unpad_dt
from lemo_tpu.priors.conv_ae import infill_ae_forward


def leg_mask_rows(d: int, mode: str = "local_markers_4chan") -> np.ndarray:
    """Row indices of the leg markers to zero during AMASS infill inference
    (opt_amass_perframe.py:136-147). `d` is the image height."""
    base = mk.LEG_MASK_MARKER_SLOTS * 3
    offset = 3 if mode == "local_markers_4chan" else 6  # pelvis (+traj)
    rows = np.concatenate([base + offset, base + offset + 1,
                           base + offset + 2])
    return np.sort(rows)


def amass_input_mask(d: int, T: int,
                     mode: str = "local_markers_4chan") -> np.ndarray:
    """[d, T] multiplicative mask (1=keep) for channel 0: zero leg-marker
    rows and the 4 contact rows."""
    m = np.ones((d, T), np.float32)
    m[leg_mask_rows(d, mode)] = 0.0
    m[-4:] = 0.0
    return m


def finetune_weight_from_mask(mask_dT: jnp.ndarray) -> jnp.ndarray:
    """Residual weights on the PADDED image from a [., d, T] keep-mask:
    reflect-pad, then zero the bottom 5 rows (4 contact + 1 pad row) —
    opt_amass_perframe.py:166-169 / fitting_temp_slide.py:878-881."""
    w = reflect_pad_dt(mask_dT)
    return w.at[..., -5:, :].set(0.0)


from functools import partial


@partial(jax.jit, static_argnames=("finetune_steps", "finetune_lr", "kernel"))
def infill_infer(
    ae_params: dict,
    clip_img: jnp.ndarray,       # [B, C, d, T] normalized motion image
    input_mask: jnp.ndarray,     # [B or 1, d, T] or [d, T]; 1 = visible
    finetune_steps: int = 60,
    finetune_lr: float = 3e-6,
    kernel: int = 3,
):
    """Returns (clip_img_rec [B, 1, d, T], finetuned params, losses).

    The input has its channel-0 masked entries zeroed, is reflect-padded
    (8, 8, 1, 1), the AE is finetuned on the visible-entry residual of
    channel 0, and the final reconstruction is un-padded. Jitted end to
    end (the jit cache persists across clips/windows of equal shape).
    """
    if input_mask.ndim == 2:
        input_mask = input_mask[None]
    x = clip_img.at[:, 0].multiply(input_mask)
    x = reflect_pad_dt(x)  # [B, C, d+2, T+16]

    w = finetune_weight_from_mask(input_mask)  # [B or 1, d+2, T+16]
    w_sum = jnp.maximum(w.sum(), 1.0)

    def loss_fn(p):
        rec, _ = infill_ae_forward(p, x, kernel=kernel)
        res = jnp.abs(rec[:, 0] - x[:, 0]) * w
        return res.sum() / w_sum

    if finetune_steps > 0:
        lr_table = jnp.full((finetune_steps,), finetune_lr)
        tuned, losses, _ = run_adam(loss_fn, ae_params, finetune_steps,
                                    lr_table)
    else:
        # finetune disabled: decode with the pretrained weights as-is
        # (scan of length 0 would still trace lr_table[count] on a
        # size-0 table)
        tuned, losses = ae_params, jnp.zeros((0,))

    rec, _ = infill_ae_forward(tuned, x, kernel=kernel)
    rec = unpad_dt(rec)
    return rec, tuned, losses


def contact_labels_from_rec(clip_img_rec: jnp.ndarray) -> jnp.ndarray:
    """Binary contact labels from the reconstructed image's last 4 rows
    (sigmoid + 0.5 threshold, opt_amass_perframe.py:235-237).

    clip_img_rec: [B, 1, d, T] -> labels [B, T, 4].
    """
    logits = clip_img_rec[:, 0, -4:, :].swapaxes(1, 2)  # [B, T, 4]
    return (jax.nn.sigmoid(logits) > 0.5).astype(clip_img_rec.dtype)
