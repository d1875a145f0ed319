"""Motion-infill pre-pass for PROX windows.

The reference computes infill targets lazily inside the loss at opt step 0
(fitting_temp_slide.py:820-941): build the Holden 4-channel image from the
current (warm-start) body, mask it with the per-frame marker occlusion
mask, finetune the pretrained AE for 60 steps, decode once, integrate the
trajectory back, and cache the resulting world-space marker targets +
contact labels for all later iterations.

Here that hidden state is an explicit stage: run once per window before
the main fit, entirely on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lemo_tpu.data import repr as rep
from lemo_tpu.data.stats import Local4ChanStats
from lemo_tpu.fitting import infill as fi
from lemo_tpu.fitting.amass_perframe import reconstruct_marker_targets


@dataclasses.dataclass
class InfillPrepassResult:
    targets_world: jnp.ndarray   # [T-1, 67, 3]
    contact_lbl: jnp.ndarray     # [T-1, 4]
    had_occlusion: bool


def build_marker_image(markers_world: jnp.ndarray,
                       joints_world: jnp.ndarray,
                       stats: Local4ChanStats):
    """[T,67,3] world markers + [T,25,3] world joints -> normalized
    [4, T-1, d] image and the transform back
    (fitting_temp_slide.py:779-831)."""
    joints0 = joints_world[0]
    R, origin = rep.frame0_normalizer(joints0)
    joints_n = jnp.matmul(joints_world - origin, R)
    markers_n = jnp.matmul(markers_world - origin, R)
    contact = rep.contact_labels_from_markers(markers_n)
    pm = jnp.concatenate([joints_n[:, 0:1], markers_n], axis=1)
    img, rot0 = rep.local_markers_4chan(pm, contact, smooth_forward=False)
    img = stats.normalize(img[None])[0]  # [4, T-1, d]
    min_z = markers_n[:, :, 2].min()
    return img, rot0, (R, origin, min_z)


def marker_mask_to_image_mask(marker_mask: jnp.ndarray, d: int, Tm1: int):
    """[T, 67] per-frame marker visibility -> [d, T-1] channel-0 mask
    (pelvis rows kept; contact rows masked when that foot's markers are,
    fitting_temp_slide.py:836-853)."""
    mm = jnp.repeat(marker_mask[:Tm1].T, 3, axis=0)  # [201, T-1]
    pelvis = jnp.ones((3, Tm1), mm.dtype)
    left_ok = jnp.logical_and(mm[16 * 3] == 1, mm[30 * 3] == 1)
    right_ok = jnp.logical_and(mm[47 * 3] == 1, mm[60 * 3] == 1)
    contact_rows = jnp.stack([left_ok, right_ok, left_ok, right_ok]
                             ).astype(mm.dtype)
    return jnp.concatenate([pelvis, mm, contact_rows], axis=0)  # [208, T-1]


def _prepass_core(ae_params: dict, markers_world: jnp.ndarray,
                  joints_world: jnp.ndarray, marker_mask: jnp.ndarray,
                  stats: Local4ChanStats, finetune_steps: int,
                  finetune_lr: float):
    """Pure-jax core: -> (targets_world [T-1,67,3], contact_lbl [T-1,4]).
    Traceable end to end, so it vmaps over a leading window axis."""
    markers_world = jnp.asarray(markers_world)
    joints_world = jnp.asarray(joints_world)
    marker_mask = jnp.asarray(marker_mask)
    img, rot0, (R, origin, min_z) = build_marker_image(
        markers_world, joints_world, stats)
    Tm1, d = img.shape[1], img.shape[2]
    mask = marker_mask_to_image_mask(marker_mask, d, Tm1)  # [d, T-1]

    rec, _, _ = fi.infill_infer(ae_params, img.swapaxes(1, 2)[None],
                                mask, finetune_steps=finetune_steps,
                                finetune_lr=finetune_lr)
    # rec: [1, 1, d, T-1]
    contact_lbl = fi.contact_labels_from_rec(rec)[0]  # [T-1, 4]

    img_dT = img.swapaxes(1, 2)  # [4, d, T-1] original for traj channels
    targets_norm = reconstruct_marker_targets(rec[0], img_dT, stats, rot0)
    # back to world: restore floor offset, invert frame-0 normalization
    targets = targets_norm.at[:, :, 2].add(min_z)
    targets_world = jnp.matmul(targets, jnp.linalg.inv(R)) + origin
    return (jax.lax.stop_gradient(targets_world),
            jax.lax.stop_gradient(contact_lbl))


# jitted _prepass_core per (stats object, finetune schedule): the core
# contains the 60-step AE finetune — eager execution dispatched it step
# by step (minutes per call on CPU, dozens of round-trips on TPU), and
# every caller reuses one compilation per shape
_CORE_CACHE: dict = {}


def run_infill_prepass(
    ae_params: dict,
    markers_world: jnp.ndarray,   # [T, 67, 3] from the warm-start body
    joints_world: jnp.ndarray,    # [T, 25, 3]
    marker_mask: jnp.ndarray,     # [T, 67]
    stats: Local4ChanStats,
    finetune_steps: int = 60,
    finetune_lr: float = 3e-6,
) -> InfillPrepassResult:
    from functools import partial

    key = (id(stats), finetune_steps, finetune_lr)
    if key not in _CORE_CACHE:
        _CORE_CACHE[key] = jax.jit(partial(
            _prepass_core, stats=stats, finetune_steps=finetune_steps,
            finetune_lr=finetune_lr))
        if len(_CORE_CACHE) > 4:
            _CORE_CACHE.pop(next(iter(_CORE_CACHE)))
    targets_world, contact_lbl = _CORE_CACHE[key](
        ae_params, markers_world, joints_world, marker_mask)
    had_occ = bool(marker_mask.size > float(marker_mask.sum()))
    return InfillPrepassResult(
        targets_world=targets_world,
        contact_lbl=contact_lbl,
        had_occlusion=had_occ,
    )


def make_batched_prepass(stats: Local4ChanStats, finetune_steps: int = 60,
                         finetune_lr: float = 3e-6):
    """One jitted dispatch for ALL windows of a recording: vmaps the
    60-step AE finetune + decode over a leading window axis (the
    window-parallel driver previously ran W sequential pre-passes).

    Returns ``prepass(ae_params, mv [W,T,67,3], mj [W,T,25,3],
    mask [W,T,67]) -> (targets_world [W,T-1,67,3], contact [W,T-1,4])``.
    """
    from functools import partial

    core = partial(_prepass_core, stats=stats,
                   finetune_steps=finetune_steps, finetune_lr=finetune_lr)
    return jax.jit(jax.vmap(core, in_axes=(None, 0, 0, 0)))
