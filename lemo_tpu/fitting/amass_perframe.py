"""AMASS Stage-1 fitting: masked infill inference + per-frame body fitting.

Capability parity with opt_amass_perframe.py:55-364, re-designed TPU-first:

- the infill stage (mask legs -> 60-step AE finetune -> decode ->
  de-normalize -> global-trajectory reconstruction) is one jitted pipeline
  (:mod:`lemo_tpu.fitting.infill`, :func:`reconstruct_marker_targets`);
- the per-frame optimization offers two modes:
  * ``parallel`` (default, TPU-first): all T frames optimized jointly in a
    single batched Adam scan — frames are independent given their marker
    targets, so this is mathematically the per-frame problem, solved with
    full MXU utilization instead of T sequential 100-step loops;
  * ``sequential`` (reference-faithful): a lax.scan over frames, each
    warm-started from the previous frame's optimum with the reference's
    lr schedule (0.1 for frame 0, 0.01 after, decaying to 0.003 at step
    80; opt_amass_perframe.py:316-330).

Loss (opt_amass_perframe.py:339-353): L1 marker reconstruction +
0.02 |z_vposer|^2 + 0.01 |betas|^2 + 0.01 |hand|^2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lemo_tpu.body_model import SmplxModel, make_forward_fn
from lemo_tpu.data.repr import reconstruct_global_body
from lemo_tpu.data.stats import Local4ChanStats
from lemo_tpu.fitting import params as P
from lemo_tpu.fitting.adam import piecewise_lr, run_adam
from lemo_tpu.ops.rotations import aa_to_rot6d, rot6d_to_aa
from lemo_tpu.ops.select import onehot_rows, take_rows


@dataclasses.dataclass
class Stage1Weights:
    rec_markers: float = 1.0
    vposer: float = 0.02
    shape: float = 0.01
    hand: float = 0.01


def reconstruct_marker_targets(
    clip_img_rec: jnp.ndarray,   # [1, d, T] infilled channel (normalized)
    clip_img_input: jnp.ndarray,  # [4, d, T] original image (normalized)
    stats: Local4ChanStats,
    rot_0_pivot: jnp.ndarray,
):
    """Normalized infilled image -> global marker targets [T, 67, 3].

    Mirrors opt_amass_perframe.py:241-287: channel-0 body rows + the
    original global-trajectory channels, de-normalized, integrated back to
    world coordinates, pelvis dropped.
    """
    body_rows = clip_img_rec[0, :-4, :]          # [(1+67)*3, T]
    traj = jnp.stack([clip_img_input[1, 0], clip_img_input[2, 0],
                      clip_img_input[3, 0]], axis=0)  # [3, T]
    flat = jnp.concatenate([traj, body_rows], axis=0).T  # [T, 3+204]
    flat = stats.denormalize_flat(flat)
    T = flat.shape[0]
    grid = flat.reshape(T, -1, 3)  # [T, 69, 3]: row0 traj, 1 pelvis, 2.. markers
    body_in = jnp.concatenate(
        [jnp.zeros((T, 1, 3), flat.dtype), grid[:, 1:], grid[:, 0:1]], axis=1)
    rec = reconstruct_global_body(body_in, rot_0_pivot)  # [T, 68, 3]
    return rec[:, 1:, :]  # drop pelvis -> [T, 67, 3]


def default_init(T: int, dtype=jnp.float32):
    """Reference initialization (opt_amass_perframe.py:299-308)."""
    transl = jnp.zeros((T, 3), dtype).at[:, 1].set(0.4).at[:, 2].set(1.0)
    rot_aa = jnp.zeros((T, 3), dtype).at[:, 1].set(1.6).at[:, 2].set(3.14)
    return {
        "transl": transl,
        "rot6d": aa_to_rot6d(rot_aa),
        "other": jnp.zeros((T, 56), dtype),
    }


def _params72(opt_vars, shape10):
    """(transl, rot6d, other[56]) + fixed betas -> [T, 72]."""
    rot_aa = rot6d_to_aa(opt_vars["rot6d"])
    return jnp.concatenate(
        [opt_vars["transl"], rot_aa, shape10, opt_vars["other"]], axis=-1)


def make_stage1_loss(model: SmplxModel, vposer_params, marker_ids,
                     weights: Stage1Weights):
    fwd = make_forward_fn(model)
    # static selection as a one-hot MXU matmul (exact; see ops/select.py)
    sel = onehot_rows(marker_ids, model.consts["v_template"].shape[0])

    def loss_fn(opt_vars, shape10, markers_target):
        x72 = _params72(opt_vars, shape10)
        sp = P.smplx_params_from_72(x72, vposer_params,
                                    model.config.num_expressions)
        out = fwd(sp, model.consts)
        markers = take_rows(out["vertices"], sel)
        loss_marker = jnp.abs(markers - markers_target).mean()
        loss_vposer = (x72[:, 16:48] ** 2).mean()
        loss_shape = (x72[:, 6:16] ** 2).mean()
        loss_hand = (x72[:, 48:] ** 2).mean()
        return (weights.rec_markers * loss_marker
                + weights.vposer * loss_vposer
                + weights.shape * loss_shape
                + weights.hand * loss_hand)

    return loss_fn


def make_stage1_fitter(
    model: SmplxModel,
    vposer_params: dict,
    marker_ids,
    num_steps: int = 100,
    weights: Stage1Weights = Stage1Weights(),
):
    """Build a reusable jit-compiled parallel Stage-1 fitter:
    ``fit(markers_target [T,67,3], beta [10]) -> ([T,72], losses)``.
    Compiles once; reuse across clips (a fresh closure per clip would
    re-trace the whole scan each call)."""
    loss_fn = make_stage1_loss(model, vposer_params, marker_ids, weights)
    lr_table = piecewise_lr([(0, 0.1), (int(num_steps * 0.6), 0.01),
                             (int(num_steps * 0.8), 0.003)], num_steps)

    @jax.jit
    def fit(markers_target, beta):
        T = markers_target.shape[0]
        shape10 = jnp.broadcast_to(beta[None], (T, 10))
        init = default_init(T)
        final, losses, _ = run_adam(
            lambda v: loss_fn(v, shape10, markers_target),
            init, num_steps, lr_table)
        return _params72(final, shape10), losses

    return fit


def fit_clip(
    model: SmplxModel,
    vposer_params: dict,
    marker_ids,
    markers_target: jnp.ndarray,  # [T, 67, 3]
    beta: jnp.ndarray,            # [10] fixed shape
    mode: str = "parallel",
    num_steps: int = 100,
    weights: Stage1Weights = Stage1Weights(),
):
    """Fit a clip to its marker targets. Returns ([T, 72] params, losses).

    One-shot convenience (traces per call); loops over clips should build
    the fitter once via :func:`make_stage1_fitter`.
    """
    T = markers_target.shape[0]
    shape10 = jnp.broadcast_to(beta[None], (T, 10))
    loss_fn = make_stage1_loss(model, vposer_params, marker_ids, weights)

    if mode == "parallel":
        fit = make_stage1_fitter(model, vposer_params, marker_ids,
                                 num_steps, weights)
        return fit(markers_target, beta)

    if mode == "sequential":
        # reference-faithful warm-start chain over frames
        lr0 = piecewise_lr([(0, 0.1), (61, 0.01), (81, 0.003)], num_steps)
        lrW = piecewise_lr([(0, 0.01), (81, 0.003)], num_steps)
        init0 = {k: v[0:1] for k, v in default_init(1).items()}

        def frame_loss(v, s, m):
            return loss_fn(v, s[None], m[None])

        def fit_frame(carry_vars, inp):
            shape_t, markers_t, is_first = inp
            lr_table = jnp.where(is_first, lr0, lrW)
            final, losses, _ = run_adam(
                lambda v: frame_loss(v, shape_t, markers_t),
                carry_vars, num_steps, lr_table)
            return final, (jnp.concatenate(
                [final["transl"], rot6d_to_aa(final["rot6d"]),
                 shape_t[None], final["other"]], axis=-1)[0], losses[-1])

        is_first = jnp.arange(T) == 0
        _, (rows, last_losses) = jax.lax.scan(
            fit_frame, init0, (shape10, markers_target, is_first))
        return rows, last_losses

    raise ValueError(mode)
