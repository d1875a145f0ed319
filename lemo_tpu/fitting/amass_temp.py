"""AMASS Stage-2: temporal whole-clip fitting with the learned smoothness
prior and foot-contact friction.

Capability parity with opt_amass_temp.py:62-458: initialize from the
Stage-1 per-frame solution, then jointly optimize all T frames for 100
Adam steps (lr 0.01 -> 0.005 after step 60) under

  L = w_m  * L1(markers, targets)                      (1.0)
    + w_vp * |z_vposer|^2 + w_sh * |betas|^2 + w_h * |hand|^2
    + w_sm * mean(dz/dt of the frozen smoothness encoder)^2   (1e6)
    + w_cv * hinge(contact-vertex speed - 0.1)                (0.03)

TPU design: the full 100-step fit is one jitted lax.scan; the smoothness
encoder runs frozen inside the loss (its params are closure constants).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lemo_tpu.body_model import SmplxModel, make_forward_fn
from lemo_tpu.data.stats import GlobalStats
from lemo_tpu.fitting import params as P
from lemo_tpu.fitting.adam import piecewise_lr, run_adam
from lemo_tpu.ops.rotations import aa_to_rot6d, rot6d_to_aa
from lemo_tpu.ops.select import onehot_rows, take_rows
from lemo_tpu.ops.signal import reflect_pad_dt
from lemo_tpu.priors.conv_ae import smooth_enc_forward


@dataclasses.dataclass
class Stage2Weights:
    rec_markers: float = 1.0
    vposer: float = 0.02
    shape: float = 0.01
    hand: float = 0.01
    smooth: float = 1e6
    contact_vel: float = 0.03


def _weight_args(weights: "Stage2Weights") -> dict:
    """Weights as f32 scalars to pass INTO the jitted fit (zero-weight
    terms stay pruned at trace time from the build-time values; nonzero
    values become traced scalars, so fitters differing only in weight
    VALUES lower to identical HLO and share one compiled program /
    persistent-cache entry)."""
    return {f.name: jnp.float32(getattr(weights, f.name))
            for f in dataclasses.fields(weights)}


def smoothness_prior_loss(enc_params, markers_with_hand, joints_frame0,
                          stats: GlobalStats):
    """Latent-acceleration loss of the frozen smoothness encoder.

    markers_with_hand: [T, 81, 3]; joints_frame0: [25, 3] (detached).
    Mirrors opt_amass_temp.py:363-391 — frame-0 normalization uses the
    joint-derived rotation but the FIRST SMOOTH MARKER of frame 0 as the
    origin.
    """
    from lemo_tpu.data.repr import frame0_normalizer

    R, _ = frame0_normalizer(jax.lax.stop_gradient(joints_frame0))
    origin = jax.lax.stop_gradient(markers_with_hand[0, 0])
    m = jnp.matmul(markers_with_hand - origin, R)  # [T, 81, 3]
    clip = m.reshape(m.shape[0], -1)[None]  # [1, T, d]
    clip = (clip - jnp.asarray(stats.Xmean, clip.dtype)) / \
        jnp.asarray(stats.Xstd, clip.dtype)
    img = clip.swapaxes(1, 2)[:, None]  # [1, 1, d, T]
    vel = img[..., 1:] - img[..., :-1]
    vel = reflect_pad_dt(vel)
    z, _ = smooth_enc_forward(enc_params, vel, downsample=False)
    dz = z[..., 1:] - z[..., :-1]
    return (dz ** 2).mean()


def smoothness_prior_loss_batched(enc_params, markers, joints_frame0,
                                  stats: GlobalStats,
                                  reduce_clips: bool = True):
    """Clip-batched form of :func:`smoothness_prior_loss`: markers
    [C, T, 81, 3], joints_frame0 [C, 25, 3] -> SUM of per-clip latent-
    acceleration losses. The C clip images run through the frozen
    encoder as ONE N=C convolution batch — the conv prior is the FLOP
    anchor of the Stage-2 step and batch-1 convs waste most of the MXU
    (PERF.md round-3 anatomy), so this is where clip batching pays."""
    from lemo_tpu.data.repr import frame0_normalizer

    C, T = markers.shape[0], markers.shape[1]
    R = jax.vmap(lambda j: frame0_normalizer(j)[0])(
        jax.lax.stop_gradient(joints_frame0))          # [C, 3, 3]
    origin = jax.lax.stop_gradient(markers[:, 0, 0])   # [C, 3]
    # default precision: matches the single-clip form's jnp.matmul
    m = jnp.einsum("ctmk,ckn->ctmn", markers - origin[:, None, None], R)
    clip = m.reshape(C, T, -1)
    clip = (clip - jnp.asarray(stats.Xmean, clip.dtype)) / \
        jnp.asarray(stats.Xstd, clip.dtype)
    img = clip.swapaxes(1, 2)[:, None]                 # [C, 1, d, T]
    vel = img[..., 1:] - img[..., :-1]
    vel = reflect_pad_dt(vel)
    z, _ = smooth_enc_forward(enc_params, vel, downsample=False)
    dz = z[..., 1:] - z[..., :-1]
    per_clip = (dz ** 2).mean(axis=(1, 2, 3))
    return per_clip.sum() if reduce_clips else per_clip


def contact_friction_loss(verts, contact_lbl, foot_ids, fps: float = 30.0,
                          vel_thresh: float = 0.1, foot_sel=None):
    """Hinge on contact-vertex speeds (opt_amass_temp.py:406-447).

    verts: [T, V, 3]; contact_lbl: [T, 4] (lheel, rheel, ltoe, rtoe);
    foot_ids: dict of vertex-id arrays. Per foot part, averages speeds
    exceeding 0.1 m/s over frames labeled in contact.

    foot_sel: optional (one-hot [Nf, V], {part: slice}) built by the
    fitter — selecting feet FIRST (an MXU matmul) and differencing the
    selected rows skips materializing the [T-1, V, 3] velocity field and
    its scatter-add backward (selection is linear, so the velocity is
    identical).
    """
    parts = ["left_heel", "right_heel", "left_toe", "right_toe"]
    if foot_sel is not None:
        sel, slices = foot_sel
        feet = take_rows(verts, sel)                   # [T, Nf, 3]
        vel_f = (feet[1:] - feet[:-1]) * fps
        per_part = {p: vel_f[:, slices[p], :] for p in parts}
    else:
        vel = (verts[1:] - verts[:-1]) * fps           # [T-1, V, 3]
        per_part = {p: vel[:, jnp.asarray(foot_ids[p]), :] for p in parts}
    total = 0.0
    for i, part in enumerate(parts):
        # eps-guarded norm: d|v|/dv is NaN at v=0 (static feet), and the
        # NaN survives multiplication by a zero mask
        speeds = jnp.sqrt((per_part[part] ** 2).sum(-1) + 1e-12)
        w = contact_lbl[:-1, i][:, None]  # contact frames only
        over = (speeds > vel_thresh).astype(speeds.dtype) * w
        total = total + jnp.sum(speeds * over) / jnp.maximum(over.sum(), 1.0)
    return total


def contact_friction_loss_batched(feet, contact_lbl, part_slices,
                                  fps: float = 30.0,
                                  vel_thresh: float = 0.1,
                                  reduce_clips: bool = True):
    """Clip-batched friction: pre-selected foot vertices [C, T, Nf, 3]
    + labels [C, T, 4] -> per-clip hinge losses [C] (or their sum;
    velocities are differenced WITHIN each clip)."""
    vel = (feet[:, 1:] - feet[:, :-1]) * fps           # [C, T-1, Nf, 3]
    per_clip = 0.0
    for i, part in enumerate(["left_heel", "right_heel", "left_toe",
                              "right_toe"]):
        vp_ = vel[:, :, part_slices[part], :]
        speeds = jnp.sqrt((vp_ ** 2).sum(-1) + 1e-12)  # [C, T-1, n]
        w = contact_lbl[:, :-1, i][..., None]
        over = (speeds > vel_thresh).astype(speeds.dtype) * w
        num = (speeds * over).sum(axis=(1, 2))         # [C]
        den = jnp.maximum(over.sum(axis=(1, 2)), 1.0)
        per_clip = per_clip + num / den
    return per_clip.sum() if reduce_clips else per_clip


def _make_fit_core_folded(
    model: SmplxModel,
    vposer_params: dict,
    smooth_enc_params: dict,
    smooth_stats: GlobalStats,
    marker_ids_67,
    marker_ids_81,
    foot_ids: dict,
    num_steps: int = 100,
    weights: Stage2Weights = Stage2Weights(),
    fused: bool = True,
):
    """Clip-batched Stage-2 fit core with the clip axis FOLDED into the
    forward's frame batch (C*T frames through one SMPL-X forward) instead
    of vmapped. Pass fused=False when the clip axis is sharded over a
    REAL device mesh (clip_sharded_fit): the GSPMD partitioner treats
    the fused pallas_call as an opaque custom call and would gather its
    operands to one device.

    Why: vmap blocks the fused Pallas vertex path (batching a
    pallas_call broadcasts its 64 MB dirs operand) and runs the conv
    prior at batch 1 per clip; folding keeps the fused kernel and runs
    one N=C convolution. The math is the per-clip SUM of the single-clip
    losses — clip parameters are disjoint, so gradients equal the
    vmapped form's, and Adam is elementwise, so trajectories match up to
    f32 reassociation. The NaN guard is per-clip, like the vmapped form:
    a diverging clip freezes only its own parameters (its per-clip loss
    drives a [C] dead mask), so the other clips keep fitting.
    """
    fwd = make_forward_fn(model, fused=fused)
    V = model.consts["v_template"].shape[0]
    sel67 = onehot_rows(marker_ids_67, V)
    sel81 = onehot_rows(marker_ids_81, V)
    import numpy as _np

    _parts = ["left_heel", "right_heel", "left_toe", "right_toe"]
    _all_ids, _slices, _off = [], {}, 0
    for _p in _parts:
        _ids = _np.asarray(foot_ids[_p])
        _slices[_p] = slice(_off, _off + len(_ids))
        _all_ids.append(_ids)
        _off += len(_ids)
    sel_feet = onehot_rows(_np.concatenate(_all_ids), V)
    lr_table = piecewise_lr([(0, 0.01), (61, 0.005)], num_steps)

    def loss_fn(v, shape10, markers_target, contact_lbl, wv):
        C, T = markers_target.shape[0], markers_target.shape[1]
        x72 = jnp.concatenate(
            [v["transl"], rot6d_to_aa(v["rot6d"]), shape10, v["other"]],
            axis=-1)                                    # [C, T, 72]
        sp = P.smplx_params_from_72(x72.reshape(C * T, 72), vposer_params,
                                    model.config.num_expressions)
        out = fwd(sp, model.consts)
        verts = out["vertices"]                         # [C*T, V, 3]
        mk = take_rows(verts, sel67).reshape(C, T, 67, 3)
        per_clip = wv["rec_markers"] * \
            jnp.abs(mk - markers_target).mean(axis=(1, 2, 3))  # [C]
        per_clip = per_clip + wv["vposer"] * \
            (x72[..., 16:48] ** 2).mean(axis=(1, 2))
        per_clip = per_clip + wv["shape"] * \
            (x72[..., 6:16] ** 2).mean(axis=(1, 2))
        per_clip = per_clip + wv["hand"] * \
            (x72[..., 48:] ** 2).mean(axis=(1, 2))
        if weights.smooth:
            m81 = take_rows(verts, sel81).reshape(C, T, -1, 3)
            j0 = out["joints"].reshape(C, T, -1, 3)[:, 0, :25]
            per_clip = per_clip + wv["smooth"] * \
                smoothness_prior_loss_batched(
                    smooth_enc_params, m81, j0, smooth_stats,
                    reduce_clips=False)
        if weights.contact_vel:
            feet = take_rows(verts, sel_feet).reshape(C, T, -1, 3)
            per_clip = per_clip + wv["contact_vel"] * \
                contact_friction_loss_batched(feet, contact_lbl, _slices,
                                              reduce_clips=False)
        return per_clip.sum(), per_clip

    def fit_core(markers_target, contact_lbl, init72, wv=None):
        import optax

        if wv is None:  # direct-jit callers: weights bake to constants
            wv = _weight_args(weights)
        shape10 = init72[..., 6:16]  # betas frozen (opt_amass_temp.py:335)
        init_vars = {
            "transl": init72[..., 0:3],
            "rot6d": aa_to_rot6d(init72[..., 3:6]),
            "other": init72[..., 16:],
        }
        C = init72.shape[0]
        opt = optax.adam(learning_rate=lambda count: lr_table[count],
                         b1=0.9, b2=0.999, eps=1e-8)
        grad_fn = jax.value_and_grad(
            lambda v: loss_fn(v, shape10, markers_target, contact_lbl, wv),
            has_aux=True)

        def step(carry, _):
            v, state, dead = carry                      # dead [C] bool
            (_, per_clip), grads = grad_fn(v)
            updates, new_state = opt.update(grads, state, v)
            new_v = optax.apply_updates(v, updates)
            bad = jnp.logical_or(jnp.isnan(per_clip), jnp.isinf(per_clip))
            dead = jnp.logical_or(dead, bad)

            def keep(n, o):
                # clip parameters and Adam moments are [C, ...]; the Adam
                # step count is a shared scalar (harmless for dead clips —
                # their updates are masked out entirely)
                if n.ndim >= 1 and n.shape[0] == C:
                    return jnp.where(
                        dead.reshape((C,) + (1,) * (n.ndim - 1)), o, n)
                return n

            v = jax.tree_util.tree_map(keep, new_v, v)
            state = jax.tree_util.tree_map(keep, new_state, state)
            return (v, state, dead), per_clip

        (final, _, _), per_clip = jax.lax.scan(
            step, (init_vars, opt.init(init_vars), jnp.zeros((C,), bool)),
            None, length=num_steps)
        x72 = jnp.concatenate(
            [final["transl"], rot6d_to_aa(final["rot6d"]), shape10,
             final["other"]], axis=-1)
        return x72, per_clip.T                          # losses [C, S]

    return fit_core


def _make_fit_core(
    model: SmplxModel,
    vposer_params: dict,
    smooth_enc_params: dict,
    smooth_stats: GlobalStats,
    marker_ids_67,
    marker_ids_81,
    foot_ids: dict,
    num_steps: int = 100,
    weights: Stage2Weights = Stage2Weights(),
    fused: bool = True,
):
    """Build the un-jitted Stage-2 fit core
    ``fit(markers_target, contact_lbl, init72) -> (x72, losses)``; the
    public wrappers jit it once (single-clip) or vmap+jit it
    (clip-batched, `fused=False` — the fused Pallas vertex path must not
    be vmapped) — calling a fresh closure per clip would re-trace the
    whole 100-step scan every time (tens of seconds of compile).
    """
    fwd = make_forward_fn(model, fused=fused)
    V = model.consts["v_template"].shape[0]
    # static marker selection as one-hot MXU matmuls — gather+scatter of
    # marker rows measured ~0.8 ms of the ~3.7 ms step (see ops/select.py)
    sel67 = onehot_rows(marker_ids_67, V)
    sel81 = onehot_rows(marker_ids_81, V)
    import numpy as _np

    _parts = ["left_heel", "right_heel", "left_toe", "right_toe"]
    _all_ids, _slices, _off = [], {}, 0
    for _p in _parts:
        _ids = _np.asarray(foot_ids[_p])
        _slices[_p] = slice(_off, _off + len(_ids))
        _all_ids.append(_ids)
        _off += len(_ids)
    foot_sel = (onehot_rows(_np.concatenate(_all_ids), V), _slices)
    lr_table = piecewise_lr([(0, 0.01), (61, 0.005)], num_steps)

    def loss_fn(v, shape10, markers_target, contact_lbl, wv):
        x72 = jnp.concatenate(
            [v["transl"], rot6d_to_aa(v["rot6d"]), shape10, v["other"]],
            axis=-1)
        sp = P.smplx_params_from_72(x72, vposer_params,
                                    model.config.num_expressions)
        out = fwd(sp, model.consts)
        verts = out["vertices"]
        loss_marker = jnp.abs(take_rows(verts, sel67) - markers_target).mean()
        loss_vposer = (x72[:, 16:48] ** 2).mean()
        loss_shape = (x72[:, 6:16] ** 2).mean()
        loss_hand = (x72[:, 48:] ** 2).mean()
        total = (wv["rec_markers"] * loss_marker
                 + wv["vposer"] * loss_vposer
                 + wv["shape"] * loss_shape
                 + wv["hand"] * loss_hand)
        # zero-weight terms pruned at trace time (the BUILD-time weights
        # gate; the values themselves are traced scalars)
        if weights.smooth:
            total = total + wv["smooth"] * smoothness_prior_loss(
                smooth_enc_params, take_rows(verts, sel81),
                out["joints"][0, :25], smooth_stats)
        if weights.contact_vel:
            total = total + wv["contact_vel"] * contact_friction_loss(
                verts, contact_lbl, foot_ids, foot_sel=foot_sel)
        return total

    def fit_core(markers_target, contact_lbl, init72, wv=None):
        if wv is None:  # direct-jit callers: weights bake to constants
            wv = _weight_args(weights)
        shape10 = init72[:, 6:16]  # betas frozen (opt_amass_temp.py:335)
        init_vars = {
            "transl": init72[:, 0:3],
            "rot6d": aa_to_rot6d(init72[:, 3:6]),
            "other": init72[:, 16:],
        }
        final, losses, _ = run_adam(
            lambda v: loss_fn(v, shape10, markers_target, contact_lbl, wv),
            init_vars, num_steps, lr_table)
        x72 = jnp.concatenate(
            [final["transl"], rot6d_to_aa(final["rot6d"]), shape10,
             final["other"]], axis=-1)
        return x72, losses

    return fit_core


def _weights_from(args, kwargs) -> Stage2Weights:
    """The `weights` value a _make_fit_core* signature received."""
    if "weights" in kwargs:
        return kwargs["weights"]
    return args[8] if len(args) > 8 else Stage2Weights()


def make_temporal_fitter(*args, **kwargs):
    """Single-clip Stage-2 fitter: fit(markers [T,67,3], contact [T,4],
    init72 [T,72]) -> (x72, losses); compiled once, reused across clips.
    Weight VALUES are passed into the compiled program as scalars, so
    fitters that differ only in (nonzero) weights share one executable."""
    jfit = jax.jit(_make_fit_core(*args, **kwargs))
    wv = _weight_args(_weights_from(args, kwargs))

    def fit(markers_target, contact_lbl, init72):
        return jfit(markers_target, contact_lbl, init72, wv)

    return fit


def make_temporal_fitter_batched(*args, impl: str = "fold", **kwargs):
    """Clip-BATCHED Stage-2 fitter: every input/output gains a leading
    clip axis C (markers [C,T,67,3], ...). This is the production corpus
    layout: one chip fits C clips at once, and the device mesh shards
    the corpus (parallel.clip_sharded_fit).

    impl='fold' (default): the clip axis is folded into the forward's
    frame batch — the fused Pallas vertex path stays active and the conv
    prior runs as one N=C batch (PERF.md round-3: the conv is the step's
    FLOP anchor and wastes most of the MXU at N=1). Gradients equal the
    vmapped form's (clip parameters are disjoint, Adam is elementwise);
    trajectories match up to f32 reassociation.

    impl='vmap': the original vmapped core (per-clip NaN freeze; the
    fused kernel is disabled — batching a pallas_call would broadcast
    its dirs operand).
    """
    wv = _weight_args(_weights_from(args, kwargs))
    if impl == "fold":
        jfit = jax.jit(_make_fit_core_folded(*args, **kwargs))

        def fit(markers_target, contact_lbl, init72):
            return jfit(markers_target, contact_lbl, init72, wv)

        # read by parallel.clip_sharded_fit: GSPMD treats the fused
        # pallas_call as an opaque custom call and would gather its ~64 MB
        # dirs operand to one device — sharded callers must build with
        # fused=False
        fit._lemo_fused = bool(kwargs.get("fused", True))
        return fit
    kwargs["fused"] = False
    jfit = jax.jit(jax.vmap(_make_fit_core(*args, **kwargs),
                            in_axes=(0, 0, 0, None)))

    def fit(markers_target, contact_lbl, init72):
        return jfit(markers_target, contact_lbl, init72, wv)

    fit._lemo_fused = False
    return fit


def fit_clip_temporal(
    model: SmplxModel,
    vposer_params: dict,
    smooth_enc_params: dict,
    smooth_stats: GlobalStats,
    marker_ids_67,
    marker_ids_81,
    foot_ids: dict,
    markers_target: jnp.ndarray,  # [T, 67, 3]
    contact_lbl: jnp.ndarray,     # [T, 4]
    init72: jnp.ndarray,          # [T, 72] Stage-1 solution
    num_steps: int = 100,
    weights: Stage2Weights = Stage2Weights(),
):
    """One-shot convenience wrapper (traces per call — for loops over many
    clips build the fitter once with :func:`make_temporal_fitter`)."""
    fit = make_temporal_fitter(model, vposer_params, smooth_enc_params,
                               smooth_stats, marker_ids_67, marker_ids_81,
                               foot_ids, num_steps, weights)
    return fit(markers_target, contact_lbl, init72)
