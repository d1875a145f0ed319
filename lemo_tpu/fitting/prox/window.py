"""Sliding-window PROX fitting: one window = one jitted optimization.

Capability parity with fit_temp_loadprox_slide.py:53-706 — warm-start from
the previous stage's pkls, stage-weighted SMPLify loss, overlap-consistency
gradient freezing, per-frame pkl results — re-designed so the entire
900-step Adam fit runs as a single device computation.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import SmplxModel, make_forward_fn
from lemo_tpu.body_model import vposer as vp
from lemo_tpu.fitting.prox.losses import ProxStatic, ProxWeights, \
    make_prox_loss


@dataclasses.dataclass
class WindowResult:
    params: dict[str, np.ndarray]       # optimized per-frame smplx params
    pose_embedding: np.ndarray          # [T, 32]
    body_pose: np.ndarray               # [T, 63]
    final_loss: float
    loss_history: np.ndarray
    term_history: dict[str, np.ndarray] | None = None  # per-step loss terms


def init_opt_vars(prox_params: dict[str, jnp.ndarray], T: int,
                  use_vposer: bool = True):
    """Warm-start optimization variables from PROXD/previous-stage params
    (fit_temp_loadprox_slide.py:494-505). Betas are averaged over the
    window and frozen (:497-498, :511). With `use_vposer=False` the pose
    variable is the raw 63-d body_pose (the reference's use_vposer=False
    branch, :257-267)."""
    mean_betas = prox_params["betas"].mean(axis=0, keepdims=True)
    betas = jnp.broadcast_to(mean_betas, (T, mean_betas.shape[1]))
    opt_vars = {
        "transl": prox_params["transl"],
        "global_orient": prox_params["global_orient"],
        "left_hand_pose": prox_params["left_hand_pose"],
        "right_hand_pose": prox_params["right_hand_pose"],
        "jaw_pose": prox_params["jaw_pose"],
        "leye_pose": prox_params["leye_pose"],
        "reye_pose": prox_params["reye_pose"],
        "expression": prox_params["expression"],
    }
    pose_key = "pose_embedding" if use_vposer else "body_pose"
    opt_vars[pose_key] = prox_params[pose_key]
    return opt_vars, betas


def overlap_grad_mask(T: int, overlap_frac: float = 0.15):
    """Zero gradients of the first 15% of frames on non-first windows
    (fitting_temp_slide.py:283-289) so overlapped frames keep the previous
    window's solution. `erase_n` is a traced scalar (0 on the first
    window) so one compilation serves both cases."""

    def mask_with(erase_n):
        frame_w = (jnp.arange(T) >= erase_n).astype(jnp.float32)

        def mask(grads):
            def apply(g):
                if g.ndim >= 1 and g.shape[0] == T:
                    return g * frame_w.reshape((T,) + (1,) * (g.ndim - 1))
                return g
            return jax.tree_util.tree_map(apply, grads)

        return mask

    return mask_with


def make_window_fitter(
    model: SmplxModel,
    vposer_params: dict,
    joint_mapper: np.ndarray,
    static_template: ProxStatic,
    weights: ProxWeights,
    maxiters: int = 900,
    lr: float = 0.005,
    overlap_frac: float = 0.15,
    optim_type: str = "adam",
    steps_per_dispatch: int = 100,
    priors: dict | None = None,
    use_vposer: bool = True,
):
    """Build the per-window optimizer, compiled ONCE for the recording.

    Returns ``fit(static, prox_params, first_window) -> (final, losses,
    terms, betas)``; all windows share shapes, so subsequent windows hit
    the jit cache (the reference pays its Python loop per step instead).
    """
    import optax

    T = static_template.gt_joints.shape[0]
    fwd = make_forward_fn(model)
    loss_fn = make_prox_loss(fwd, model.consts, joint_mapper, vposer_params,
                             static_template, weights,
                             model.config.num_expressions,
                             priors=priors, use_vposer=use_vposer)
    mask_with = overlap_grad_mask(T, overlap_frac)
    erase_frames = int(T * overlap_frac)

    if optim_type in ("lbfgs", "lbfgsls"):
        # strong-Wolfe L-BFGS over the whole window (the reference's
        # optim_type=lbfgsls option, optim_factory.py:27-65). Same
        # structure as the Adam path: chunked dispatches with optimizer
        # state carried across them, a built-in NaN freeze, per-step term
        # history, and the overlap gradient freeze — implemented here by
        # optimizing only the non-frozen frames (the frozen head is a
        # constant of the loss closure, which for L-BFGS is cleaner than
        # masking gradients: a masked dimension would still pollute the
        # curvature history).
        from lemo_tpu.fitting.lbfgs import make_lbfgs_stepper

        chunk_l = min(max(int(steps_per_dispatch), 1), maxiters)
        erase_n_static = int(T * overlap_frac)

        def loss_tail(tail, head, betas, static):
            full = {k: jnp.concatenate([head[k], tail[k]]) for k in tail}
            return loss_fn(full, betas, static)

        # one stepper per freeze count (first window: 0; later: 15% of T)
        # — head/betas/static are traced inputs, so each compiles once
        steppers: dict = {}

        def fit_lbfgs(static: ProxStatic, prox_params, first_window: bool):
            opt_vars, betas = init_opt_vars(prox_params, T, use_vposer)
            n_freeze = 0 if first_window else erase_n_static
            head = {k: x[:n_freeze] for k, x in opt_vars.items()}
            tail0 = {k: x[n_freeze:] for k, x in opt_vars.items()}

            if n_freeze not in steppers:
                steppers[n_freeze] = make_lbfgs_stepper(
                    loss_tail, tail0, lr=1.0, has_aux=True)
            init_state, run_chunk, unravel = steppers[n_freeze]
            state = init_state(tail0)
            all_losses, all_terms = [], []
            done = 0
            while done < maxiters:
                state, losses, terms = run_chunk(state, chunk_l,
                                                 head, betas, static)
                all_losses.append(np.asarray(losses))
                all_terms.append({k: np.asarray(v)
                                  for k, v in terms.items()
                                  if hasattr(v, "shape")})
                done += chunk_l
            tail = unravel(state[0])
            final = {k: jnp.concatenate([head[k], tail[k]])
                     for k in tail}
            losses = jnp.asarray(np.concatenate(all_losses)[:maxiters])
            terms = {k: np.concatenate([t[k] for t in all_terms])[:maxiters]
                     for k in all_terms[0]}
            return final, losses, terms, betas

        return fit_lbfgs

    # The fit runs in chunks of <=100 optimizer steps per device dispatch:
    # mathematically identical to one long scan (optimizer state is
    # carried across chunks), but keeps individual XLA executions short —
    # long single dispatches can trip execution watchdogs on tunneled
    # devices. Lower steps_per_dispatch (ProxConfig field) when slow terms
    # (e.g. interpenetration at full scale) are enabled.
    chunk = min(max(int(steps_per_dispatch), 1), maxiters)
    # adam / rmsprop / sgd (the reference's optim_factory.py:27-65
    # surface); unknown strings raise instead of silently running Adam
    from lemo_tpu.fitting.lbfgs import create_optimizer

    opt = create_optimizer(optim_type, lr)

    @jax.jit
    def run_chunk(ov, opt_state, betas, st, erase_n):
        gmask = mask_with(erase_n)
        grad_fn = jax.value_and_grad(
            lambda v: loss_fn(v, betas, st), has_aux=True)

        def step(carry, _):
            v, state, dead = carry
            (loss, terms), grads = grad_fn(v)
            grads = gmask(grads)
            updates, new_state = opt.update(grads, state, v)
            new_v = optax.apply_updates(v, updates)
            bad = jnp.logical_or(jnp.isnan(loss), jnp.isinf(loss))
            dead = jnp.logical_or(dead, bad)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(dead, o, n), new, old)
            return (keep(new_v, v), keep(new_state, state), dead), \
                (loss, terms)

        (ov, opt_state, _), (losses, terms) = jax.lax.scan(
            step, (ov, opt_state, jnp.asarray(False)), None, length=chunk)
        return ov, opt_state, losses, terms

    def fit(static: ProxStatic, prox_params, first_window: bool):
        opt_vars, betas = init_opt_vars(prox_params, T, use_vposer)
        erase_n = jnp.asarray(0 if first_window else erase_frames)
        opt_state = opt.init(opt_vars)
        all_losses, all_terms = [], []
        done = 0
        while done < maxiters:
            opt_vars, opt_state, losses, terms = run_chunk(
                opt_vars, opt_state, betas, static, erase_n)
            all_losses.append(np.asarray(losses))
            all_terms.append({k: np.asarray(v) for k, v in terms.items()
                              if hasattr(v, "shape")})
            done += chunk
        losses = jnp.asarray(np.concatenate(all_losses)[:maxiters])
        terms = {k: np.concatenate([t[k] for t in all_terms])[:maxiters]
                 for k in all_terms[0]}
        return opt_vars, losses, terms, betas

    return fit


# per-chunk wall times of the most recent batched fit() call (first
# entry carries the XLA compile): the driver separates compile from
# steady-state stepping when projecting multi-chip wall-clock
LAST_CHUNK_TIMES: list = []


def make_batched_window_fitter(
    model: SmplxModel,
    vposer_params: dict,
    joint_mapper: np.ndarray,
    static_template: ProxStatic,
    weights: ProxWeights,
    maxiters: int = 900,
    lr: float = 0.005,
    overlap_frac: float = 0.15,
    mesh=None,
    steps_per_dispatch: int = 100,
    priors: dict | None = None,
    use_vposer: bool = True,
    optim_type: str = "adam",
    impl: str = "fold",
):
    """Window-PARALLEL fitter: all windows of a recording optimized
    concurrently, the window axis sharded across the device mesh — the
    v5e-8 scaling mode (SURVEY §2.8: windows become the data-parallel
    axis; the reference runs them strictly sequentially).

    Semantics note: every window warm-starts from the previous STAGE's
    pkls exactly like the reference; the overlap-frozen head frames keep
    their warm-start values instead of the previous window's fresh
    solution. The driver's sequential-polish pass
    (driver._run_window_parallel, cfg.window_polish_iters) restores the
    reference's stitching semantics afterwards.

    impl='fold' (default): the W windows are FOLDED into the SMPL-X
    forward's frame batch (one [W*T] forward per step) and only the
    cheap per-window loss terms are vmapped. This keeps the fused Pallas
    vertex path active on single-chip runs and batches the conv
    smoothness prior at N=W — the two places the step's FLOPs live
    (PERF.md round-3 anatomy). Gradients equal the vmapped form's
    (windows are disjoint in the parameters; the optimizer is
    elementwise), so trajectories match up to f32 reassociation.

    impl='vmap': the whole per-window chunk vmapped (round-3 form; the
    fused kernel must stay off — batching a pallas_call broadcasts its
    ~64 MB dirs operand).

    Under a multi-device mesh both impls run the forward un-fused: GSPMD
    treats a pallas_call as an opaque custom call and would gather its
    operands to one device.

    Returns ``fit(static_batch, prox_params_batch, first_mask) ->
    (opt_vars, betas, losses [W, S], final_terms)`` where every array
    carries a leading window axis W; per-window statics are batched,
    shared statics broadcast. ``final_terms`` maps term name -> [W]
    values at the final solution.
    """
    import dataclasses as _dc

    import optax

    from jax.sharding import NamedSharding, PartitionSpec as P

    T = static_template.gt_joints.shape[0]
    fused = (impl == "fold") and mesh is None
    fwd = make_forward_fn(model, fused=fused)
    loss_fn = make_prox_loss(fwd, model.consts, joint_mapper, vposer_params,
                             static_template, weights,
                             model.config.num_expressions,
                             priors=priors, use_vposer=use_vposer)
    mask_with = overlap_grad_mask(T, overlap_frac)
    chunk = min(max(int(steps_per_dispatch), 1), maxiters)
    if optim_type in ("lbfgs", "lbfgsls"):
        raise ValueError(
            "window_parallel supports the gradient-descent family "
            "(adam/rmsprop/sgd); L-BFGS curvature history over a batched "
            "window axis is not implemented — unset window_parallel to "
            f"fit sequentially with optim_type={optim_type!r}")
    from lemo_tpu.fitting.lbfgs import create_optimizer

    opt = create_optimizer(optim_type, lr)  # raises on unknown types

    from lemo_tpu.fitting.prox.losses import PER_WINDOW_FIELDS as _PER_WINDOW
    # in_axes prefix tree: same ProxStatic structure/aux as the template,
    # 0 on per-window fields, None elsewhere
    from lemo_tpu.fitting.prox.losses import _STATIC_ARRAY_FIELDS, \
        _prox_static_flatten, _prox_static_unflatten

    children, aux = _prox_static_flatten(static_template)
    axes_children = []
    for name, child in zip(_STATIC_ARRAY_FIELDS, children):
        if name in _PER_WINDOW and child is not None:
            axes_children.append(0)
        else:
            axes_children.append(
                jax.tree_util.tree_map(lambda _: None, child))
    static_axes = _prox_static_unflatten(aux, axes_children)

    def chunk_one(ov, opt_state, betas, st, erase_n):
        gmask = mask_with(erase_n)
        grad_fn = jax.value_and_grad(
            lambda v: loss_fn(v, betas, st), has_aux=True)

        def step(carry, _):
            v, state, dead = carry
            (loss, _), grads = grad_fn(v)
            grads = gmask(grads)
            updates, new_state = opt.update(grads, state, v)
            new_v = optax.apply_updates(v, updates)
            # NaN/Inf freeze (parity with the sequential run_chunk): a
            # window whose loss goes non-finite keeps its last good params
            bad = jnp.logical_or(jnp.isnan(loss), jnp.isinf(loss))
            dead = jnp.logical_or(dead, bad)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(dead, o, n), new, old)
            return (keep(new_v, v), keep(new_state, state), dead), loss

        (ov, opt_state, _), losses = jax.lax.scan(
            step, (ov, opt_state, jnp.asarray(False)), None, length=chunk)
        # per-term values at the post-chunk solution (one extra loss eval
        # per ~100-step chunk); the final chunk's terms are the final
        # per-term record, replacing a separate jitted term_eval compile
        _, terms = loss_fn(ov, betas, st)
        return ov, opt_state, losses, terms

    def loss_folded(ov, betas, st_b):
        """Per-window totals [W] with ONE folded forward; terms vmapped."""
        W = betas.shape[0]
        flat = {k: v.reshape((W * T,) + v.shape[2:]) for k, v in ov.items()}
        out = loss_fn.forward_part(
            flat, betas.reshape((W * T,) + betas.shape[2:]))
        out_w = {k: v.reshape((W, T) + v.shape[1:]) for k, v in out.items()}
        totals, terms = jax.vmap(
            loss_fn.terms_part, in_axes=(0, 0, 0, static_axes))(
            ov, betas, out_w, st_b)
        return totals.sum(), (totals, terms)

    def chunk_folded(ov, opt_state, betas, st_b, erase_n):
        W = betas.shape[0]
        # per-window overlap freeze: frame weights [W, T]
        frame_w = (jnp.arange(T)[None, :] >= erase_n[:, None]).astype(
            jnp.float32)
        grad_fn = jax.value_and_grad(
            lambda v: loss_folded(v, betas, st_b), has_aux=True)

        def step(carry, _):
            v, state, dead = carry
            (_, (totals, _)), grads = grad_fn(v)
            grads = jax.tree_util.tree_map(
                lambda g: g * frame_w.reshape((W, T) + (1,) * (g.ndim - 2))
                if g.ndim >= 2 and g.shape[:2] == (W, T) else g, grads)
            updates, new_state = opt.update(grads, state, v)
            new_v = optax.apply_updates(v, updates)
            # per-WINDOW NaN/Inf freeze: a diverging window keeps its last
            # good params without freezing its batch mates
            bad = jnp.logical_or(jnp.isnan(totals), jnp.isinf(totals))
            dead = jnp.logical_or(dead, bad)

            def keep(n, o):
                if n.ndim >= 1 and n.shape[0] == W:
                    return jnp.where(
                        dead.reshape((W,) + (1,) * (n.ndim - 1)), o, n)
                return n  # shared scalar optimizer state (step count)

            v = jax.tree_util.tree_map(keep, new_v, v)
            state = jax.tree_util.tree_map(keep, new_state, state)
            return (v, state, dead), totals

        (ov, opt_state, _), losses = jax.lax.scan(
            step, (ov, opt_state, jnp.zeros((W,), bool)), None,
            length=chunk)
        _, (_, terms) = loss_folded(ov, betas, st_b)
        return ov, opt_state, losses.T, terms     # losses [W, chunk]

    if impl == "fold":
        run_chunk_v = jax.jit(chunk_folded)
    elif impl == "vmap":
        run_chunk_v = jax.jit(jax.vmap(
            chunk_one, in_axes=(0, 0, 0, static_axes, 0)))
    else:
        raise ValueError(f"unknown window-parallel impl {impl!r} "
                         "(expected 'fold' or 'vmap')")

    n_shards = mesh.devices.size if mesh is not None else 1

    def _pad_w(x, W, W_pad):
        if x is None or W_pad == W:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (W_pad - W,) + x.shape[1:])])

    def fit(static_batch: ProxStatic, prox_params_batch, first_mask,
            maxiters_override: int | None = None, erase_override=None):
        """`maxiters_override`: run that many steps instead of `maxiters`
        (same compiled chunk program — used by the driver's Jacobi polish
        rounds). `erase_override`: per-window frozen-head frame counts
        [W] int (values may exceed the 15% overlap, e.g. T freezes a
        window entirely); None derives them from `first_mask`."""
        W = first_mask.shape[0]
        total_iters = int(maxiters_override or maxiters)
        # pad the window axis to a mesh multiple (padding repeats window 0
        # and is discarded after the fit). Only the per-window fields are
        # padded — shape-sniffing would corrupt shared fields whose first
        # dim happens to equal W (e.g. R [3,3] with 3 windows).
        W_pad = ((W + n_shards - 1) // n_shards) * n_shards
        static_batch = _dc.replace(static_batch, **{
            name: _pad_w(getattr(static_batch, name), W, W_pad)
            for name in _PER_WINDOW
            if getattr(static_batch, name) is not None})
        prox_params_batch = {k: _pad_w(v, W, W_pad)
                             for k, v in prox_params_batch.items()}
        first_mask_p = jnp.concatenate(
            [first_mask, jnp.zeros(W_pad - W, first_mask.dtype)]) \
            if W_pad > W else first_mask

        mean_betas = prox_params_batch["betas"].mean(axis=1, keepdims=True)
        betas = jnp.broadcast_to(
            mean_betas, (W_pad, T, mean_betas.shape[-1]))
        opt_vars = {k: prox_params_batch[k] for k in
                    ("transl", "global_orient", "left_hand_pose",
                     "right_hand_pose", "jaw_pose", "leye_pose",
                     "reye_pose", "expression",
                     "pose_embedding" if use_vposer else "body_pose")}
        if erase_override is not None:
            erase_n = jnp.asarray(erase_override)
            if W_pad > W:
                erase_n = jnp.concatenate(
                    [erase_n, jnp.full((W_pad - W,), T, erase_n.dtype)])
        else:
            erase_n = jnp.where(first_mask_p, 0, int(T * overlap_frac))
        # normalize dtype/weak-type: a weak-typed jnp.where result vs a
        # strongly-typed override array would miss the jit cache and
        # retrace the whole chunk program (measured 120 s on the first
        # polish round)
        erase_n = erase_n.astype(jnp.int32)
        opt_state = (opt.init(opt_vars) if impl == "fold"
                     else jax.vmap(opt.init)(opt_vars))
        if mesh is not None:
            shard = NamedSharding(mesh, P("dp"))
            place = lambda x: jax.device_put(x, shard) \
                if hasattr(x, "ndim") and x.ndim >= 1 and \
                x.shape[0] == W_pad else x
            opt_vars = jax.tree_util.tree_map(place, opt_vars)
        all_losses = []
        done = 0
        terms = None
        import time as _time

        chunk_times = []
        while done < total_iters:
            tc = _time.time()
            opt_vars, opt_state, losses, terms = run_chunk_v(
                opt_vars, opt_state, betas, static_batch, erase_n)
            all_losses.append(np.asarray(losses))   # forces device sync
            chunk_times.append(_time.time() - tc)
            done += chunk
        LAST_CHUNK_TIMES[:] = chunk_times
        # a maxiters_override below the chunk size still runs whole
        # chunks (the chunk program is what's compiled) — the history is
        # reported in full rather than truncated to the requested count
        losses = np.concatenate(all_losses, axis=1)[:W]             # [W, S]
        opt_vars = jax.tree_util.tree_map(lambda x: x[:W], opt_vars)
        final_terms = {k: np.asarray(v)[:W] for k, v in terms.items()
                       if hasattr(v, "shape")}
        return opt_vars, betas[:W], losses, final_terms

    fit.run_chunk_v = run_chunk_v  # exposed so tests can pin cache size
    return fit


def fit_window(
    model: SmplxModel,
    vposer_params: dict,
    joint_mapper: np.ndarray,
    static: ProxStatic,
    weights: ProxWeights,
    prox_params: dict[str, jnp.ndarray],
    first_window: bool,
    maxiters: int = 900,
    lr: float = 0.005,
    fitter=None,
    use_vposer: bool = True,
) -> WindowResult:
    """Fit one window. Pass `fitter` from :func:`make_window_fitter` to
    reuse the compilation across windows (the driver does)."""
    if fitter is None:
        fitter = make_window_fitter(model, vposer_params, joint_mapper,
                                    static, weights, maxiters, lr,
                                    use_vposer=use_vposer)
    final, losses, terms, betas = fitter(static, prox_params, first_window)

    if use_vposer:
        body_pose = vp.decode(vposer_params, final["pose_embedding"], "aa")
        pose_embedding = np.asarray(final["pose_embedding"])
    else:
        body_pose = final["body_pose"]
        pose_embedding = np.zeros(
            (body_pose.shape[0], vp.latent_dim(vposer_params)), np.float32)
    params_np = {k: np.asarray(v) for k, v in final.items()
                 if k != "pose_embedding"}
    params_np["betas"] = np.asarray(betas)
    params_np["body_pose"] = np.asarray(body_pose)
    term_history = ({k: np.asarray(v) for k, v in terms.items()
                     if hasattr(v, "shape")}
                    if isinstance(terms, dict) else None)
    return WindowResult(
        params=params_np,
        pose_embedding=pose_embedding,
        body_pose=np.asarray(body_pose),
        final_loss=float(losses[-1]),
        loss_history=np.asarray(losses),
        term_history=term_history,
    )


def save_window_pkls(result: WindowResult, frame_names: list[str],
                     result_folder: str, person_id: int = 0,
                     camera_params: dict | None = None) -> list[str]:
    """Per-frame pkl results in the reference's exact output schema
    (fit_temp_loadprox_slide.py:577-594): each frame a dict of [1, ...]
    arrays keyed transl/global_orient/betas/body_pose/pose_embedding/
    left_hand_pose/.../expression (+ camera_*)."""
    paths = []
    for i, fn in enumerate(frame_names):
        rec: dict[str, Any] = {}
        if camera_params:
            for k, v in camera_params.items():
                rec[f"camera_{k}"] = np.asarray(v)[None]
        for k, v in result.params.items():
            rec[k] = v[i][None]
        rec["pose_embedding"] = result.pose_embedding[i][None]
        rec["body_pose"] = result.body_pose[i][None]
        folder = os.path.join(result_folder, fn)
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, f"{person_id:03d}.pkl")
        with open(path, "wb") as fh:
            pickle.dump(rec, fh, protocol=2)
        paths.append(path)
    return paths
