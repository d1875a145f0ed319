"""Measure the repo's bisection strong-Wolfe L-BFGS line search
(fitting/lbfgs.py) against the reference's cubic-interpolation
strong-Wolfe (temp_prox/optimizers/lbfgs_ls.py) on the SAME objective:
a small-shape PROX window loss (keypoints + priors + SDF + friction).

Both optimizers minimize the identical jitted JAX loss — the reference
runs through a numpy bridge (its closure gets the JAX value/grad), so
the ONLY difference under test is the optimizer/line-search math.
Reports per-iteration loss trajectories, function-evaluation counts, and
iterations-to-target (target = the worse of the two final losses).

CPU, small shapes; run:  python scripts/ab_lbfgs_linesearch.py
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(iters: int = 30) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
    from lemo_tpu.config import ProxConfig
    from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
    from lemo_tpu.fitting.lbfgs import make_lbfgs_stepper
    from lemo_tpu.fitting.prox.driver import (ProxAssets,
                                              build_window_static,
                                              weights_from_config)
    from lemo_tpu.fitting.prox.losses import make_prox_loss
    from lemo_tpu.fitting.prox.window import init_opt_vars
    from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording

    T = 8
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=T, seed=11,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    cfg = ProxConfig(recording_dir=info["recording_dir"], batch_size=T,
                     flip=False, s2m=False, m2s=False, read_depth=False,
                     read_mask=False, init_mode="none",
                     sdf_penetration=True, use_friction=True,
                     use_motion_smooth_prior=False, interpenetration=False,
                     contact=False, use_motion_infill_prior=False)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=T, flip=False, read_depth=False)
    wd = ds.load_window(0)
    static = build_window_static(cfg, assets, rec, wd, ds.joint_weights())
    weights = weights_from_config(cfg)
    mapper = smpl_to_openpose()
    loss_fn = make_prox_loss(make_forward_fn(model), model.consts, mapper,
                             assets.vposer_params, static, weights)
    opt_vars0, betas = init_opt_vars(
        {k: jnp.asarray(v) for k, v in wd["warm_start"].items()}, T)

    from jax.flatten_util import ravel_pytree

    x0, unravel = ravel_pytree(opt_vars0)
    n_eval = {"count": 0}

    @jax.jit
    def vg_flat(x):
        v, g = jax.value_and_grad(
            lambda xx: loss_fn(unravel(xx), betas, static)[0])(x)
        return v, g

    def vg_np(x_np):
        n_eval["count"] += 1
        v, g = vg_flat(jnp.asarray(x_np, jnp.float32))
        return float(v), np.asarray(g)

    # ---- ours: bisection strong-Wolfe over the same flat objective ----
    init_state, run_chunk, unr = make_lbfgs_stepper(
        lambda ov: loss_fn(ov, betas, static)[0], opt_vars0, lr=1.0)
    state = init_state(opt_vars0)
    state, losses_ours, _ = run_chunk(state, iters)
    losses_ours = np.asarray(losses_ours)
    # final loss is the value at the final iterate
    f_final_ours = vg_np(np.asarray(ravel_pytree(unr(state[0]))[0]))[0]
    n_eval_ours = n_eval["count"] - 1

    # ---- reference: cubic-Wolfe lbfgs_ls through a torch bridge -------
    sys.path.insert(0, "/root/reference/temp_prox/optimizers")
    import torch
    from lbfgs_ls import LBFGS as RefLBFGS

    n_eval["count"] = 0
    x_t = torch.nn.Parameter(torch.tensor(np.asarray(x0), dtype=torch.float32))
    opt = RefLBFGS([x_t], lr=1.0, max_iter=1, max_eval=100,
                   history_size=10, line_search_fn="strong_Wolfe",
                   tolerance_grad=0.0, tolerance_change=0.0)

    def closure():
        v, g = vg_np(x_t.detach().numpy())
        x_t.grad = torch.tensor(g, dtype=torch.float32)
        return torch.tensor(v)

    losses_ref = []
    for _ in range(iters):
        loss = opt.step(closure)
        losses_ref.append(float(loss))
    losses_ref = np.asarray(losses_ref)
    f_final_ref = vg_np(x_t.detach().numpy())[0]
    n_eval_ref = n_eval["count"] - 1

    print(f"objective dim {x0.shape[0]}, start loss {losses_ours[0]:.6f}")
    print(f"{'iter':>4}  {'ours(bisect)':>14}  {'ref(cubic)':>14}")
    for i in range(0, iters, max(iters // 15, 1)):
        print(f"{i:>4}  {losses_ours[i]:>14.6f}  {losses_ref[i]:>14.6f}")
    del n_eval_ours  # ours evaluates inside the jitted loop (not bridged)
    print(f"final: ours {f_final_ours:.6f} (fn evals on-device, "
          f"not bridged), ref {f_final_ref:.6f} ({n_eval_ref} fn evals)")

    target = max(f_final_ours, f_final_ref)
    it_ours = int(np.argmax(losses_ours <= target)) \
        if (losses_ours <= target).any() else iters
    it_ref = int(np.argmax(losses_ref <= target)) \
        if (losses_ref <= target).any() else iters
    print(f"iterations to target loss {target:.6f}: "
          f"ours {it_ours}, reference {it_ref}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
