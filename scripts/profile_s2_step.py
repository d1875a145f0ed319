"""Profile the Stage-2 optimizer step on the real TPU.

Three questions, answered in ONE process (tunnel throughput drifts
across sessions):

1. batch scaling: step time at C = 1/2/4/8/16 clips — distinguishes
   latency-bound (time flat in C) from throughput-bound (time ~ C).
2. component cost: step time with loss terms removed one at a time
   (markers-only, +smooth, +friction) and forward-only.
3. optional: an XLA profiler trace of the C=8 step for op-level study
   (pass --trace DIR).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_s2_step.py
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _median_time(fn, *args, reps: int = 6) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.fitting import params as P
    from lemo_tpu.fitting.adam import piecewise_lr, run_adam
    from lemo_tpu.priors.conv_ae import init_smooth_enc
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    print("device:", jax.devices()[0])
    T, steps = 100, args.steps
    rng = np.random.RandomState(0)
    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67, ids81 = marker_indices(False), marker_indices(True)
    feet = foot_vertex_ids()
    enc = init_smooth_enc(jax.random.PRNGKey(1))
    stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))

    init72 = np.zeros((T, 72), np.float32)
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = rng.randn(T, 67, 3).astype(np.float32) * 0.3
    contact = (rng.rand(T, 4) > 0.5).astype(np.float32)

    # ---- 1. batch scaling --------------------------------------------
    core = s2._make_fit_core(model, vpp, enc, stats, ids67, ids81, feet,
                             num_steps=steps)
    single = jax.jit(core)
    batched = jax.jit(jax.vmap(core))
    t1 = _median_time(lambda: single(jnp.asarray(target),
                                     jnp.asarray(contact),
                                     jnp.asarray(init72))[0])
    print(f"C=1 : {t1 / steps * 1e3:7.3f} ms/step   "
          f"{T * steps / t1:8.0f} frame-iters/s")
    for C in (2, 4, 8, 16):
        tgt = jnp.asarray(np.stack([target] * C))
        ctc = jnp.asarray(np.stack([contact] * C))
        ini = jnp.asarray(np.stack([init72] * C))
        tc = _median_time(lambda a=tgt, b=ctc, c=ini: batched(a, b, c)[0])
        print(f"C={C:<2}: {tc / steps * 1e3:7.3f} ms/step   "
              f"{C * T * steps / tc:8.0f} frame-iters/s   "
              f"(x{tc / t1:.2f} time for x{C} work)")

    # ---- 2. component cost (C=1, value_and_grad+adam like the fitter) --
    fwd = make_forward_fn(model)
    lr_table = piecewise_lr([(0, 0.01), (61, 0.005)], steps)
    tgt = jnp.asarray(target)
    ctc = jnp.asarray(contact)
    i72 = jnp.asarray(init72)

    def variant(with_markers=True, with_smooth=True, with_friction=True,
                with_priors=True):
        from lemo_tpu.ops.rotations import aa_to_rot6d, rot6d_to_aa

        def loss_fn(v, shape10):
            x72 = jnp.concatenate(
                [v["transl"], rot6d_to_aa(v["rot6d"]), shape10, v["other"]],
                axis=-1)
            sp = P.smplx_params_from_72(x72, vpp,
                                        model.config.num_expressions)
            out = fwd(sp, model.consts)
            verts = out["vertices"]
            loss = 0.0
            if with_markers:
                loss += jnp.abs(verts[:, jnp.asarray(ids67)] - tgt).mean()
            if with_priors:
                loss += 0.02 * (x72[:, 16:48] ** 2).mean() \
                    + 0.01 * (x72[:, 6:16] ** 2).mean() \
                    + 0.01 * (x72[:, 48:] ** 2).mean()
            if with_smooth:
                loss += 1e6 * s2.smoothness_prior_loss(
                    enc, verts[:, jnp.asarray(ids81)],
                    out["joints"][0, :25], stats)
            if with_friction:
                loss += 0.03 * s2.contact_friction_loss(verts, ctc, feet)
            return loss

        def run(i72v):
            shape10 = i72v[:, 6:16]
            init_vars = {"transl": i72v[:, 0:3],
                         "rot6d": aa_to_rot6d(i72v[:, 3:6]),
                         "other": i72v[:, 16:]}
            final, losses, _ = run_adam(
                lambda v: loss_fn(v, shape10), init_vars, steps, lr_table)
            return losses

        return jax.jit(run)

    for label, kw in [
        ("full loss          ", {}),
        ("- smooth prior     ", dict(with_smooth=False)),
        ("- friction         ", dict(with_friction=False)),
        ("markers only       ", dict(with_smooth=False,
                                     with_friction=False,
                                     with_priors=False)),
    ]:
        t = _median_time(variant(**kw), i72)
        print(f"{label}: {t / steps * 1e3:7.3f} ms/step")

    # forward-only (no grad): how much is the optimizer/backward
    fwd_only = jax.jit(lambda x72: fwd(
        P.smplx_params_from_72(x72, vpp, model.config.num_expressions),
        model.consts)["vertices"])
    tf = _median_time(fwd_only, jnp.asarray(init72))
    print(f"forward only (1 call): {tf * 1e3:7.3f} ms")

    # ---- 3. optional trace -------------------------------------------
    if args.trace:
        tgt8 = jnp.asarray(np.stack([target] * 8))
        ctc8 = jnp.asarray(np.stack([contact] * 8))
        ini8 = jnp.asarray(np.stack([init72] * 8))
        jax.block_until_ready(batched(tgt8, ctc8, ini8)[0])
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(batched(tgt8, ctc8, ini8)[0])
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
