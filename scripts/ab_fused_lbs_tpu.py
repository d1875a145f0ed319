"""A/B the fused Pallas vertex path (body_model/vertex_pallas.py)
against the separate-matmul XLA LBS inside the real Stage-2 step on the
TPU, interleaved in one process.

Also reports a roofline placement for the step: achieved FLOP/s vs the
chip's f32 matmul ceiling and achieved HBM bytes/s vs peak, from the
step's known operand sizes.
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the xla-variant 20-step scan costs ~400 s
    # of compile per process without it
    _cache = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      ".jax_compilation_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import lemo_tpu.body_model.lbs as lbs_mod
    from lemo_tpu.body_model import load_model
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.priors.conv_ae import init_smooth_enc
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    print("device:", jax.devices()[0])
    T, steps = 100, 20
    rng = np.random.RandomState(0)
    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67, ids81 = marker_indices(False), marker_indices(True)
    feet = foot_vertex_ids()
    enc = init_smooth_enc(jax.random.PRNGKey(1))
    stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))

    init72 = np.zeros((T, 72), np.float32)
    init72[:, 3:6] = [0, 1.6, 3.14]
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = jnp.asarray(rng.randn(T, 67, 3).astype(np.float32) * 0.3)
    contact = jnp.asarray((rng.rand(T, 4) > 0.5).astype(np.float32))
    i72 = jnp.asarray(init72)

    modes = ("xla", "fused")
    if len(sys.argv) > 1 and sys.argv[1] in ("xla", "fused"):
        # single-impl warm-up run: populates the persistent compile
        # cache so a later two-impl run fits a bounded window
        modes = (sys.argv[1],)
    fits, outs, compile_s = {}, {}, {}
    for impl in modes:
        lbs_mod.LBS_IMPL = impl
        t0 = time.perf_counter()
        fits[impl] = jax.jit(s2._make_fit_core(
            model, vpp, enc, stats, ids67, ids81, feet, num_steps=steps))
        outs[impl] = jax.block_until_ready(
            fits[impl](target, contact, i72)[0])
        compile_s[impl] = time.perf_counter() - t0
        print(f"{impl:5s}: compiled+warm in {compile_s[impl]:.0f}s")

    if len(modes) == 1:
        print("warm-up run done (cache populated); re-run with no arg "
              "for the interleaved A/B")
        return
    d = float(jnp.abs(outs["xla"] - outs["fused"]).max())
    print(f"fitted-params max |xla - fused|: {d:.3e}")

    times = {m: [] for m in fits}
    for i in range(10):
        for impl, fit in fits.items():
            tgt = target * (1.0 + 1e-4 * i)   # vary inputs (tunnel artifact)
            t0 = time.perf_counter()
            jax.block_until_ready(fit(tgt, contact, i72)[0])
            times[impl].append(time.perf_counter() - t0)
    ms = {}
    for impl, ts in times.items():
        ms[impl] = np.median(ts) / steps * 1e3
        print(f"S2 full step [{impl:5s}]: {ms[impl]:7.3f} ms/step "
              f"({T * steps / np.median(ts):8.0f} frame-iters/s)")
    print(f"speedup: {ms['xla'] / ms['fused']:.2f}x")

    # Roofline placement of the fused step. Dominant compute: the fused
    # kernel's two matmuls fwd + their mirrored backward (recompute + two
    # cotangent matmuls) at Bp=128 lanes.
    V = model.num_verts
    J = model.num_joints
    D = int(model.consts["fused_dirs"].shape[2])
    Bp = 128
    mm = 2 * V * Bp  # flops per contraction element pair
    fwd_flops = mm * (3 * D + 12 * J)
    bwd_flops = mm * (3 * D + 12 * J)      # recompute vs + T
    bwd_flops += mm * (12 * J + 3 * D)     # dA2 + dcat
    kern_flops = fwd_flops + bwd_flops
    # HBM traffic: dirs read twice (fwd+bwd), W twice, outputs once each
    dirs_b = np.prod(model.consts["fused_dirs"].shape) * 4
    w_b = np.prod(model.consts["lbs_w_pad"].shape) * 4
    out_b = 3 * V * Bp * 4
    traffic = 2 * dirs_b + 2 * w_b + 3 * out_b
    t_step = ms["fused"] / 1e3
    # v5e: ~197 TFLOP/s bf16 MXU -> ~1/6 for f32 HIGHEST; HBM ~819 GB/s
    f32_peak = 197e12 / 6
    print(f"fused-kernel work: {kern_flops / 1e9:.2f} GFLOP, "
          f"{traffic / 1e6:.0f} MB HBM per step")
    print(f"step roofline: {kern_flops / t_step / f32_peak * 100:.1f}% "
          f"of f32 matmul peak, "
          f"{traffic / t_step / 819e9 * 100:.1f}% of HBM peak "
          f"(vertex-path share only; remainder is chain/priors/optimizer)")


if __name__ == "__main__":
    main()
