"""A/B the body-model heavy-matmul precision on the real TPU, in-process.

Two questions (PERF.md round-2 precision policy):
1. accuracy: HIGHEST vs HIGH vs DEFAULT forward error against the float64
   numpy oracle at full production shape;
2. speed: the Stage-2 bench step under each setting, interleaved in one
   process (cross-session numbers drift ±10% through the tunnel).

Also runs the advisor-requested intersection-energy A/B: the dense narrow
phase's energy on TPU vs the same computation on CPU (fp32-exact
matmuls), on a posed full-size body at scene-scale coordinates.
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

    import lemo_tpu.body_model.lbs as lbs_mod
    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.priors.conv_ae import init_smooth_enc
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__)))))
    from tests.test_body_model import numpy_smplx_forward

    print("device:", jax.devices()[0])
    md = synthetic_smplx_npz(full_size=True, seed=2)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    rng = np.random.RandomState(7)
    B = 8
    params = dict(model.zero_params(B))
    for k in params:
        sc = 0.3 if ("pose" in k or "orient" in k) else 0.5
        params[k] = jnp.asarray(rng.randn(*params[k].shape) * sc,
                                jnp.float32)
    npp = {k: np.asarray(v, np.float64) for k, v in params.items()}
    v_ref, _ = numpy_smplx_forward(md, npp, use_pca=True, num_pca=12)

    # --- accuracy sweep --------------------------------------------------
    for mode in ("highest", "high"):
        lbs_mod.HEAVY_MATMUL_PRECISION = mode
        fwd = jax.jit(make_forward_fn(model))
        out = fwd(params, model.consts)
        err = np.abs(np.asarray(out["vertices"]) - v_ref).max()
        print(f"forward max vertex err [{mode:8s}]: {err:.3e} m")

    # --- speed sweep (interleaved) ---------------------------------------
    T = 100
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67, ids81 = marker_indices(False), marker_indices(True)
    feet = foot_vertex_ids()
    enc = init_smooth_enc(jax.random.PRNGKey(1))
    stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))
    init72 = np.zeros((T, 72), np.float32)
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = jnp.asarray(rng.randn(T, 67, 3).astype(np.float32) * 0.3)
    contact = jnp.asarray((rng.rand(T, 4) > 0.5).astype(np.float32))
    i72 = jnp.asarray(init72)

    fits = {}
    for mode in ("highest", "high"):
        lbs_mod.HEAVY_MATMUL_PRECISION = mode
        fits[mode] = s2.make_temporal_fitter(model, vpp, enc, stats,
                                             ids67, ids81, feet,
                                             num_steps=20)
        jax.block_until_ready(fits[mode](target, contact, i72)[0])  # warm

    times = {m: [] for m in fits}
    for _ in range(6):  # interleave
        for mode, fit in fits.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fit(target, contact, i72)[0])
            times[mode].append(time.perf_counter() - t0)
    for mode, ts in times.items():
        ms = np.median(ts) / 20 * 1e3
        print(f"S2 step [{mode:8s}]: {ms:.3f} ms/step "
              f"({T * 20 / np.median(ts):.0f} frame-iters/s)")

    # --- intersection energy TPU vs CPU (advisor A/B) ---------------------
    from lemo_tpu.ops.intersection import self_intersection_loss

    lbs_mod.HEAVY_MATMUL_PRECISION = "highest"
    fwd = jax.jit(make_forward_fn(model))
    one = dict(model.zero_params(1))
    one["body_pose"] = jnp.asarray(rng.randn(1, 63) * 0.6, jnp.float32)
    one["transl"] = jnp.asarray([[1.5, 2.0, 1.0]], jnp.float32)  # scene
    verts = fwd(one, model.consts)["vertices"][0]
    faces = jnp.asarray(model.faces)
    e_tpu = float(self_intersection_loss(verts, faces))
    with jax.default_device(jax.devices("cpu")[0]):
        e_cpu = float(self_intersection_loss(
            jnp.asarray(np.asarray(verts)), jnp.asarray(np.asarray(faces))))
    rel = abs(e_tpu - e_cpu) / max(abs(e_cpu), 1e-12)
    print(f"intersection energy: tpu {e_tpu:.6e} cpu {e_cpu:.6e} "
          f"rel-diff {rel:.2e}")


if __name__ == "__main__":
    main()
