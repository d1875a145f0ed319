"""Anatomy of the Stage-2 step with the fused vertex path: time the
full fit and loss-term knockouts for both LBS impls, interleaved in one
process, to locate the remaining ms after the vertex-path fusion.

Variants (all 20-step jitted Adam fits at T=100, full-size SMPL-X):
  full        : markers L1 + param priors + learned smoothness + friction
  nosmooth    : smoothness prior term removed (trace-time)
  nofric      : contact-friction term removed
  markers     : markers L1 + param priors only
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

    W = s2.Stage2Weights
    variants = {
        "full": W(),
        "nosmooth": W(smooth=0.0),
        "nofric": W(contact_vel=0.0),
        "markers": W(smooth=0.0, contact_vel=0.0),
    }
    fits = {}
    for impl in ("fused", "xla"):
        lbs_mod.LBS_IMPL = impl
        for vname, w in variants.items():
            key = f"{impl}/{vname}"
            t0 = time.perf_counter()
            fits[key] = jax.jit(s2._make_fit_core(
                model, vpp, enc, stats, ids67, ids81, feet,
                num_steps=steps, weights=w))
            jax.block_until_ready(fits[key](target, contact, i72)[0])
            print(f"{key:16s}: compiled+warm in "
                  f"{time.perf_counter() - t0:.0f}s")

    times = {k: [] for k in fits}
    for i in range(8):
        for key, fit in fits.items():
            tgt = target * (1.0 + 1e-4 * i)
            t0 = time.perf_counter()
            jax.block_until_ready(fit(tgt, contact, i72)[0])
            times[key].append(time.perf_counter() - t0)
    for key, ts in times.items():
        print(f"{key:16s}: {np.median(ts) / steps * 1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
