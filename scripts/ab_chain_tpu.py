"""A/B the kinematic-chain implementation (level vs pointer-doubling)
inside the real Stage-2 step on the TPU, interleaved in one process.

Also prints the full-loss step for both, so the chain choice is judged
on the production path, not a microbenchmark.
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
    init72[:, 3:6] = [0, 1.6, 3.14]   # non-degenerate global rotation
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = jnp.asarray(rng.randn(T, 67, 3).astype(np.float32) * 0.3)
    contact = jnp.asarray((rng.rand(T, 4) > 0.5).astype(np.float32))
    i72 = jnp.asarray(init72)

    fits = {}
    outs = {}
    for impl in ("level", "pallas", "packed", "doubling"):
        lbs_mod.CHAIN_IMPL = impl
        fits[impl] = jax.jit(s2._make_fit_core(
            model, vpp, enc, stats, ids67, ids81, feet, num_steps=steps))
        outs[impl] = jax.block_until_ready(
            fits[impl](target, contact, i72)[0])  # warm

    for other in ("pallas", "packed", "doubling"):
        d = float(jnp.abs(outs["level"] - outs[other]).max())
        print(f"fitted-params max |level - {other}|: {d:.3e}")

    times = {m: [] for m in fits}
    for _ in range(8):
        for impl, fit in fits.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fit(target, contact, i72)[0])
            times[impl].append(time.perf_counter() - t0)
    for impl, ts in times.items():
        ms = np.median(ts) / steps * 1e3
        print(f"S2 full step [{impl:9s}]: {ms:7.3f} ms/step "
              f"({T * steps / np.median(ts):8.0f} frame-iters/s)")


if __name__ == "__main__":
    main()
