"""A/B on the real chip: clip-batched Stage-2 throughput, fold vs vmap.

The round-3 step anatomy (PERF.md) showed the Stage-2 step is FLOP-bound
on the frozen conv smoothness prior running at batch 1 — the MXU is
mostly idle at N=1. `impl='fold'` folds the clip axis into the forward's
frame batch AND runs the conv prior as one N=C batch, while keeping the
fused Pallas vertex path active (vmap blocks it: batching a pallas_call
broadcasts the 64 MB dirs operand).

Reports frame-iters/s (frames x optimizer steps / s) per variant at
C in {1, 2, 4, 8}. Reference workload anchor: the reference fits one
bs=100 window per GPU at a time (temp_prox main_slide.py); corpus
throughput is clips/s, which is what C>1 measures.
"""

from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import load_model
from lemo_tpu.body_model import vposer as vp
from lemo_tpu.data.markers import marker_indices
from lemo_tpu.data.segments import foot_vertex_ids
from lemo_tpu.data.stats import GlobalStats
from lemo_tpu.fitting import amass_temp as s2
from lemo_tpu.priors.conv_ae import init_smooth_enc
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

T = 100
STEPS = 20
N_CALLS = 5


def main() -> None:
    rng = np.random.RandomState(0)
    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67, ids81 = marker_indices(False), marker_indices(True)
    feet = foot_vertex_ids()
    enc = init_smooth_enc(jax.random.PRNGKey(1))
    stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))

    print(f"device={jax.devices()[0]}  T={T} steps={STEPS} calls={N_CALLS}")
    for C in (1, 2, 4, 8):
        target = jnp.asarray(rng.randn(C, T, 67, 3).astype(np.float32) * 0.3
                             + np.array([0, 0.4, 1.0], np.float32))
        contact = jnp.asarray((rng.rand(C, T, 4) > 0.5).astype(np.float32))
        init72 = np.zeros((C, T, 72), np.float32)
        init72[..., 0:3] = [0, 0.4, 1.0]
        init72[..., 3:6] = [0, 1.6, 3.14]
        init72[..., 16:48] = rng.randn(C, T, 32) * 0.2
        init72 = jnp.asarray(init72)
        row = [f"C={C}"]
        for impl in ("fold", "vmap"):
            fit = s2.make_temporal_fitter_batched(
                model, vpp, enc, stats, ids67, ids81, feet,
                num_steps=STEPS, impl=impl)
            t0 = time.perf_counter()
            fitted, _ = fit(target, contact, init72)
            jax.block_until_ready(fitted)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(N_CALLS):
                fitted, _ = fit(target, contact, init72)
                jax.block_until_ready(fitted)
            dt = time.perf_counter() - t0
            fps = C * T * STEPS * N_CALLS / dt
            row.append(f"{impl}: {fps:9.0f} f-it/s "
                       f"({dt / N_CALLS * 1e3 / STEPS:6.2f} ms/step, "
                       f"compile {compile_s:5.1f}s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
