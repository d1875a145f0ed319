"""Benchmark: temporal body-fitting throughput on the current device.

Workload: the AMASS Stage-2 / PROX-style inner loop — a 100-frame window
of full-size SMPL-X bodies (10475 vertices, PCA hands, VPoser decode)
optimized by Adam under marker L1 + parameter priors + the learned
smoothness prior (frozen conv encoder) + contact friction. This is the
hot loop the reference runs 900 times per PROX window on a single GPU
(cfg_files/PROXD_temp_S2.yaml maxiters 900, batch_size 100).

Metric: frame-iterations per second = (frames x optimizer steps) / wall
time, steady-state (after one warmup call of the jitted scan).

vs_baseline: ratio against the CONSERVATIVE (fast) end of a measured
bracket for the reference implementation. scripts/bench_reference_torch.py
times the same Stage-2 step in torch on this machine's CPU (the
reference's own loop structure, incl. the sequential kinematic chain) and
scales by a documented CPU->GPU factor range [3, 10] for the
reference's 2019-class GPU (anchored to the measured single-thread step —
see that script's docstring); BASELINE_TORCH.json carries the result.
vs_baseline
divides by the bracket's HIGH end — the fastest plausible reference — so
the reported speedup is a floor. Falls back to the round-1 estimate
(100 frame-iters/s) when the measurement file is absent.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os.path as osp
import time

import numpy as np

ASSUMED_REFERENCE_FRAME_ITERS_PER_SEC = 100.0


def _reference_baseline() -> tuple[float, str]:
    """(frame-iters/s to divide by, provenance string)."""
    path = osp.join(osp.dirname(osp.abspath(__file__)),
                    "BASELINE_TORCH.json")
    try:
        with open(path) as fh:
            m = json.load(fh)
        lo, hi = m["ref_frame_iters_per_sec_range"]
        gf = m.get("gpu_factor_range", ["?", "?"])
        # Why a 3-10x CPU->GPU factor bracket: the reference step at
        # bs=100 is hundreds of SMALL torch-1.4 CUDA kernels (54-joint
        # serial chain, per-term losses), i.e. launch-latency-bound where
        # 2019-class GPUs gain far less than their ~50x raw-FLOP edge —
        # and the PROX pipeline globally disables cuDNN
        # (temp_prox/main_slide.py:50), capping the conv prior too. 10x
        # is therefore a generous ceiling for this workload shape;
        # dividing by it (the fast end) makes vs_baseline a floor.
        return float(hi), (
            f"measured torch CPU step {m['cpu_step_s']}s @bs="
            f"{m['batch']} ({m.get('torch_threads', '?')} thread) -> "
            f"reference range [{lo}, {hi}] frame-iters/s "
            f"(GPU factor {gf[0]}-{gf[1]}x for a launch-latency-bound "
            f"torch-1.4 step, cuDNN disabled by the reference); "
            f"using the fast end as a conservative floor")
    except Exception:
        return ASSUMED_REFERENCE_FRAME_ITERS_PER_SEC, (
            "reference ~100 frame-iters/s (torch, 1 GPU, bs=100; "
            "estimate — run scripts/bench_reference_torch.py to measure)")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.priors.conv_ae import init_smooth_enc, load_torch_state_dict
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    rng = np.random.RandomState(0)
    T = 100            # window size (reference batch_size)
    steps = 20         # scan length per timed call

    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vposer_params = vp.init_vposer(jax.random.PRNGKey(0))
    ids67 = marker_indices(False)
    ids81 = marker_indices(True)
    feet = foot_vertex_ids()
    try:
        enc = load_torch_state_dict(
            "/root/reference/runs/15217/Enc_last_model.pkl")
        stats = GlobalStats.load(
            "/root/reference/preprocess_stats/"
            "preprocess_stats_smooth_withHand_global_markers.npz")
    except Exception:
        enc = init_smooth_enc(jax.random.PRNGKey(1))
        stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))

    init72 = np.zeros((T, 72), np.float32)
    init72[:, 0:3] = [0, 0.4, 1.0]
    init72[:, 3:6] = [0, 1.6, 3.14]
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = jnp.asarray(rng.randn(T, 67, 3).astype(np.float32) * 0.3
                         + np.array([0, 0.4, 1.0], np.float32))
    contact = jnp.asarray((rng.rand(T, 4) > 0.5).astype(np.float32))

    fit = s2.make_temporal_fitter(model, vposer_params, enc, stats,
                                  ids67, ids81, feet, num_steps=steps)
    init72_j = jnp.asarray(init72)

    def run():
        fitted, losses = fit(target, contact, init72_j)
        jax.block_until_ready(fitted)
        return losses

    run()  # warmup / compile
    t0 = time.perf_counter()
    n_calls = 10
    for _ in range(n_calls):
        losses = run()
    dt = time.perf_counter() - t0

    frame_iters_per_sec = T * steps * n_calls / dt
    baseline, provenance = _reference_baseline()
    out = {
        "metric": "smplx_fitting_frame_iters_per_sec",
        "value": round(frame_iters_per_sec, 2),
        "unit": "frames*steps/s",
        "vs_baseline": round(frame_iters_per_sec / baseline, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "window_frames": T,
            "steps_per_call": steps,
            "calls": n_calls,
            "wall_s": round(dt, 3),
            "final_loss": float(np.asarray(losses)[-1]),
            "baseline_assumption": provenance,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
