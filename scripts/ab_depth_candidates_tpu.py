"""Wall-clock A/B of the depth (s2m/m2s) Chamfer terms on the real TPU:
full-cloud per-iteration Chamfer vs the temporal-coherence candidate
subsets (cfg.depth_candidates).

The reference computes both directions over the full clouds every
iteration (20k scan pts x 10475 verts per frame,
fitting_temp_slide.py:637-670) plus a per-frame CPU visibility
round-trip; our exact path already fuses that on-device (Pallas NN +
z-buffer visibility, PERF.md: s2m +208 ms, m2s +103 ms per window step).
The candidate path cuts the pairwise work to K x K per frame with frozen
warm-start remainders (driver._depth_candidate_data) — exact at refresh
time by construction.

Run (TPU):  python scripts/ab_depth_candidates_tpu.py
            [--frames 100] [--maxiters 100] [--modes cand,exact]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--maxiters", type=int, default=100)
    ap.add_argument("--depth_candidates", type=int, default=2048)
    ap.add_argument("--modes", default="cand,cand_livevis,exact",
                    help="comma list: cand (frozen visibility), "
                         "cand_livevis (per-step z-buffer), exact")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for a smoke run)")
    # two-point steady-state measurement (scripts/_ab_common.py): per
    # mode, "m1,m2" timed runs after a warmup run; compile + pre-pass
    # cancel in the difference. Overrides --maxiters when set.
    ap.add_argument("--steady", default="",
                    help="m1,m2 two-point measurement for every mode")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from lemo_tpu.body_model import load_model
    from lemo_tpu.config import ProxConfig
    from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz
    from lemo_tpu.testing.synthetic_prox import \
        write_synthetic_prox_recording

    print("device:", jax.devices()[0], flush=True)
    md = synthetic_smplx_npz(full_size=True)   # 10475 verts
    base = tempfile.mkdtemp()
    t0 = time.time()
    info = write_synthetic_prox_recording(
        base, num_frames=args.frames + 5, model_dict=md, seed=0,
        write_depth=True)
    print(f"recording built in {time.time() - t0:.0f}s", flush=True)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"],
                        smooth_enc_params=None, smooth_stats=None)

    def cfg_for(mode: str) -> ProxConfig:
        cand = mode.startswith("cand")
        return ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=args.frames, maxiters=args.maxiters, lr=0.005,
            flip=False, s2m=True, m2s=True, read_depth=True,
            read_mask=True, init_mode="none",
            sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, use_motion_infill_prior=False,
            contact=False, interpenetration=False,
            depth_candidates=args.depth_candidates if cand else 0,
            depth_frozen_visibility=(mode == "cand"),
            steps_per_dispatch=min(50, args.maxiters),
        )

    def audit_exactness(res, cfg):
        """Post-fit exactness audit (VERDICT r4 asks #2/#3): at the
        final solution, compare the candidate-subset s2m/m2s energies
        (candidate sets rebuilt from the driver's warm start —
        deterministic) against the exact full-cloud terms."""
        import dataclasses as dc

        from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
        from lemo_tpu.fitting.prox.driver import (_warm_start_vertices,
                                                  build_window_static,
                                                  weights_from_config)
        from lemo_tpu.fitting.prox.losses import depth_terms

        rec = ProxRecording.from_recording_dir(cfg.recording_dir)
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=cfg.batch_size, flip=False,
                               read_depth=True, read_mask=True)
        wd = ds.load_window(0)
        st = build_window_static(cfg, assets, rec, wd, ds.joint_weights())
        st_exact = dc.replace(st, depth_scan_cand_ids=None,
                              depth_vert_cand_ids=None, s2m_frozen=None,
                              m2s_frozen=None, depth_vis_frozen=None)
        final = {k: np.asarray(v) for k, v in res[0].params.items()}
        verts = _warm_start_vertices(cfg, assets, final)
        w = weights_from_config(cfg)
        s2m_c, m2s_c = depth_terms(verts, st, w)
        s2m_e, m2s_e = depth_terms(verts, st_exact, w)
        rel = lambda a, b: abs(float(a) - float(b)) / max(  # noqa: E731
            abs(float(b)), 1e-12)
        return {"s2m_subset_final": float(s2m_c),
                "s2m_full_final": float(s2m_e),
                "s2m_rel_err_final": rel(s2m_c, s2m_e),
                "m2s_subset_final": float(m2s_c),
                "m2s_full_final": float(m2s_e),
                "m2s_rel_err_final": rel(m2s_c, m2s_e)}

    out = {"frames": args.frames, "maxiters": args.maxiters,
           "verts": int(model.num_verts),
           "depth_candidates": args.depth_candidates,
           "device": str(jax.devices()[0])}
    for mode in args.modes.split(","):
        if args.steady:
            from _ab_common import measure_steady

            m1, m2 = (int(x) for x in args.steady.split(","))

            def run(m, _mode=mode):
                c = cfg_for(_mode)
                import dataclasses as dc
                c = dc.replace(c, maxiters=m,
                               output_folder=tempfile.mkdtemp())
                return run_prox_fitting(c, assets, max_windows=1,
                                        verbose=False)
            metrics, res = measure_steady(run, m1, m2, warmup=50)
            th = res[0].term_history or {}
            metrics.update(
                final_loss=round(float(res[0].final_loss), 4),
                final_s2m=float(np.asarray(th.get("s2m_dist",
                                                  [np.nan]))[-1]),
                final_m2s=float(np.asarray(th.get("m2s_dist",
                                                  [np.nan]))[-1]))
            if mode.startswith("cand"):
                metrics["audit"] = audit_exactness(res, cfg_for(mode))
                print(f"[audit] {metrics['audit']}", flush=True)
            out[mode] = metrics
            print(f"[{mode}] steady "
                  f"{metrics['steady_ms_per_step']:.0f} ms/step (fixed "
                  f"{metrics['fixed_cost_s']:.0f}s), final loss "
                  f"{metrics['final_loss']:.4f}", flush=True)
            continue
        cfg = cfg_for(mode)
        t0 = time.time()
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        dt = time.time() - t0
        loss = float(res[0].final_loss)
        th = res[0].term_history or {}
        out[mode] = {
            "wall_s": round(dt, 1),
            "ms_per_step": round(dt / args.maxiters * 1e3, 1),
            "final_loss": round(loss, 4),
            "final_s2m": float(np.asarray(th.get("s2m_dist", [np.nan]))[-1]),
            "final_m2s": float(np.asarray(th.get("m2s_dist", [np.nan]))[-1]),
        }
        if mode.startswith("cand"):
            out[mode]["audit"] = audit_exactness(res, cfg)
            print(f"[audit] {out[mode]['audit']}", flush=True)
        print(f"[{mode}] {dt:.1f}s ({dt / args.maxiters * 1e3:.0f} "
              f"ms/step incl. compile+IO), final loss {loss:.4f}",
              flush=True)

    if "cand" in out and "exact" in out:
        rate = lambda m: m.get("steady_ms_per_step",  # noqa: E731
                               m.get("ms_per_step"))
        out["speedup"] = round(rate(out["exact"]) / rate(out["cand"]), 2)
        print(f"candidate speedup: {out['speedup']}x", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
