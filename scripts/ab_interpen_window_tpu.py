"""Wall-clock A/B of an `interpenetration: True` PROX window on the real
TPU: full Pallas self-intersection every step vs the temporal-coherence
candidate broad phase (VERDICT r3 ask #2).

The reference rebuilds a CUDA BVH every optimizer step
(fit_temp_loadprox_slide.py:319-344, fitting_temp_slide.py:618-635); the
round-3 fused Pallas kernel brought the dense sweep to 21-25.7 ms/frame
but a 900-iter B=100 window still cost ~32 min. The candidate path
computes the active face set ONCE per window from stop-gradient
warm-start geometry with a margin (driver._coll_candidate_ids) and
evaluates the cone energy on that [T, K] subset every step — the
amortized analog of the BVH broad phase.

Run (TPU):  python scripts/ab_interpen_window_tpu.py
            [--frames 100] [--maxiters 100] [--modes cand,pallas]
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
    ap.add_argument("--coll_candidates", type=int, default=4096)
    ap.add_argument("--modes", default="cand,pallas",
                    help="comma list: cand, pallas")
    # the tunneled dev chip's watchdog kills dispatches that run minutes;
    # at ~2.1 s/step the full-sweep mode must chunk far below the default
    ap.add_argument("--steps_per_dispatch_pallas", type=int, default=5)
    # two-point steady-state measurement (scripts/_ab_common.py): per
    # mode, "m1,m2" timed runs after a warmup run; compile + pre-pass
    # cancel in the difference. Overrides --maxiters when set.
    ap.add_argument("--steady_cand", default="",
                    help="m1,m2 two-point measurement for cand mode")
    ap.add_argument("--steady_pallas", default="",
                    help="m1,m2 two-point measurement for pallas mode")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for a smoke run)")
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
    # smooth_surface: tube topology — faces only collide where body parts
    # meet, like a real mesh. The default random-triangle soup has EVERY
    # face on a firing pair, which no broad phase can prune (measured:
    # n_active == F, cand == dense speed).
    md = synthetic_smplx_npz(full_size=True, smooth_surface=True)
    base = tempfile.mkdtemp()
    t0 = time.time()
    # pose_scale tames the random-VPoser poses to the mild-contact regime
    # a real PROX fit sees (unit scale: ~10k faces on firing pairs — a
    # crumpled body, not a benchmark of the production case); vposer off
    # so the warm start IS the scaled pose
    info = write_synthetic_prox_recording(
        base, num_frames=args.frames + 5, model_dict=md, seed=0,
        write_depth=False, pose_scale=0.35)
    print(f"recording built in {time.time() - t0:.0f}s", flush=True)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"],
                        smooth_enc_params=None, smooth_stats=None)

    def cfg_for(cand: bool, maxiters: int) -> ProxConfig:
        return ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=args.frames, maxiters=maxiters, lr=0.005,
            flip=False, s2m=False, m2s=False, read_depth=False,
            read_mask=False, sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, use_motion_infill_prior=False,
            contact=False, use_vposer=False,
            interpenetration=True,
            coll_frame_chunk=10,
            coll_candidates=args.coll_candidates if cand else 0,
            steps_per_dispatch=min(
                50 if cand else args.steps_per_dispatch_pallas, maxiters),
        )

    def summarize(res):
        loss = float(res[0].final_loss)
        pen = float(np.asarray(
            res[0].term_history.get("self_penetration_loss",
                                    [np.nan]))[-1]) \
            if res[0].term_history else float("nan")
        return loss, pen

    out = {"frames": args.frames, "maxiters": args.maxiters,
           "faces": int(model.faces.shape[0]),
           "coll_candidates": args.coll_candidates,
           "device": str(jax.devices()[0])}
    for mode in args.modes.split(","):
        cand = mode == "cand"
        steady = args.steady_cand if cand else args.steady_pallas
        if steady:
            from _ab_common import measure_steady
            m1, m2 = (int(x) for x in steady.split(","))
            run = lambda m: run_prox_fitting(  # noqa: E731
                cfg_for(cand, m), assets, max_windows=1, verbose=False)
            spd = 50 if cand else args.steps_per_dispatch_pallas
            metrics, res = measure_steady(run, m1, m2, warmup=spd)
            loss, pen = summarize(res)
            metrics.update(final_loss=round(loss, 4), final_interpen=pen)
            out[mode] = metrics
            print(f"[{mode}] steady {metrics['steady_ms_per_step']:.0f} "
                  f"ms/step (fixed {metrics['fixed_cost_s']:.0f}s), "
                  f"final loss {loss:.4f}", flush=True)
            continue
        cfg = cfg_for(cand, args.maxiters)
        t0 = time.time()
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        dt = time.time() - t0
        loss, pen = summarize(res)
        out[mode] = {
            "wall_s": round(dt, 1),
            "ms_per_step": round(dt / args.maxiters * 1e3, 1),
            "final_loss": round(loss, 4),
            "final_interpen": pen,
        }
        print(f"[{mode}] {dt:.1f}s ({dt / args.maxiters * 1e3:.0f} "
              f"ms/step incl. compile+IO), final loss {loss:.4f}",
              flush=True)

    if "cand" in out and "pallas" in out:
        rate = lambda m: m.get("steady_ms_per_step",  # noqa: E731
                               m.get("ms_per_step"))
        out["speedup"] = round(rate(out["pallas"]) / rate(out["cand"]), 2)
        print(f"candidate speedup: {out['speedup']}x (steady)", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
