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
    md = synthetic_smplx_npz(full_size=True)   # 10475 verts, 20908 faces
    base = tempfile.mkdtemp()
    t0 = time.time()
    info = write_synthetic_prox_recording(
        base, num_frames=args.frames + 5, model_dict=md, seed=0,
        write_depth=False)
    print(f"recording built in {time.time() - t0:.0f}s", flush=True)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"],
                        smooth_enc_params=None, smooth_stats=None)

    def cfg_for(cand: bool) -> ProxConfig:
        return ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=args.frames, maxiters=args.maxiters, lr=0.005,
            flip=False, s2m=False, m2s=False, read_depth=False,
            read_mask=False, sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, use_motion_infill_prior=False,
            contact=False,
            interpenetration=True,
            coll_frame_chunk=10,
            coll_candidates=args.coll_candidates if cand else 0,
            steps_per_dispatch=min(50, args.maxiters),
        )

    out = {"frames": args.frames, "maxiters": args.maxiters,
           "faces": int(model.faces.shape[0]),
           "coll_candidates": args.coll_candidates,
           "device": str(jax.devices()[0])}
    for mode in args.modes.split(","):
        cfg = cfg_for(mode == "cand")
        t0 = time.time()
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        dt = time.time() - t0
        loss = float(res[0].final_loss)
        pen = float(np.asarray(
            res[0].term_history.get("self_penetration_loss",
                                    [np.nan]))[-1]) \
            if res[0].term_history else float("nan")
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
        out["speedup"] = round(
            out["pallas"]["wall_s"] / out["cand"]["wall_s"], 2)
        print(f"candidate speedup: {out['speedup']}x", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
