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
    ap.add_argument("--auto", action="store_true",
                    help="coll_candidates_auto: grow K to cover the "
                         "warm-start firing set (exact at refresh)")
    ap.add_argument("--part_filter", action="store_true",
                    help="wire the tube mesh's per-bone part ids + the "
                         "kinematic parent ignore table (FilterFaces "
                         "realism; VERDICT r4 ask #7)")
    ap.add_argument("--small", action="store_true",
                    help="536-vert mesh for a CPU smoke run")
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
    md = synthetic_smplx_npz(full_size=not args.small,
                             smooth_surface=True)
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
    faces_segm = ign_table = None
    if args.part_filter:
        from lemo_tpu.ops.intersection import build_face_filter
        from lemo_tpu.testing.synthetic import compact_part_table

        part_of_joint, part_parent = compact_part_table(55)
        fsegm = part_of_joint[md["face_parts"]]
        # parent-part collisions ignored (FilterFaces semantics) + the
        # reference config's ign_part_pairs live in joint-part space —
        # remap through the compact table
        ref_pairs = ["9,16", "9,17", "6,16", "6,17", "1,2", "12,22"]
        pairs = [f"{part_of_joint[int(a)]},{part_of_joint[int(b)]}"
                 for a, b in (p.split(",") for p in ref_pairs)]
        filt = build_face_filter(
            np.asarray(md["f"]), faces_segm=fsegm, ign_part_pairs=pairs,
            faces_parents=part_parent[fsegm])
        faces_segm, ign_table = filt["segm"], filt["ign_table"]
        print(f"part filter: {int(fsegm.max()) + 1} parts, "
              f"{int(ign_table.sum())} ignored pairs", flush=True)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"],
                        smooth_enc_params=None, smooth_stats=None,
                        faces_segm=faces_segm, ign_table=ign_table)

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
            coll_candidates_auto=args.auto,
            steps_per_dispatch=min(
                50 if cand else args.steps_per_dispatch_pallas, maxiters),
        )

    def audit_exactness(res, cfg):
        """Post-fit exactness audit (VERDICT r4 ask #2): recompute the
        FULL dense energy at the final solution and compare to the
        candidate-subset energy there. The candidate set is rebuilt from
        the same warm start the driver used (deterministic), so this is
        exactly the subset the 900 iterations optimized."""
        import jax.numpy as jnp

        from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
        from lemo_tpu.fitting.prox.driver import (_coll_candidate_ids,
                                                  _warm_start_vertices)
        from lemo_tpu.ops.intersection import batched_self_intersection

        rec = ProxRecording.from_recording_dir(cfg.recording_dir)
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=cfg.batch_size, flip=False,
                               read_depth=False, read_mask=False)
        warm = ds.load_window(0)["warm_start"]
        ids = _coll_candidate_ids(cfg, assets, warm)
        final = {k: np.asarray(v) for k, v in res[0].params.items()}
        verts = _warm_start_vertices(cfg, assets, final)
        faces = jnp.asarray(np.asarray(md["f"], np.int32))
        kw = {}
        if faces_segm is not None:
            kw = dict(segm=jnp.asarray(faces_segm),
                      ign_table=jnp.asarray(ign_table))
        e_full = float(batched_self_intersection(
            verts, faces, frame_chunk=10, **kw).sum())
        e_sub = float(batched_self_intersection(
            verts, faces, candidate_ids=jnp.asarray(ids), **kw).sum())
        rel = abs(e_sub - e_full) / max(abs(e_full), 1e-12)
        return {"K": int(ids.shape[1]), "e_full_final": e_full,
                "e_subset_final": e_sub, "rel_err_final": rel}

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
           "coll_candidates_auto": bool(args.auto),
           "part_filter": bool(args.part_filter),
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
            if cand:
                metrics["audit"] = audit_exactness(
                    res, cfg_for(True, args.maxiters))
                print(f"[audit] {metrics['audit']}", flush=True)
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
        if cand:
            out[mode]["audit"] = audit_exactness(res, cfg)
            print(f"[audit] {out[mode]['audit']}", flush=True)
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
