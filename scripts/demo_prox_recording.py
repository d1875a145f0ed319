"""End-to-end demo: fit a full synthetic PROX recording and report
wall-clock — the BASELINE.md north-star measurement
(Stage-2-config fit of a ~2k-frame recording, target < 2 min on TPU).

Usage:
    python scripts/demo_prox_recording.py [--frames 2000] [--maxiters 900]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--maxiters", type=int, default=900)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--full_size_model", action="store_true", default=True)
    ap.add_argument("--small_model", dest="full_size_model",
                    action="store_false",
                    help="fit with the recording's own small synthetic "
                         "model (CPU-mesh smoke tests)")
    ap.add_argument("--windows", type=int, default=None)
    ap.add_argument("--window_parallel", action="store_true",
                    help="fit all windows concurrently (multi-chip mode)")
    ap.add_argument("--s3", action="store_true",
                    help="Stage-3 config: enable the motion-infill prior "
                         "(per-window AE finetune pre-pass + infill terms)")
    ap.add_argument("--exact_sdf", action="store_true",
                    help="bit-exact fp32 SDF sampling instead of the "
                         "2x-faster bf16-packed default")
    ap.add_argument("--fp8_sdf", action="store_true",
                    help="fp8-quad SDF sampling (2 gathers, 3.8x; "
                         "~2 mm SDF resolution)")
    ap.add_argument("--sdf_candidates", type=int, default=0,
                    help="sample the penetration term only at the K "
                         "warm-start-nearest-to-scene vertices (0 = all)")
    ap.add_argument("--all_terms", action="store_true",
                    help="enable EVERY loss family (adds depth s2m/m2s, "
                         "scene contact, self-interpenetration — the "
                         "cfg_files/PROXD_temp_S3_all_terms.yaml shape)")
    ap.add_argument("--intersection_impl", type=str, default="",
                    choices=["", "dense", "pallas", "auto"],
                    help="override ops.intersection.INTERSECTION_IMPL")
    args = ap.parse_args()

    import jax
    
    from lemo_tpu.body_model import load_model
    from lemo_tpu.config import ProxConfig
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
    from lemo_tpu.data.stats import Local4ChanStats
    from lemo_tpu.priors.conv_ae import init_infill_ae, init_smooth_enc, \
        load_torch_state_dict
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz
    from lemo_tpu.testing.synthetic_prox import \
        write_synthetic_prox_recording

    print(f"devices: {jax.devices()}", file=sys.stderr)
    if args.intersection_impl:
        from lemo_tpu.ops import intersection as _xi

        _xi.INTERSECTION_IMPL = args.intersection_impl

    base = tempfile.mkdtemp(prefix="prox_demo_")
    t0 = time.time()
    # generate with a small model for speed; fit with the full-size mesh
    info = write_synthetic_prox_recording(base, num_frames=args.frames,
                                          seed=11,
                                          write_depth=args.all_terms)
    t_gen = time.time() - t0
    print(f"recording generated: {args.frames} frames in {t_gen:.0f}s",
          file=sys.stderr)

    model_dict = (synthetic_smplx_npz(full_size=True)
                  if args.full_size_model else info["model_dict"])
    # marker/segment ids auto-fold for reduced meshes; full-size is exact
    model = load_model(model_dict if args.full_size_model
                       else info["model_dict"],
                       use_pca=True, num_pca_comps=12)
    try:
        enc = load_torch_state_dict(
            "/root/reference/runs/15217/Enc_last_model.pkl")
        stats = GlobalStats.load(
            "/root/reference/preprocess_stats/"
            "preprocess_stats_smooth_withHand_global_markers.npz")
    except Exception:
        enc = init_smooth_enc(jax.random.PRNGKey(0))
        stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))

    # term flags the two demo modes disagree on (one dict, overwritten in
    # place, so a new flag can't silently diverge between the modes)
    extra = dict(s2m=False, m2s=False, read_depth=False, read_mask=False,
                 interpenetration=False, contact=False)
    if args.all_terms:
        extra.update(
            s2m=True, m2s=True, read_depth=True, read_mask=True,
            s2m_weights=[5e2], m2s_weights=[1.0],
            contact=True, contact_loss_weights=[1.0],
            interpenetration=True, coll_loss_weights=[1e-5],
        )
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=os.path.join(base, "fit_out"),
        batch_size=args.batch_size, maxiters=args.maxiters, lr=0.005,
        flip=False, sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=True,
        use_motion_infill_prior=args.s3 or args.all_terms,
        motion_infill_rec_weights=[2.0], motion_infill_contact_weights=[0.1],
        window_parallel=args.window_parallel,
        sdf_packed=not args.exact_sdf, sdf_fp8=args.fp8_sdf,
        sdf_candidates=args.sdf_candidates,
        **extra,
    )
    # NOTE: the fit model is the generator's model when not full-size so
    # keypoints correspond; with full_size we fit the big mesh to the
    # small-body keypoints — throughput-representative, not accuracy.
    if not args.full_size_model:
        model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    faces_segm = ign_table = None
    if args.all_terms:
        from lemo_tpu.fitting.prox.driver import load_part_segm
        from lemo_tpu.testing.synthetic import write_part_segm_pkl

        segm_fn = os.path.join(base, "parts_segm.pkl")
        write_part_segm_pkl(segm_fn, np.asarray(model.faces), num_parts=27)
        faces_segm, ign_table = load_part_segm(
            segm_fn, model.faces,
            ["9,16", "9,17", "6,16", "6,17", "1,2", "12,22"])

    infill_ae = infill_stats = None
    if args.s3 or args.all_terms:
        infill_ae = init_infill_ae(jax.random.PRNGKey(2))
        try:
            infill_stats = Local4ChanStats.load(
                "/root/reference/preprocess_stats/"
                "preprocess_stats_infill_local_markers_4chan.npz")
        except Exception:
            d = (1 + 67) * 3 + 4
            infill_stats = Local4ChanStats(
                Xmean_local=np.zeros(d, np.float32),
                Xstd_local=np.ones(d, np.float32),
                Xmean_global_xy=0.0, Xstd_global_xy=1.0,
                Xmean_global_r=0.0, Xstd_global_r=1.0)
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"],
                        smooth_enc_params=enc, smooth_stats=stats,
                        infill_ae_params=infill_ae,
                        infill_stats=infill_stats,
                        faces_segm=faces_segm, ign_table=ign_table)

    t1 = time.time()
    results = run_prox_fitting(cfg, assets, max_windows=args.windows,
                               verbose=True)
    wall = time.time() - t1
    n_frames = args.frames
    out = {
        "metric": "prox_recording_wallclock_s",
        "value": round(wall, 1),
        "unit": "s",
        "detail": {
            "frames": n_frames,
            "windows": len(results),
            "maxiters": args.maxiters,
            "device": str(jax.devices()[0]),
            "frames_per_sec": round(n_frames / wall, 2),
            "north_star": "<120 s for ~2k frames (BASELINE.md)",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
