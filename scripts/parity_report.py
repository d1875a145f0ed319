"""End-to-end golden-output parity report (needs the licensed SMPL-X npz).

Fits one golden TotalCapture clip through the Stage-2 temporal pipeline and
reports marker/vertex error against the reference's committed solution
(`res_opt_amass_temp/TotalCapture/body_params_opt_clip_*.npy`).

What it measures: the reference's Stage-2 run produced `x72_ref` from
Stage-1 inits + infill targets + the smoothness prior. The original AMASS
inputs are not redistributable, so this harness reconstructs the closest
runnable equivalent:

  1. forward `x72_ref` through the LICENSED body model -> reference-solution
     markers (the fixed point the reference converged to);
  2. run OUR Stage-2 fitter from the golden Stage-1 init
     (`res_opt_amass_perframe`) toward those markers with the shipped
     reference smoothness-prior weights (`runs/15217`);
  3. report how closely our optimizer lands on the reference's solution, in
     marker space (mm) and parameter space.

A small error means the whole stack — param layout, VPoser decode, SMPL-X
forward, marker extraction, smoothness prior, optimizer — reproduces the
reference's fixed point. Run:

    python scripts/parity_report.py --model_folder /path/to/smplx/models \
        [--vposer_ckpt /path/to/vposer] [--clip 0]

Without the licensed model this prints what is missing and exits 0 (the
CI-facing parity lives in tests/test_parity_oracle.py and
tests/test_torch_parity.py, which need no licensed assets).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

GOLDEN_PF = "/root/reference/res_opt_amass_perframe/TotalCapture"
GOLDEN_T = "/root/reference/res_opt_amass_temp/TotalCapture"
REF_ENC = "/root/reference/runs/15217/Enc_last_model.pkl"
REF_STATS = ("/root/reference/preprocess_stats/"
             "preprocess_stats_smooth_withHand_global_markers.npz")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_folder", required=True,
                    help="dir containing SMPLX_MALE.npz / SMPLX_FEMALE.npz")
    ap.add_argument("--vposer_ckpt", default=None,
                    help="VPoser experiment dir (snapshots/*.pt); random "
                         "init if absent — marker parity then measures the "
                         "fit, not the reference's exact pose decode")
    ap.add_argument("--clip", type=int, default=0)
    ap.add_argument("--num_steps", type=int, default=100)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.body_model.smplx import find_smplx_npz
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.fitting import params as P
    from lemo_tpu.priors.conv_ae import (init_smooth_enc,
                                         load_torch_state_dict)

    for d in (GOLDEN_PF, GOLDEN_T):
        if not osp.isdir(d):
            print(f"golden outputs missing: {d}; nothing to compare")
            return 0
    try:
        npz = find_smplx_npz(args.model_folder, "male")
    except Exception as e:  # noqa: BLE001
        print(f"licensed SMPL-X model not found under {args.model_folder}: "
              f"{e}\nProvide the official SMPLX_*.npz to run this report.")
        return 0

    i = args.clip
    genders = np.load(osp.join(GOLDEN_T, "gender_list.npy"))
    gender = "male" if genders[i] == 1 else "female"
    npz = find_smplx_npz(args.model_folder, gender)
    model = load_model(npz, gender=gender, use_pca=True, num_pca_comps=12)

    x72_ref = np.load(osp.join(GOLDEN_T, f"body_params_opt_clip_{i}.npy"))
    x72_init = np.load(osp.join(GOLDEN_PF, f"body_params_opt_clip_{i}.npy"))
    contact = np.load(osp.join(GOLDEN_T, f"contact_lbl_rec_clip_{i}.npy"))

    if args.vposer_ckpt:
        from lemo_tpu.utils.tools import load_vposer

        vposer_params, _ = load_vposer(args.vposer_ckpt)
    else:
        print("WARNING: no --vposer_ckpt; using random VPoser weights")
        vposer_params = vp.init_vposer(jax.random.PRNGKey(0))

    ids67 = marker_indices(False, num_verts=model.num_verts)
    ids81 = marker_indices(True, num_verts=model.num_verts)
    feet = foot_vertex_ids(model.num_verts)

    fwd = jax.jit(make_forward_fn(model))
    sp_ref = P.smplx_params_from_72(jnp.asarray(x72_ref, jnp.float32),
                                    vposer_params)
    ref_out = fwd(sp_ref, model.consts)
    ref_markers = np.asarray(ref_out["vertices"])[:, ids67]

    if osp.exists(REF_ENC):
        enc = load_torch_state_dict(REF_ENC)
        stats = GlobalStats.load(REF_STATS)
    else:
        print("WARNING: reference Enc checkpoint absent; random smooth "
              "prior")
        enc = init_smooth_enc(jax.random.PRNGKey(1))
        stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))

    fit = s2.make_temporal_fitter(model, vposer_params, enc, stats,
                                  ids67, ids81, feet,
                                  num_steps=args.num_steps)
    x72_fit, losses = fit(jnp.asarray(ref_markers, jnp.float32),
                          jnp.asarray(contact, jnp.float32),
                          jnp.asarray(x72_init, jnp.float32))
    x72_fit = np.asarray(x72_fit)

    sp_fit = P.smplx_params_from_72(jnp.asarray(x72_fit, jnp.float32),
                                    vposer_params)
    fit_markers = np.asarray(fwd(sp_fit, model.consts)["vertices"])[:, ids67]

    marker_err = np.linalg.norm(fit_markers - ref_markers, axis=-1)
    init_markers = np.asarray(fwd(
        P.smplx_params_from_72(jnp.asarray(x72_init, jnp.float32),
                               vposer_params),
        model.consts)["vertices"])[:, ids67]
    init_err = np.linalg.norm(init_markers - ref_markers, axis=-1)

    metrics = {
        "clip": i,
        "gender": gender,
        "frames": int(x72_ref.shape[0]),
        "num_steps": args.num_steps,
        "marker_err_mean_mm": float(marker_err.mean() * 1000),
        "marker_err_p95_mm": float(np.percentile(marker_err, 95) * 1000),
        "marker_err_max_mm": float(marker_err.max() * 1000),
        "init_err_mean_mm": float(init_err.mean() * 1000),
        "transl_delta_mean_mm": float(
            np.abs(x72_fit[:, :3] - x72_ref[:, :3]).mean() * 1000),
        "final_loss": float(losses[-1]),
    }
    print(f"clip {i} ({gender}, {x72_ref.shape[0]} frames), "
          f"{args.num_steps} fit steps")
    print(f"  marker error vs reference solution: "
          f"mean {metrics['marker_err_mean_mm']:.2f} mm  "
          f"p95 {metrics['marker_err_p95_mm']:.2f} mm  "
          f"max {metrics['marker_err_max_mm']:.2f} mm")
    print(f"  (Stage-1 init started at mean {init_err.mean() * 1000:.2f} mm)")
    print(f"  transl delta: mean "
          f"{metrics['transl_delta_mean_mm']:.2f} mm")
    print(f"  final fit loss {float(losses[-1]):.5f}")
    return metrics


if __name__ == "__main__":
    out = main()
    sys.exit(out if isinstance(out, int) else 0)
