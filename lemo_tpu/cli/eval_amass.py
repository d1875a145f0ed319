"""Quantitative 3D-accuracy evaluation of fitted AMASS clips.

The reference exposes GT hooks — the fitting loader returns GT smplx
params + the world->canonical transform (optimize_loader_amass_new.py:
283-308) and the fitters carry commented-out consumption code
(opt_amass_perframe.py:111-115,188-201) — but ships no eval script (the
paper's numbers were computed offline). This CLI closes that gap: it
runs fitted ``body_params_opt_clip_<i>.npy`` [T, 72] rows and the GT
parameters through the body model, maps GT into the canonical fitted
frame, and reports marker error, MPJPE, acceleration error, and foot
skate per clip + aggregated, as JSON.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# GT row layout (optimize_loader_amass_new.py:300-302)
_GT_SLICES = {
    "transl": (0, 3), "global_orient": (3, 6), "betas": (6, 16),
    "body_pose": (16, 79), "left_hand_pose": (79, 124),
    "right_hand_pose": (124, 169),
}


def split_gt_params(row169):
    """[T, 169] GT rows -> smplx kwargs (45-d hands: the GT models are
    use_pca=False, flat_hand_mean=True preprocessing models)."""
    return {k: row169[:, a:b] for k, (a, b) in _GT_SLICES.items()}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fitting_root", type=str, default="res_opt_amass_temp")
    p.add_argument("--dataset_name", type=str, default="TotalCapture")
    p.add_argument("--amass_dir", type=str, required=True)
    p.add_argument("--body_model_path", type=str, required=True)
    p.add_argument("--clip_seconds", type=int, default=4)
    p.add_argument("--vposer_ckpt", type=str, default=None)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=100)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--out", type=str, default="eval_amass.json")
    return p


def evaluate_clip(x72, contact, gt169, transf, model_fit, model_gt,
                  fwd_fit, fwd_gt, vposer_params, marker_ids, foot_ids):
    """Metrics for one clip. All geometry is compared in the canonical
    fitted frame (GT pushed through transf_matrix_smplx)."""
    import jax.numpy as jnp

    from lemo_tpu.fitting import params as P
    from lemo_tpu.utils import metrics as M

    T = min(x72.shape[0], gt169.shape[0])
    sp = P.smplx_params_from_72(jnp.asarray(x72[:T]), vposer_params)
    out_fit = fwd_fit(sp, model_fit.consts)

    gt = {k: jnp.asarray(v) for k, v in split_gt_params(gt169[:T]).items()}
    zeros = model_gt.zero_params(T)
    for k in zeros:
        gt.setdefault(k, zeros[k])
    out_gt = fwd_gt(gt, model_gt.consts)
    tf = jnp.asarray(transf)

    mk_fit = out_fit["vertices"][:, marker_ids]
    mk_gt = M.apply_world_transform(out_gt["vertices"][:, marker_ids], tf)
    j_fit = out_fit["joints"][:, :25]
    j_gt = M.apply_world_transform(out_gt["joints"][:, :25], tf)

    res = {"marker_error_m": M.marker_error(mk_fit, mk_gt),
           "mpjpe_m": M.mpjpe(j_fit, j_gt),
           "mpjpe_root_aligned_m": M.mpjpe(j_fit, j_gt, align_root=True),
           "accel_error_m_s2": M.accel_error(mk_fit, mk_gt),
           "frames": int(T)}
    if contact is not None:
        res["foot_skate"] = M.foot_skate(
            out_fit["vertices"], jnp.asarray(contact[:T]), foot_ids)
        # GT skate as the reference point for the friction losses
        res["foot_skate_gt"] = M.foot_skate(
            M.apply_world_transform(out_gt["vertices"], tf),
            jnp.asarray(contact[:T]), foot_ids)
    return res


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from lemo_tpu.body_model import load_model, make_forward_fn, vposer as vp
    from lemo_tpu.body_model.smplx import find_smplx_npz
    from lemo_tpu.data import amass
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.priors.conv_ae import load_state_dict_npz, \
        load_torch_state_dict

    smplx_model_path = os.path.join(args.body_model_path, "smplx_model")
    if not os.path.isdir(smplx_model_path):
        smplx_model_path = args.body_model_path

    vposer_params = vp.init_vposer(jax.random.PRNGKey(0))
    if args.vposer_ckpt:
        vposer_params = (load_torch_state_dict(args.vposer_ckpt)
                         if args.vposer_ckpt.endswith((".pkl", ".pt"))
                         else load_state_dict_npz(args.vposer_ckpt))

    builder = amass.AmassRepresentationBuilder(smplx_model_path,
                                               with_hand=False)
    clips = amass.scan_amass([args.dataset_name], args.amass_dir,
                             args.clip_seconds)
    T = args.clip_seconds * 30

    models_fit = {g: load_model(find_smplx_npz(args.body_model_path, g),
                                gender=g, use_pca=True, num_pca_comps=12)
                  for g in ("male", "female")}
    fwds_fit = {g: jax.jit(make_forward_fn(m))
                for g, m in models_fit.items()}
    # the builder already holds one jitted forward taking per-gender
    # consts as a traced argument — reuse it for the GT side
    fwds_gt = {g: builder._fwd for g in builder.models}

    any_model = next(iter(models_fit.values()))
    marker_ids = marker_indices(False, num_verts=any_model.num_verts)
    foot_ids = foot_vertex_ids(any_model.num_verts)

    folder = os.path.join(args.fitting_root, args.dataset_name)
    report = {"clips": {}, "dataset": args.dataset_name,
              "fitting_root": args.fitting_root}
    for i in range(args.start, min(args.end, len(clips)), args.step):
        fn = os.path.join(folder, f"body_params_opt_clip_{i}.npy")
        if not os.path.exists(fn):
            continue
        x72 = np.load(fn)
        cfn = os.path.join(folder, f"contact_lbl_rec_clip_{i}.npy")
        contact = np.load(cfn) if os.path.exists(cfn) else None
        gt169, transf = builder.gt_eval_data(clips[i], T)
        # fit side: the pipeline's convention (anything but "male" was
        # fitted with the female model, build_dataset gender encoding);
        # GT side: exactly the model builder.markers_and_joints used
        g = "male" if clips[i].gender == "male" else "female"
        g_gt = (clips[i].gender if clips[i].gender in builder.models
                else next(iter(builder.models)))
        report["clips"][i] = evaluate_clip(
            x72, contact, gt169, transf, models_fit[g],
            builder.models[g_gt], fwds_fit[g], fwds_gt[g_gt],
            vposer_params, marker_ids, foot_ids)
        print(f"[clip {i}] marker mean "
              f"{report['clips'][i]['marker_error_m']['mean']:.4f} m, "
              f"MPJPE {report['clips'][i]['mpjpe_m']:.4f} m")

    if report["clips"]:
        vals = list(report["clips"].values())
        report["mean"] = {
            "marker_error_m": float(np.mean(
                [v["marker_error_m"]["mean"] for v in vals])),
            "mpjpe_m": float(np.mean([v["mpjpe_m"] for v in vals])),
            "mpjpe_root_aligned_m": float(np.mean(
                [v["mpjpe_root_aligned_m"] for v in vals])),
            "accel_error_m_s2": float(np.mean(
                [v["accel_error_m_s2"] for v in vals])),
        }
        skates = [v["foot_skate"] for v in vals if "foot_skate" in v]
        if skates:
            report["mean"]["foot_skate"] = float(np.mean(skates))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out} ({len(report['clips'])} clips)")


if __name__ == "__main__":
    main()
