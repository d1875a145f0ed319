"""AMASS Stage-1 fitting CLI (reference opt_amass_perframe.py surface).

Outputs the same artifacts: per-clip ``body_params_opt_clip_<i>.npy``
[T, 72], ``contact_lbl_rec_clip_<i>.npy`` [T, 4], and ``gender_list.npy``
under <save_dir>/<dataset_name>/.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--amass_dir", type=str, required=True)
    p.add_argument("--body_model_path", type=str, required=True)
    p.add_argument("--clip_seconds", type=int, default=4)
    p.add_argument("--body_mode", type=str, default="local_markers_4chan",
                   choices=["local_markers", "local_markers_4chan"])
    p.add_argument("--conv_k", type=int, default=3)
    p.add_argument("--infill_model_path", type=str,
                   default="runs/59547/AE_last_model.npz")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=100)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--dataset_name", type=str, default="TotalCapture")
    p.add_argument("--save_dir", type=str, default="res_opt_amass_perframe")
    p.add_argument("--weight_loss_rec_markers", type=float, default=1.0)
    p.add_argument("--weight_loss_vposer", type=float, default=0.02)
    p.add_argument("--weight_loss_shape", type=float, default=0.01)
    p.add_argument("--weight_loss_hand", type=float, default=0.01)
    p.add_argument("--fit_mode", type=str, default="parallel",
                   choices=["parallel", "sequential"],
                   help="parallel: TPU-first batched frames; "
                        "sequential: reference-faithful warm-start chain")
    p.add_argument("--num_fit_steps", type=int, default=100)
    p.add_argument("--stats_path", type=str,
                   default="preprocess_stats/"
                           "preprocess_stats_infill_local_markers_4chan.npz")
    p.add_argument("--vposer_ckpt", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, vposer as vp
    from lemo_tpu.data import amass
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.stats import Local4ChanStats
    from lemo_tpu.fitting import amass_perframe as s1
    from lemo_tpu.fitting import infill as fi
    from lemo_tpu.priors.conv_ae import load_state_dict_npz, \
        load_torch_state_dict

    smplx_model_path = os.path.join(args.body_model_path, "smplx_model")
    if not os.path.isdir(smplx_model_path):
        smplx_model_path = args.body_model_path

    # priors / stats
    ae = (load_torch_state_dict(args.infill_model_path)
          if args.infill_model_path.endswith(".pkl")
          else load_state_dict_npz(args.infill_model_path))
    stats = Local4ChanStats.load(args.stats_path)
    if args.vposer_ckpt:
        from lemo_tpu.priors.conv_ae import load_torch_state_dict as ltd
        vposer_params = ltd(args.vposer_ckpt)
    else:
        vposer_params = vp.init_vposer(jax.random.PRNGKey(0))

    # data: fitting loader (normalized, with betas/gender/rot_0_pivot)
    builder = amass.AmassRepresentationBuilder(smplx_model_path,
                                               with_hand=False)
    clips = amass.scan_amass([args.dataset_name], args.amass_dir,
                             args.clip_seconds)
    images, aux = amass.build_dataset(builder, clips, "local_markers_4chan",
                                      args.clip_seconds, smooth_forward=False)
    images_n = np.asarray(stats.normalize(jnp.asarray(images)))

    from lemo_tpu.body_model.smplx import find_smplx_npz

    models = {g: load_model(
        find_smplx_npz(args.body_model_path, g),
        gender=g, use_pca=True, num_pca_comps=12)
        for g in ("male", "female")}
    marker_ids = marker_indices(False)

    save_folder = os.path.join(args.save_dir, args.dataset_name)
    os.makedirs(save_folder, exist_ok=True)
    np.save(os.path.join(save_folder, "gender_list.npy"), aux["gender"])

    weights = s1.Stage1Weights(args.weight_loss_rec_markers,
                               args.weight_loss_vposer,
                               args.weight_loss_shape,
                               args.weight_loss_hand)
    # one compiled fitter per gender, reused across clips
    fitters = ({g: s1.make_stage1_fitter(m, vposer_params, marker_ids,
                                         args.num_fit_steps, weights)
                for g, m in models.items()}
               if args.fit_mode == "parallel" else None)

    for i in range(args.start, min(args.end, len(clips)), args.step):
        clip_img = jnp.asarray(images_n[i]).swapaxes(1, 2)[None]  # [1,4,d,T]
        mask_dT = jnp.asarray(fi.amass_input_mask(clip_img.shape[2],
                                                  clip_img.shape[3]))
        rec, _, _ = fi.infill_infer(ae, clip_img, mask_dT,
                                    finetune_steps=60, finetune_lr=3e-6)
        contact = fi.contact_labels_from_rec(rec)[0]
        np.save(os.path.join(save_folder, f"contact_lbl_rec_clip_{i}.npy"),
                np.asarray(contact))

        targets = s1.reconstruct_marker_targets(
            rec[0], clip_img[0], stats,
            jnp.asarray(aux["rot_0_pivot"][i]))
        gender = "male" if aux["gender"][i] == 1 else "female"
        if fitters is not None:
            fitted, _ = fitters[gender](targets, jnp.asarray(aux["betas"][i]))
        else:
            fitted, _ = s1.fit_clip(models[gender], vposer_params,
                                    marker_ids, targets,
                                    jnp.asarray(aux["betas"][i]),
                                    mode=args.fit_mode,
                                    num_steps=args.num_fit_steps,
                                    weights=weights)
        np.save(os.path.join(save_folder, f"body_params_opt_clip_{i}.npy"),
                np.asarray(fitted))
        print(f"[clip {i}] saved ({fitted.shape[0]} frames)")


if __name__ == "__main__":
    main()
