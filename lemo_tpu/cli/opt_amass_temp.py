"""AMASS Stage-2 temporal fitting CLI (reference opt_amass_temp.py surface).

Refines Stage-1 results under the learned smoothness prior + contact
friction; same outputs: body_params_opt_clip_<i>.npy [T, 72] and
contact_lbl_rec_clip_<i>.npy under <save_dir>/<dataset_name>/.
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
    p.add_argument("--body_mode", type=str, default="local_markers_4chan")
    p.add_argument("--infill_model_path", type=str,
                   default="runs/59547/AE_last_model.npz")
    p.add_argument("--conv_k", type=int, default=3)
    p.add_argument("--smooth_model_path", type=str,
                   default="/root/reference/runs/15217/Enc_last_model.pkl")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=100)
    p.add_argument("--step", type=int, default=20)
    p.add_argument("--dataset_name", type=str, default="TotalCapture")
    p.add_argument("--perframe_res_dir", type=str,
                   default="res_opt_amass_perframe")
    p.add_argument("--save_dir", type=str, default="res_opt_amass_temp")
    p.add_argument("--weight_loss_rec_markers", type=float, default=1.0)
    p.add_argument("--weight_loss_contact_vel", type=float, default=0.03)
    p.add_argument("--weight_loss_smooth", type=float, default=1e6)
    p.add_argument("--weight_loss_vposer", type=float, default=0.02)
    p.add_argument("--weight_loss_shape", type=float, default=0.01)
    p.add_argument("--weight_loss_hand", type=float, default=0.01)
    p.add_argument("--num_fit_steps", type=int, default=100)
    p.add_argument("--clip_batch", type=int, default=1,
                   help="fit this many clips concurrently (vmapped corpus "
                        "layout; clips share the compiled fitter). Clips "
                        "are grouped by (gender, frame count): a batch "
                        "must be shape-uniform, so mixed-length corpora "
                        "form one batch group per distinct length")
    p.add_argument("--stats_path", type=str,
                   default="preprocess_stats/"
                           "preprocess_stats_infill_local_markers_4chan.npz")
    p.add_argument("--smooth_stats_path", type=str,
                   default="/root/reference/preprocess_stats/"
                           "preprocess_stats_smooth_withHand_global_markers.npz")
    p.add_argument("--vposer_ckpt", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, vposer as vp
    from lemo_tpu.data import amass
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.data.stats import GlobalStats, Local4ChanStats
    from lemo_tpu.fitting import amass_perframe as s1
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.fitting import infill as fi
    from lemo_tpu.priors.conv_ae import load_state_dict_npz, \
        load_torch_state_dict

    smplx_model_path = os.path.join(args.body_model_path, "smplx_model")
    if not os.path.isdir(smplx_model_path):
        smplx_model_path = args.body_model_path

    def load_any(path):
        return (load_torch_state_dict(path) if path.endswith(".pkl")
                else load_state_dict_npz(path))

    ae = load_any(args.infill_model_path)
    enc = load_any(args.smooth_model_path)
    stats = Local4ChanStats.load(args.stats_path)
    smooth_stats = GlobalStats.load(args.smooth_stats_path)
    vposer_params = (load_any(args.vposer_ckpt) if args.vposer_ckpt
                     else vp.init_vposer(jax.random.PRNGKey(0)))

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
    ids67 = marker_indices(False)
    ids81 = marker_indices(True)
    V = next(iter(models.values())).num_verts
    feet = foot_vertex_ids(V)

    save_folder = os.path.join(args.save_dir, args.dataset_name)
    os.makedirs(save_folder, exist_ok=True)
    np.save(os.path.join(save_folder, "gender_list.npy"), aux["gender"])

    weights = s2.Stage2Weights(
        rec_markers=args.weight_loss_rec_markers,
        vposer=args.weight_loss_vposer, shape=args.weight_loss_shape,
        hand=args.weight_loss_hand, smooth=args.weight_loss_smooth,
        contact_vel=args.weight_loss_contact_vel)
    # one compiled fitter per gender, reused across clips
    fitters = {g: s2.make_temporal_fitter(
        m, vposer_params, enc, smooth_stats, ids67, ids81, feet,
        args.num_fit_steps, weights) for g, m in models.items()}

    def prepare_clip(i):
        """Infill inference + target reconstruction for one clip."""
        init_path = os.path.join(args.perframe_res_dir, args.dataset_name,
                                 f"body_params_opt_clip_{i}.npy")
        init72 = np.load(init_path)
        clip_img = jnp.asarray(images_n[i]).swapaxes(1, 2)[None]
        mask_dT = jnp.asarray(fi.amass_input_mask(clip_img.shape[2],
                                                  clip_img.shape[3]))
        rec, _, _ = fi.infill_infer(ae, clip_img, mask_dT,
                                    finetune_steps=60, finetune_lr=3e-6)
        contact = fi.contact_labels_from_rec(rec)[0]
        np.save(os.path.join(save_folder, f"contact_lbl_rec_clip_{i}.npy"),
                np.asarray(contact))
        targets = s1.reconstruct_marker_targets(
            rec[0], clip_img[0], stats, jnp.asarray(aux["rot_0_pivot"][i]))
        gender = "male" if aux["gender"][i] == 1 else "female"
        return gender, targets, contact, jnp.asarray(init72)

    indices = list(range(args.start, min(args.end, len(clips)), args.step))
    if args.clip_batch <= 1:
        for i in indices:
            gender, targets, contact, init72 = prepare_clip(i)
            fitted, _ = fitters[gender](targets, contact, init72)
            np.save(os.path.join(save_folder,
                                 f"body_params_opt_clip_{i}.npy"),
                    np.asarray(fitted))
            print(f"[clip {i}] refined ({fitted.shape[0]} frames)")
    else:
        # corpus layout: vmapped fits over clip batches, grouped by gender
        fitters_b = {g: s2.make_temporal_fitter_batched(
            m, vposer_params, enc, smooth_stats, ids67, ids81, feet,
            args.num_fit_steps, weights) for g, m in models.items()}
        # group by (gender, T): stacking requires shape-uniform batches,
        # and mixing frame counts would retrace the compiled fitter
        by_group = {}
        for i in indices:
            gender, targets, contact, init72 = prepare_clip(i)
            by_group.setdefault((gender, targets.shape[0]), []).append(
                (i, targets, contact, init72))
        for (gender, _T), items in by_group.items():
            for k in range(0, len(items), args.clip_batch):
                chunk = items[k:k + args.clip_batch]
                # pad the last chunk to the compiled batch size
                pad = args.clip_batch - len(chunk)
                stack = lambda xs: jnp.stack(xs + [xs[-1]] * pad)  # noqa: E731
                fitted, _ = fitters_b[gender](
                    stack([c[1] for c in chunk]),
                    stack([c[2] for c in chunk]),
                    stack([c[3] for c in chunk]))
                for (i, *_), x72 in zip(chunk, np.asarray(fitted)):
                    np.save(os.path.join(
                        save_folder, f"body_params_opt_clip_{i}.npy"), x72)
                print(f"[clips {[c[0] for c in chunk]}] refined "
                      f"(batch of {len(chunk)})")


if __name__ == "__main__":
    main()
