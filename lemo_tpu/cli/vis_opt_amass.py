"""Visualize fitted AMASS bodies + contact labels (reference
vis_opt_amass.py surface, headless matplotlib backend)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res_dir", type=str, default="res_opt_amass_temp")
    p.add_argument("--dataset_name", type=str, default="TotalCapture")
    p.add_argument("--body_model_path", type=str, required=True)
    p.add_argument("--clip_id", type=int, default=0)
    p.add_argument("--out", type=str, default="vis_opt_amass.png")
    p.add_argument("--vposer_ckpt", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn, vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.fitting import params as P
    from lemo_tpu.utils.viz import save_marker_animation

    folder = os.path.join(args.res_dir, args.dataset_name)
    params72 = np.load(os.path.join(
        folder, f"body_params_opt_clip_{args.clip_id}.npy"))
    contact = np.load(os.path.join(
        folder, f"contact_lbl_rec_clip_{args.clip_id}.npy"))
    genders = np.load(os.path.join(folder, "gender_list.npy"))
    gender = "male" if genders[args.clip_id] == 1 else "female"

    smplx_model_path = os.path.join(args.body_model_path, "smplx_model")
    if not os.path.isdir(smplx_model_path):
        smplx_model_path = args.body_model_path
    from lemo_tpu.body_model.smplx import find_smplx_npz

    model = load_model(find_smplx_npz(args.body_model_path, gender),
                       gender=gender, use_pca=True, num_pca_comps=12)
    vposer_params = vp.init_vposer(jax.random.PRNGKey(0))
    if args.vposer_ckpt:
        from lemo_tpu.priors.conv_ae import load_torch_state_dict

        vposer_params = load_torch_state_dict(args.vposer_ckpt)

    fwd = make_forward_fn(model)
    sp = P.smplx_params_from_72(jnp.asarray(params72), vposer_params)
    verts = np.asarray(fwd(sp, model.consts)["vertices"])
    ids = marker_indices(False, num_verts=model.num_verts)
    markers = verts[:, ids, :]
    out = save_marker_animation(markers, args.out, contact)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
