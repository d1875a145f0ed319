"""Render PROX fitting results (reference temp_prox/renderer.py +
viz/viz_fitting.py surface): load per-frame result pkls, rebuild the
bodies, and save overlay/skeleton images (headless matplotlib backend)."""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fitting_dir", type=str, required=True,
                   help="output folder of main_slide (contains results/)")
    p.add_argument("--model_folder", type=str, required=True)
    p.add_argument("--gender", type=str, default="male")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--count", type=int, default=8)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--vposer_ckpt", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.prox import read_prox_pkl
    from lemo_tpu.utils.viz import save_marker_animation

    res_dir = osp.join(args.fitting_dir, "results")
    frames = sorted(os.listdir(res_dir))[args.start::args.step][: args.count]
    if not frames:
        print("no result pkls found")
        return

    from lemo_tpu.body_model.smplx import find_smplx_npz

    model = load_model(find_smplx_npz(args.model_folder, args.gender),
                       gender=args.gender, use_pca=True, num_pca_comps=12)
    fwd = jax.jit(make_forward_fn(model))

    records = [read_prox_pkl(osp.join(res_dir, fn, "000.pkl"))
               for fn in frames]
    params = model.zero_params(len(records))
    for k in ("transl", "global_orient", "betas", "left_hand_pose",
              "right_hand_pose", "jaw_pose", "leye_pose", "reye_pose",
              "expression", "body_pose"):
        if k in records[0] and k in params or k == "body_pose":
            stacked = np.stack([r[k] for r in records])
            params[k] = jnp.asarray(stacked)
    out = fwd(params, model.consts)
    verts = np.asarray(out["vertices"])
    ids = marker_indices(False, num_verts=model.num_verts)
    out_dir = args.out_dir or osp.join(args.fitting_dir, "renderings")
    os.makedirs(out_dir, exist_ok=True)
    path = save_marker_animation(verts[:, ids, :],
                                 osp.join(out_dir, "fitting_frames.png"),
                                 stride=1, max_frames=len(frames))
    print(f"saved {path}")


if __name__ == "__main__":
    main()
