"""Render PROX fitting results (reference temp_prox/renderer.py +
viz/viz_fitting.py surface): load per-frame result pkls, rebuild the
bodies, and save (a) body-over-Color-frame overlay renders — the
reference's `<frame>_output.png` (renderer.py:60-140), via the built-in
software rasterizer — and (b) a marker animation sheet (headless
matplotlib)."""

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
    p.add_argument("--recording_dir", type=str, default=None,
                   help="PROX recording dir (for Color frames); overlay "
                        "renders are skipped when absent")
    p.add_argument("--gender", type=str, default="male")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--count", type=int, default=8)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--vposer_ckpt", type=str, default=None)
    p.add_argument("--flip", type=lambda x: x.lower() in ("true", "1"),
                   default=True,
                   help="flip Color frames horizontally like the "
                        "reference renderer (PROX fits mirrored frames)")
    p.add_argument("--body_color", type=str, default="pink",
                   choices=["pink", "white"])
    p.add_argument("--rendering_mode", type=str, default="body",
                   choices=["body", "3d", "both"],
                   help="'body' = body-over-Color overlays "
                        "(<frame>_output.png); '3d' = body inside the "
                        "scene mesh (<frame>_scene.png, reference "
                        "renderer.py rendering_mode='3d'); 'both' = both")
    p.add_argument("--fx", type=float, default=1060.53)
    p.add_argument("--fy", type=float, default=1060.38)
    p.add_argument("--cx", type=float, default=951.30)
    p.add_argument("--cy", type=float, default=536.77)
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

    # body-over-Color overlay renders (renderer.py:110-133 semantics)
    if args.recording_dir and args.rendering_mode in ("body", "both"):
        import cv2

        from lemo_tpu.utils.raster import PINK, render_body_overlay

        color = PINK if args.body_color == "pink" else (0.7, 0.7, 0.7)
        color_dir = osp.join(args.recording_dir, "Color")
        n_saved = 0
        for i, fn in enumerate(frames):
            img_path = None
            for ext in (".jpg", ".png"):
                cand = osp.join(color_dir, fn + ext)
                if osp.exists(cand):
                    img_path = cand
                    break
            if img_path is None:
                continue
            img = cv2.imread(img_path)[:, :, ::-1]
            if args.flip:
                img = img[:, ::-1]
            over = render_body_overlay(verts[i], np.asarray(model.faces),
                                       img, args.fx, args.fy,
                                       args.cx, args.cy, color=color)
            out_path = osp.join(out_dir, fn + "_output.png")
            cv2.imwrite(out_path, over[:, :, ::-1])
            n_saved += 1
        print(f"saved {n_saved} overlay renders to {out_dir}")

    # body-in-scene renders (renderer.py:134-151 rendering_mode='3d':
    # scene mesh transformed into camera coords by inv(cam2world), body
    # mesh added, rendered from the fitting camera)
    if args.recording_dir and args.rendering_mode in ("3d", "both"):
        import cv2

        from lemo_tpu.data.prox import ProxRecording
        from lemo_tpu.utils.raster import PINK, render_body_in_scene

        color = PINK if args.body_color == "pink" else (0.7, 0.7, 0.7)
        rec = ProxRecording.from_recording_dir(args.recording_dir)
        scene_v, scene_f = rec.load_scene_mesh_full()
        if scene_f is None:
            print("scene ply has no faces; skipping 3d renders")
        else:
            Rw, tw = rec.load_cam2world()
            scene_cam = (scene_v - tw) @ Rw  # world -> camera
            H, W = int(round(2 * args.cy)), int(round(2 * args.cx))
            n_saved = 0
            for i, fn in enumerate(frames):
                img = render_body_in_scene(
                    verts[i], np.asarray(model.faces), scene_cam, scene_f,
                    W, H, args.fx, args.fy, args.cx, args.cy,
                    body_color=color)
                cv2.imwrite(osp.join(out_dir, fn + "_scene.png"),
                            img[:, :, ::-1])
                n_saved += 1
            print(f"saved {n_saved} body-in-scene renders to {out_dir}")


if __name__ == "__main__":
    main()
