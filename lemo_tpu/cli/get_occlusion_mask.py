"""Generate per-frame marker occlusion masks for a PROX recording
(reference utils/get_occlusion_mask.py surface): given fitted body pkls
and the scene, mark markers whose projected depth lies behind the scene.

The reference renders scene depth with pyrender; here the scene's point
cloud (sampled from the scene mesh or SDF surface) is splatted into a
z-buffer on device (lemo_tpu.utils.occlusion_mask).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fitting_dir", type=str, required=True,
                   help="PROXD-style folder with results/<frame>/000.pkl")
    p.add_argument("--recording_dir", type=str, required=True)
    p.add_argument("--model_folder", type=str, required=True)
    p.add_argument("--gender", type=str, default="male")
    p.add_argument("--scene_points", type=str, default=None,
                   help="npy [N,3] scene points in world coords; defaults "
                        "to SDF zero-crossing samples")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--margin", type=float, default=0.1)
    return p


def scene_points_from_sdf(sdf, grid_min, grid_max, thresh=0.02,
                          max_points=200000):
    """Sample near-surface points of the scene from its SDF grid."""
    D = sdf.shape[0]
    idx = np.argwhere(np.abs(sdf) < thresh)
    if len(idx) > max_points:
        pick = np.random.RandomState(0).choice(len(idx), max_points,
                                               replace=False)
        idx = idx[pick]
    cell = (grid_max - grid_min) / D
    return grid_min + (idx + 0.5) * cell


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.prox import ProxRecording, read_prox_pkl
    from lemo_tpu.utils.occlusion_mask import marker_occlusion_mask

    rec = ProxRecording.from_recording_dir(args.recording_dir)
    R, t = rec.load_cam2world()

    if args.scene_points:
        pts_world = np.load(args.scene_points)
    else:
        sdf, lo, hi, _ = rec.load_sdf()
        pts_world = scene_points_from_sdf(sdf, lo, hi)
    # world -> camera: x_c = R^T (x_w - t)
    pts_cam = (pts_world - t) @ R

    from lemo_tpu.body_model.smplx import find_smplx_npz

    model = load_model(find_smplx_npz(args.model_folder, args.gender),
                       gender=args.gender, use_pca=True, num_pca_comps=12)
    fwd = jax.jit(make_forward_fn(model))
    ids = marker_indices(False, num_verts=model.num_verts)

    res_dir = osp.join(args.fitting_dir, "results")
    frames = sorted(os.listdir(res_dir))
    records = [read_prox_pkl(osp.join(res_dir, fn, "000.pkl"))
               for fn in frames]
    params = model.zero_params(len(records))
    for k in list(params.keys()) + ["body_pose"]:
        if k in records[0]:
            params[k] = jnp.asarray(np.stack([r[k] for r in records]))
    out = fwd(params, model.consts)
    markers_cam = out["vertices"][:, jnp.asarray(ids), :]

    mask = marker_occlusion_mask(
        markers_cam, jnp.asarray(pts_cam, jnp.float32),
        fx=1060.53, fy=1060.38, cx=951.30, cy=536.77, margin=args.margin)
    os.makedirs(args.out_dir, exist_ok=True)
    path = osp.join(args.out_dir, "mask_markers.npy")
    np.save(path, np.asarray(mask, np.float32))
    occluded = float(1.0 - np.asarray(mask).mean())
    print(f"saved {path} ({len(frames)} frames, "
          f"{occluded * 100:.1f}% marker-frames occluded)")


if __name__ == "__main__":
    main()
