"""Firing-pair realism report for the self-intersection term (VERDICT r4
ask #7): how many faces sit on FIRING energy pairs on a smooth
articulated body at rest vs articulated poses, with and without the
part-pair ignore filter — the evidence base for sizing coll_candidates
(and what the auto-K rule picks) at production scale.

The reference evaluates its cone energy only on BVH-reported
intersecting triangle pairs with FilterFaces part filtering
(fit_temp_loadprox_slide.py:319-344); our two-way plane-straddle gate is
a necessary-condition stand-in, so some straddling-but-not-intersecting
pairs survive (documented in ops/intersection.py). This report measures
that overhang on the tube-surface body with an SMPL-X-granularity part
segmentation (per-bone parts, fingers collapsed to wrists, parent-part
pairs ignored + the reference config's ign_part_pairs).

Run (TPU):  python scripts/interpen_realism_report.py
CPU smoke:  python scripts/interpen_realism_report.py --platform cpu \
                --small
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true",
                    help="536-vert mesh for a CPU smoke run")
    ap.add_argument("--margin", type=float, default=0.05)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.ops.intersection import (batched_self_intersection,
                                           build_face_filter,
                                           intersection_candidate_scores)
    from lemo_tpu.testing.synthetic import (compact_part_table,
                                            synthetic_smplx_npz)

    print("device:", jax.devices()[0], flush=True)
    md = synthetic_smplx_npz(full_size=not args.small, smooth_surface=True)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    faces = jnp.asarray(np.asarray(md["f"], np.int32))
    F = int(faces.shape[0])

    part_of_joint, part_parent = compact_part_table(55)
    fsegm = part_of_joint[md["face_parts"]]
    ref_pairs = ["9,16", "9,17", "6,16", "6,17", "1,2", "12,22"]
    pairs = [f"{part_of_joint[int(a)]},{part_of_joint[int(b)]}"
             for a, b in (p.split(",") for p in ref_pairs)]
    filt = build_face_filter(np.asarray(md["f"]), faces_segm=fsegm,
                             ign_part_pairs=pairs,
                             faces_parents=part_parent[fsegm])
    segm = jnp.asarray(filt["segm"])
    tab = jnp.asarray(filt["ign_table"])

    fwd = jax.jit(make_forward_fn(model))

    def verts_at(pose_scale: float, seed: int = 0):
        p = dict(model.zero_params(1))
        if pose_scale > 0:
            p["body_pose"] = jnp.asarray(
                np.random.RandomState(seed).randn(1, 63) * pose_scale,
                jnp.float32)
        return fwd(p, model.consts)["vertices"][0]

    out = {"faces": F, "parts": int(fsegm.max()) + 1,
           "ignored_part_pairs": int(np.asarray(tab).sum()),
           "margin": args.margin, "device": str(jax.devices()[0])}
    poses = [("rest", 0.0), ("mild_contact", 0.35), ("articulated", 0.7)]
    for name, scale in poses:
        v = verts_at(scale)
        row = {}
        for fname, kw in (("no_filter", {}),
                          ("part_filter", {"segm": segm, "ign_table": tab})):
            score, counts = intersection_candidate_scores(
                v, faces, margin=args.margin, **kw)
            e = float(batched_self_intersection(v[None], faces, **kw)[0])
            n_active, n_within = int(counts[0]), int(counts[1])
            auto_K = min(F, -(-max(n_active, 1) // 1024) * 1024)
            row[fname] = {"n_active": n_active, "n_within": n_within,
                          "auto_K": auto_K, "energy": e}
        out[name] = row
        print(f"[{name:13s}] no_filter: active "
              f"{row['no_filter']['n_active']:6d} within "
              f"{row['no_filter']['n_within']:6d} E "
              f"{row['no_filter']['energy']:.3e} | part_filter: active "
              f"{row['part_filter']['n_active']:6d} within "
              f"{row['part_filter']['n_within']:6d} E "
              f"{row['part_filter']['energy']:.3e}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
