"""Quantify the shipped motion-infill prior (VERDICT r3 ask #5).

`lemo_tpu/assets/infill_ae.npz` is a synthetic-corpus retrain (the
reference's own pretrained blob is missing from its distribution); until
now only a loss curve shipped, so the S3 infill term ran on a prior of
unknown strength. This harness measures what the prior is FOR: masked-
marker reconstruction. On held-out clips (fresh generator seeds, never
seen in training) it occludes random markers over contiguous intervals —
the PROX occlusion shape — runs the production infill pre-pass
(fitting/prox/infill_prepass.py: Holden image -> 60-step self-supervised
AE finetune -> decode -> world-space integration) and reports the
world-space error of the reconstructed OCCLUDED markers against ground
truth, next to two baselines:

  * zero-velocity: hold each occluded marker at its last visible
    position (first visible, for leading occlusions) — the "no prior"
    strategy;
  * no-finetune: the same AE decode without the 60-step per-clip
    finetune (isolates what the self-supervised step buys).

Writes lemo_tpu/assets/infill_ae_eval.json (committed next to the loss
curve) and prints a summary. Run:

    python scripts/eval_infill_asset.py [--num_clips 16] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ASSETS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "lemo_tpu", "assets")


def _zero_velocity_fill(markers: np.ndarray, mask: np.ndarray):
    """[T,67,3] + visibility [T,67] -> held-last-visible trajectories."""
    T, M, _ = markers.shape
    out = markers.copy()
    for m in range(M):
        vis = np.flatnonzero(mask[:, m] > 0)
        if len(vis) == 0:
            out[:, m] = markers[:, m].mean(axis=0)
            continue
        # index of the nearest visible frame at or before t (first
        # visible frame for leading occlusions)
        idx = np.searchsorted(vis, np.arange(T), side="right") - 1
        idx = np.clip(idx, 0, len(vis) - 1)
        out[:, m] = markers[vis[idx], m]
    return out


def _occlusion_mask(T: int, M: int, rng, n_occ: int = 8,
                    min_frac: float = 0.3, max_frac: float = 0.7):
    """PROX-shaped occlusions: n_occ random markers each hidden over one
    contiguous interval."""
    mask = np.ones((T, M), np.float32)
    for m in rng.choice(M, size=n_occ, replace=False):
        L = int(T * rng.uniform(min_frac, max_frac))
        s = rng.randint(0, T - L)
        mask[s:s + L, m] = 0.0
    return mask


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_clips", type=int, default=16)
    ap.add_argument("--n_occ", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--asset", default=osp.join(ASSETS, "infill_ae.npz"),
                    help="AE weights npz to evaluate")
    ap.add_argument("--out", default=osp.join(ASSETS,
                                              "infill_ae_eval.json"))
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from lemo_tpu.data import amass
    from lemo_tpu.data.stats import Local4ChanStats
    from lemo_tpu.fitting.prox.infill_prepass import run_infill_prepass
    from lemo_tpu.priors.conv_ae import load_state_dict_npz
    from lemo_tpu.testing.synthetic import (write_amass_dataset,
                                            write_smplx_model_dir)

    ae = load_state_dict_npz(args.asset)
    stats = Local4ChanStats.load(osp.join(ASSETS, "infill_stats.npz"))

    # held-out corpus: seeds disjoint from the training generator's
    # (train_infill_asset.py uses seed + 997*k for k<num_datasets; the
    # offsets here clear that range for any plausible corpus size)
    tmp = tempfile.mkdtemp()
    amass_dir = osp.join(tmp, "amass")
    datasets = []
    for k in range(2):
        name = f"Hold{k:02d}"
        write_amass_dataset(amass_dir, dataset_name=name, num_subjects=2,
                            seqs_per_subject=3, num_frames=3600, fps=60,
                            seed=args.seed + 50021 + 7919 * k)
        datasets.append(name)
    model_dir = write_smplx_model_dir(osp.join(tmp, "models"))
    builder = amass.AmassRepresentationBuilder(model_dir, with_hand=False)
    clips = amass.scan_amass(datasets, amass_dir, clip_seconds=4)
    clips = clips[:args.num_clips]
    print(f"[INFO] {len(clips)} held-out clips", flush=True)

    rng = np.random.RandomState(args.seed)
    rows = []
    for ci, clip in enumerate(clips):
        markers, joints = builder.markers_and_joints(clip, 120)
        markers = np.asarray(markers)
        joints25 = jnp.asarray(joints[:, :25])
        T, M = markers.shape[0], markers.shape[1]
        mask = _occlusion_mask(T, M, rng, n_occ=args.n_occ)
        occ = mask[:T - 1] == 0          # prepass targets are [T-1, ...]

        res = run_infill_prepass(ae, jnp.asarray(markers), joints25,
                                 jnp.asarray(mask), stats)
        res0 = run_infill_prepass(ae, jnp.asarray(markers), joints25,
                                  jnp.asarray(mask), stats,
                                  finetune_steps=0)
        # decode-path floor: NOTHING occluded — the reconstruction error
        # of the full image -> AE -> world pipeline on fully visible
        # input bounds what any occlusion fill through it can achieve
        res_floor = run_infill_prepass(
            ae, jnp.asarray(markers), joints25,
            jnp.asarray(np.ones_like(mask)), stats)
        zv = _zero_velocity_fill(markers, mask)[:T - 1]

        gt = markers[:T - 1]
        def occ_err(pred):
            e = np.linalg.norm(np.asarray(pred) - gt, axis=-1)
            return e[occ]

        e_ae = occ_err(res.targets_world)
        e_ae0 = occ_err(res0.targets_world)
        e_zv = occ_err(zv)
        e_floor = np.linalg.norm(
            np.asarray(res_floor.targets_world) - gt, axis=-1)
        rows.append({"clip": ci,
                     "occluded_entries": int(occ.sum()),
                     "ae_mean_mm": float(e_ae.mean() * 1000),
                     "ae_p95_mm": float(np.percentile(e_ae, 95) * 1000),
                     "ae_nofinetune_mean_mm": float(e_ae0.mean() * 1000),
                     "decode_floor_mean_mm": float(e_floor.mean() * 1000),
                     "zerovel_mean_mm": float(e_zv.mean() * 1000),
                     "zerovel_p95_mm": float(
                         np.percentile(e_zv, 95) * 1000)})
        print(f"  clip {ci}: AE {rows[-1]['ae_mean_mm']:.1f} mm "
              f"(no-ft {rows[-1]['ae_nofinetune_mean_mm']:.1f}, floor "
              f"{rows[-1]['decode_floor_mean_mm']:.1f}) vs "
              f"zero-vel {rows[-1]['zerovel_mean_mm']:.1f} mm", flush=True)

    agg = {k: float(np.mean([r[k] for r in rows]))
           for k in rows[0] if k.endswith("_mm")}
    out = {
        "protocol": {
            "asset": args.asset,
            "corpus": "held-out synthetic (fresh seeds, same generator "
                      "family as training)",
            "clips": len(rows),
            "frames_per_clip": 120,
            "occlusion": f"{args.n_occ} markers x contiguous 30-70% "
                         "intervals per clip",
            "metric": "world-space marker error on OCCLUDED entries, "
                      "production infill pre-pass "
                      "(60-step finetune + decode + reintegration)",
        },
        "aggregate_mm": agg,
        "per_clip": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[DONE] AE {agg['ae_mean_mm']:.1f} mm "
          f"(no-finetune {agg['ae_nofinetune_mean_mm']:.1f} mm, "
          f"decode floor {agg['decode_floor_mean_mm']:.1f} mm) vs "
          f"zero-velocity {agg['zerovel_mean_mm']:.1f} mm "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
