"""Train and ship the motion-infill AE asset.

The reference's pretrained infill AE blob is missing from its distribution
(`runs/59547/AE_last_model.pkl` is in `.MISSING_LARGE_BLOBS`); only the
training recipe survives (`runs/59547/params.json`: lr 1e-4, batch 120,
4-chan local-marker images, 10/10/1 loss weights). This script reproduces
that recipe on a synthetic AMASS corpus and commits the result so the S3
pipeline (`cfg_files/PROXD_temp_S3.yaml`) runs with no external assets:

    lemo_tpu/assets/infill_ae.npz            AE weights (our npz layout)
    lemo_tpu/assets/infill_stats.npz         Local4ChanStats for the AE
    lemo_tpu/assets/infill_ae_losscurve.json loss history

Swap in a real-AMASS-trained model by pointing cfg.AE_infill_path at it;
the shipped asset is the no-extra-assets default, trained on synthetic
motion (its marker statistics, not AMASS's — retrain on licensed AMASS for
paper-grade S3 results, same script with --amass_dir).

Run: python scripts/train_infill_asset.py [--num_steps 3000]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ASSETS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "lemo_tpu", "assets")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_steps", type=int, default=3000)
    ap.add_argument("--batch_size", type=int, default=120)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_datasets", type=int, default=6,
                    help="synthetic corpus size (datasets of ~90 clips)")
    ap.add_argument("--holdout_frac", type=float, default=0.1,
                    help="fraction of clips held out for early stopping "
                         "(0 disables; the round-3 asset trained without "
                         "a holdout and overfit its 540-clip corpus)")
    ap.add_argument("--amass_dir", default=None,
                    help="real AMASS root; synthetic corpus if omitted")
    ap.add_argument("--out_dir", default=ASSETS)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — useful when "
                         "the TPU tunnel is busy/draining")
    ap.add_argument("--images_cache", default=None,
                    help="npz path for the prepared corpus: written after "
                         "prep, reused when present — lets prep run on "
                         "CPU and training on TPU in separate processes")
    ap.add_argument("--prep_only", action="store_true",
                    help="stop after writing --images_cache")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from lemo_tpu.data import amass
    from lemo_tpu.data.stats import Local4ChanStats
    from lemo_tpu.priors.conv_ae import save_state_dict
    from lemo_tpu.train import infill as ti
    from lemo_tpu.testing.synthetic import (write_amass_dataset,
                                            write_smplx_model_dir)

    t0 = time.time()
    if args.images_cache and osp.exists(args.images_cache):
        z = np.load(args.images_cache)
        images, n_clips = z["images"], int(z["n_clips"])
        print(f"[INFO] loaded cached corpus {images.shape} "
              f"({n_clips} clips)", flush=True)
    else:
        if args.amass_dir:
            amass_dir = args.amass_dir
            datasets = amass.AMASS_TRAIN_DATASETS
            model_dir = args.amass_dir  # caller supplies a real model too
        else:
            tmp = tempfile.mkdtemp()
            amass_dir = osp.join(tmp, "amass")
            for k in range(args.num_datasets):
                write_amass_dataset(amass_dir,
                                    dataset_name=f"Synth{k:02d}",
                                    num_subjects=2, seqs_per_subject=3,
                                    num_frames=3600, fps=60,
                                    seed=args.seed + 997 * k)
            datasets = [f"Synth{k:02d}" for k in range(args.num_datasets)]
            model_dir = write_smplx_model_dir(osp.join(tmp, "models"))

        builder = amass.AmassRepresentationBuilder(model_dir,
                                                   with_hand=False)
        clips = amass.scan_amass(datasets, amass_dir, clip_seconds=4)
        print(f"[INFO] {len(clips)} clips", flush=True)
        images, _ = amass.build_dataset(builder, clips,
                                        "local_markers_4chan",
                                        clip_seconds=4)
        images = np.asarray(images)
        n_clips = len(clips)
        if args.images_cache:
            np.savez_compressed(args.images_cache, images=images,
                                n_clips=n_clips)
            print(f"[INFO] corpus cached -> {args.images_cache}",
                  flush=True)
    if args.prep_only:
        return 0
    import jax

    # train/holdout split + early stopping on held-out MASKED loss: the
    # asset's job is masked-marker infilling on unseen motion, so model
    # selection must look at exactly that (the round-3 asset kept the
    # final step of a 667-epoch run over 540 clips and overfit badly —
    # held-out occluded error landed WORSE than a zero-velocity fill).
    rng = np.random.RandomState(args.seed + 12345)
    n_hold = int(len(images) * args.holdout_frac)
    perm = rng.permutation(len(images))
    hold_idx, train_idx = perm[:n_hold], perm[n_hold:]
    images_train = images[train_idx]
    stats = Local4ChanStats.compute(images_train)
    images_n = np.asarray(stats.normalize(jnp.asarray(images_train)))

    cfg = ti.InfillTrainConfig(lr=args.lr, batch_size=args.batch_size)
    best = {"loss": np.inf, "step": 0, "params": None}
    eval_cb = None
    if n_hold:
        _, eval_step, _ = ti.make_train_step(cfg)
        hold = np.asarray(stats.normalize(jnp.asarray(images[hold_idx])))
        hold_dev = jnp.asarray(hold.swapaxes(2, 3))        # [Nh, 4, d, T]
        hmask = ti.random_marker_mask(
            jax.random.PRNGKey(args.seed + 7), hold_dev.shape[0],
            hold_dev.shape[2], hold_dev.shape[3])

        def eval_cb(step, rec, params):
            m = eval_step(params, hold_dev, hmask)
            tot = float(cfg.weight_loss_rec_body * m["loss_rec_body"]
                        + cfg.weight_loss_rec_body_v * m["loss_rec_body_v"]
                        + cfg.weight_loss_rec_contact_lbl
                        * m["loss_rec_contact_lbl"])
            rec["holdout_total"] = tot
            rec["holdout_body"] = float(m["loss_rec_body"])
            if tot < best["loss"]:
                best.update(loss=tot, step=step,
                            params=jax.tree_util.tree_map(np.asarray,
                                                          params))
            print(f"[step {step}] train {rec['total']:.4f} holdout "
                  f"{tot:.4f} (best {best['loss']:.4f} @ {best['step']})",
                  flush=True)

    params, history = ti.train(images_n, cfg, args.num_steps,
                               seed=args.seed, log_every=200,
                               callback=eval_cb)
    if best["params"] is not None:
        params = best["params"]
        print(f"[INFO] early-stopped: kept step {best['step']} "
              f"(holdout {best['loss']:.4f})", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    save_state_dict(params, osp.join(args.out_dir, "infill_ae.npz"))
    stats.save(osp.join(args.out_dir, "infill_stats.npz"))
    with open(osp.join(args.out_dir, "infill_ae_losscurve.json"),
              "w") as fh:
        json.dump({"recipe": {"lr": args.lr,
                              "batch_size": args.batch_size,
                              "num_steps": args.num_steps,
                              "weights": [cfg.weight_loss_rec_body,
                                          cfg.weight_loss_rec_body_v,
                                          cfg.weight_loss_rec_contact_lbl],
                              "corpus": ("synthetic" if not args.amass_dir
                                         else args.amass_dir),
                              "clips": n_clips,
                              "holdout_clips": int(n_hold),
                              "early_stop_step": int(best["step"]),
                              "holdout_loss": (float(best["loss"])
                                               if n_hold else None)},
                   "history": history}, fh, indent=1)
    print(f"[DONE] {args.num_steps} steps in {time.time() - t0:.0f}s; "
          f"first/last logged loss "
          f"{history[0]['total']:.4f} / {history[-1]['total']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
