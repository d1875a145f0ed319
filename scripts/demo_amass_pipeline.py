"""End-to-end AMASS pipeline walkthrough through the CLIs:

  1. generate synthetic AMASS + SMPL-X assets
  2. train the smoothness prior (briefly)
  3. train the infill prior (briefly)
  4. Stage-1 per-frame fitting (masked infill -> per-frame fit)
  5. Stage-2 temporal refinement (smoothness prior + friction)
  6. render the result

This is the reference's full AMASS workflow (train_*_prior.py ->
opt_amass_perframe.py -> opt_amass_temp.py -> vis_opt_amass.py) driven
exactly as a user would drive it, on synthetic stand-ins for the licensed
data. Prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from lemo_tpu.testing.synthetic import (write_amass_dataset,
                                            write_smplx_model_dir)

    t0 = time.time()
    work = tempfile.mkdtemp(prefix="amass_demo_")
    os.chdir(work)  # stats/ and runs/ paths are relative, like the reference

    amass_dir = os.path.join(work, "amass")
    write_amass_dataset(amass_dir, "TotalCapture", num_subjects=1,
                        seqs_per_subject=2, num_frames=480, fps=60)
    for ds in ("HumanEva", "ACCAD"):
        write_amass_dataset(amass_dir, ds, num_subjects=1,
                            seqs_per_subject=2, num_frames=480, fps=60)
    body_model_path = os.path.join(work, "body_models")
    write_smplx_model_dir(body_model_path)

    from lemo_tpu.cli import train_infill_prior, train_smooth_prior
    from lemo_tpu.cli import opt_amass_perframe, opt_amass_temp
    from lemo_tpu.data import amass as amass_mod

    # patch the train-dataset lists to the synthetic ones
    amass_mod.AMASS_TRAIN_DATASETS = ["HumanEva", "ACCAD"]
    amass_mod.AMASS_TEST_DATASETS = ["TotalCapture"]

    print("== training smoothness prior ==", file=sys.stderr)
    train_smooth_prior.main([
        "--amass_dir", amass_dir, "--body_model_path", body_model_path,
        "--save_dir", os.path.join(work, "runs"),
        "--batch_size", "4", "--num_steps", "30", "--log_step", "10",
        "--save_step", "10", "--with_hand", "True"])
    runs = sorted(os.listdir(os.path.join(work, "runs")))
    enc_path = os.path.join(work, "runs", runs[-1], "Enc_last_model.npz")

    print("== training infill prior ==", file=sys.stderr)
    train_infill_prior.main([
        "--amass_dir", amass_dir, "--body_model_path", body_model_path,
        "--save_dir", os.path.join(work, "runs_infill"),
        "--batch_size", "4", "--num_steps", "30", "--log_step", "10",
        "--save_step", "10", "--mask_markers_dir", "/nonexistent"])
    runs_i = sorted(os.listdir(os.path.join(work, "runs_infill")))
    ae_path = os.path.join(work, "runs_infill", runs_i[-1],
                           "AE_last_model.npz")

    print("== Stage-1 per-frame fitting ==", file=sys.stderr)
    opt_amass_perframe.main([
        "--amass_dir", amass_dir, "--body_model_path", body_model_path,
        "--dataset_name", "TotalCapture", "--start", "0", "--end", "1",
        "--step", "1", "--infill_model_path", ae_path,
        "--save_dir", os.path.join(work, "res_perframe"),
        "--num_fit_steps", "60",
        "--stats_path",
        "preprocess_stats/preprocess_stats_infill_local_markers_4chan.npz"])
    s1_out = np.load(os.path.join(work, "res_perframe", "TotalCapture",
                                  "body_params_opt_clip_0.npy"))

    print("== Stage-2 temporal refinement ==", file=sys.stderr)
    opt_amass_temp.main([
        "--amass_dir", amass_dir, "--body_model_path", body_model_path,
        "--dataset_name", "TotalCapture", "--start", "0", "--end", "1",
        "--step", "1", "--infill_model_path", ae_path,
        "--smooth_model_path", enc_path,
        "--perframe_res_dir", os.path.join(work, "res_perframe"),
        "--save_dir", os.path.join(work, "res_temp"),
        "--num_fit_steps", "40",
        "--stats_path",
        "preprocess_stats/preprocess_stats_infill_local_markers_4chan.npz",
        "--smooth_stats_path",
        "preprocess_stats/"
        "preprocess_stats_smooth_withHand_global_markers.npz"])
    s2_out = np.load(os.path.join(work, "res_temp", "TotalCapture",
                                  "body_params_opt_clip_0.npy"))
    contact = np.load(os.path.join(work, "res_temp", "TotalCapture",
                                   "contact_lbl_rec_clip_0.npy"))

    print(json.dumps({
        "metric": "amass_pipeline_e2e_wallclock_s",
        "value": round(time.time() - t0, 1),
        "unit": "s",
        "detail": {
            "stage1_shape": list(s1_out.shape),
            "stage2_shape": list(s2_out.shape),
            "contact_shape": list(contact.shape),
            "stage1_finite": bool(np.isfinite(s1_out).all()),
            "stage2_finite": bool(np.isfinite(s2_out).all()),
            "workdir": work,
        },
    }))


if __name__ == "__main__":
    main()
