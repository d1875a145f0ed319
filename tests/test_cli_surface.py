"""CLI surface smoke tests: every entry point parses its reference flags."""

import pytest


def test_train_smooth_prior_flags():
    from lemo_tpu.cli.train_smooth_prior import build_parser

    a = build_parser().parse_args(
        ["--amass_dir", "/x", "--body_model_path", "/y",
         "--batch_size", "60", "--lr", "0.0001", "--body_mode",
         "global_markers", "--with_hand", "True", "--downsample", "False",
         "--z_channel", "64", "--weight_loss_z_smooth", "1000"])
    assert a.batch_size == 60 and a.z_channel == 64
    assert a.with_hand is True and a.downsample is False


def test_train_infill_prior_flags():
    from lemo_tpu.cli.train_infill_prior import build_parser

    a = build_parser().parse_args(
        ["--amass_dir", "/x", "--body_model_path", "/y",
         "--body_mode", "local_markers_4chan", "--conv_k", "3"])
    assert a.body_mode == "local_markers_4chan"


def test_opt_amass_perframe_flags():
    from lemo_tpu.cli.opt_amass_perframe import build_parser

    a = build_parser().parse_args(
        ["--amass_dir", "/x", "--body_model_path", "/y",
         "--dataset_name", "TotalCapture", "--start", "0", "--end", "100",
         "--step", "20", "--weight_loss_vposer", "0.02",
         "--fit_mode", "sequential"])
    assert a.step == 20 and a.fit_mode == "sequential"


def test_opt_amass_temp_flags():
    from lemo_tpu.cli.opt_amass_temp import build_parser

    a = build_parser().parse_args(
        ["--amass_dir", "/x", "--body_model_path", "/y",
         "--weight_loss_smooth", "1e6", "--weight_loss_contact_vel", "0.03"])
    assert a.weight_loss_smooth == 1e6


def test_vis_and_eval_flags():
    from lemo_tpu.cli.test_smooth_prior import build_parser as p1
    from lemo_tpu.cli.vis_opt_amass import build_parser as p2
    from lemo_tpu.cli.render_fitting import build_parser as p3

    p1().parse_args(["--amass_dir", "/x", "--body_model_path", "/y",
                     "--enc_path", "/e", "--dec_path", "/d",
                     "--stats_path", "/s"])
    p2().parse_args(["--body_model_path", "/y", "--clip_id", "0"])
    p3().parse_args(["--fitting_dir", "/f", "--model_folder", "/m"])


def test_main_slide_reference_yaml():
    """The shipped S2/S3 YAMLs drive the CLI config path unchanged."""
    import os
    from lemo_tpu.config import parse_config

    for cfg_name in ("PROXD_temp_S2.yaml", "PROXD_temp_S3.yaml"):
        path = f"/root/reference/cfg_files/{cfg_name}"
        if not os.path.exists(path):
            pytest.skip("reference configs absent")
        cfg = parse_config(["--config", path])
        assert cfg.maxiters == 900 and cfg.batch_size == 100
        assert cfg.optim_type == "adam"
    s3 = parse_config(["--config",
                       "/root/reference/cfg_files/PROXD_temp_S3.yaml"])
    assert s3.use_motion_infill_prior is True


def test_shipped_cfg_presets_parse():
    import os
    from lemo_tpu.config import parse_config

    base = os.path.join(os.path.dirname(__file__), "..", "cfg_files")
    for name, infill, cand in [
        ("PROXD_temp_S2.yaml", False, 0),
        ("PROXD_temp_S3.yaml", True, 0),
        ("PROXD_temp_S2_tpu_fast.yaml", False, 2048),
        ("PROXD_temp_S3_tpu_fast.yaml", True, 2048),
    ]:
        cfg = parse_config(["--config", os.path.join(base, name),
                            "--recording_dir", "/tmp/x",
                            "--output_folder", "/tmp/y"])
        assert cfg.maxiters == 900 and cfg.batch_size == 100
        assert cfg.use_motion_infill_prior == infill
        assert cfg.sdf_candidates == cand
        w = cfg.stage_weights(0)
        assert w["motion_smooth"] == 1e8
        assert w["friction_normal"] == (1.0 if infill else 10.0)
