"""Command-line entry points mirroring the reference's public scripts:

  python -m lemo_tpu.cli.train_smooth_prior   (train_smooth_prior.py)
  python -m lemo_tpu.cli.train_infill_prior   (train_infill_prior.py)
  python -m lemo_tpu.cli.opt_amass_perframe   (opt_amass_perframe.py)
  python -m lemo_tpu.cli.opt_amass_temp       (opt_amass_temp.py)
  python -m lemo_tpu.cli.main_slide           (temp_prox/main_slide.py)
  python -m lemo_tpu.cli.test_smooth_prior    (test_smooth_prior.py)
  python -m lemo_tpu.cli.vis_opt_amass        (vis_opt_amass.py)
"""
