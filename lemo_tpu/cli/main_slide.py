"""PROX sliding-window fitting CLI (reference temp_prox/main_slide.py).

Usage mirrors the reference:
  python -m lemo_tpu.cli.main_slide --config cfg_files/PROXD_temp_S2.yaml \
      --recording_dir /path/to/PROX/recordings/N3OpenArea_00157_01
"""

from __future__ import annotations

import sys


def main(argv=None):
    from lemo_tpu.config import parse_config
    from lemo_tpu.fitting.prox.driver import run_prox_fitting
    from lemo_tpu.utils.compile_cache import enable_persistent_cache

    # recordings with the same window shape reuse each other's XLA
    # compiles (30-60 s each) across processes
    enable_persistent_cache()
    cfg = parse_config(argv)
    if not cfg.recording_dir:
        print("error: --recording_dir is required", file=sys.stderr)
        sys.exit(2)
    return run_prox_fitting(cfg)


if __name__ == "__main__":
    main()
