"""YAML-over-CLI configuration (the temp_prox/cmd_parser.py equivalent)."""

from lemo_tpu.config.prox_config import ProxConfig, parse_config  # noqa: F401
