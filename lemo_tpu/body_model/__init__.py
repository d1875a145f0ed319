"""SMPL-family body models as pure JAX functions."""

from lemo_tpu.body_model.smplx import (  # noqa: F401
    SmplxModel,
    load_model,
    smplx_forward,
)
