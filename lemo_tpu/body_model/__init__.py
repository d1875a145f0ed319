"""SMPL-family body models as pure JAX functions."""

from lemo_tpu.body_model.smplx import (  # noqa: F401
    SmplxConfig,
    SmplxModel,
    load_model,
    make_forward_fn,
    smplx_forward,
)
