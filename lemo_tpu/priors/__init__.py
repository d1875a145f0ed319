"""Learned motion priors (convolutional AEs) as pure JAX functions."""

from lemo_tpu.priors.conv_ae import (  # noqa: F401
    infill_ae_forward,
    init_infill_ae,
    init_smooth_dec,
    init_smooth_enc,
    load_torch_state_dict,
    smooth_dec_forward,
    smooth_enc_forward,
)
