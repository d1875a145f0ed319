"""Geometry and signal kernels (pure JAX / Pallas)."""

from lemo_tpu.ops.rotations import (  # noqa: F401
    aa_to_matrot,
    matrot_to_aa,
    matrot_to_quat,
    quat_to_aa,
    rot6d_to_matrot,
    matrot_to_rot6d,
    aa_to_rot6d,
    rot6d_to_aa,
    transform_mat,
)
