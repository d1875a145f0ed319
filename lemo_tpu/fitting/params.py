"""Body-parameter layouts used by the AMASS fitting pipelines.

The fitters carry a [T, 72] parameter row per frame:
``[transl(3) | global_orient aa(3) | betas(10) | vposer z(32) |
left_hand(12) | right_hand(12)]`` (utils/utils.py:141-169 and the
``body_params_opt_*`` npy outputs), optimized in a 75-d form with the
orientation as a continuous 6-D rotation (opt_amass_perframe.py:307-334).
"""

from __future__ import annotations

import jax.numpy as jnp

from lemo_tpu.body_model import vposer as vp
from lemo_tpu.ops.rotations import pack_params_6d, unpack_params_6d  # noqa: F401


def split72(x72: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """[T, 72] -> named parts."""
    return {
        "transl": x72[:, 0:3],
        "global_orient": x72[:, 3:6],
        "betas": x72[:, 6:16],
        "vposer_z": x72[:, 16:48],
        "left_hand_pose": x72[:, 48:60],
        "right_hand_pose": x72[:, 60:72],
    }


def join72(parts: dict[str, jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate(
        [parts["transl"], parts["global_orient"], parts["betas"],
         parts["vposer_z"], parts["left_hand_pose"],
         parts["right_hand_pose"]], axis=-1)


def smplx_params_from_72(x72: jnp.ndarray, vposer_params: dict,
                         num_expressions: int = 10) -> dict[str, jnp.ndarray]:
    """Decode a [T, 72] row into the SMPL-X parameter pytree (vposer z ->
    63-d body pose), zero face params — `gen_body_mesh_v1`
    (utils/utils.py:141-154) as a pure function.

    The body model must be configured with use_pca=True, num_pca_comps=12
    (the AMASS fitters' models, opt_amass_perframe.py:66-80).
    """
    T = x72.shape[0]
    parts = split72(x72)
    body_pose = vp.decode(vposer_params, parts["vposer_z"], "aa")  # [T, 63]
    zeros3 = jnp.zeros((T, 3), x72.dtype)
    return {
        "transl": parts["transl"],
        "global_orient": parts["global_orient"],
        "betas": parts["betas"],
        "body_pose": body_pose,
        "left_hand_pose": parts["left_hand_pose"],
        "right_hand_pose": parts["right_hand_pose"],
        "jaw_pose": zeros3,
        "leye_pose": zeros3,
        "reye_pose": zeros3,
        "expression": jnp.zeros((T, num_expressions), x72.dtype),
    }
