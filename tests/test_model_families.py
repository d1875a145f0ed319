"""SMPL / SMPL-H / MANO model-family support (body_model.py:68-69 model
inference from posedirs width; parameter layouts per family)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(61)


@pytest.mark.parametrize("num_joints,expected_type,pose_dim", [
    (24, "smpl", 72), (52, "smplh", 156), (16, "mano", 48)])
def test_family_inference_and_forward(num_joints, expected_type, pose_dim):
    md = synthetic_smplx_npz(num_verts=200, num_joints=num_joints, seed=8)
    model = load_model(md, flat_hand_mean=True)
    assert model.config.model_type == expected_type
    fwd = make_forward_fn(model)
    params = model.zero_params(3)
    for k, v in params.items():
        if "pose" in k or "orient" in k:
            params[k] = jnp.asarray(RNG.randn(*v.shape) * 0.2, jnp.float32)
    out = fwd(params, model.consts)
    assert out["vertices"].shape == (3, 200, 3)
    assert out["full_pose"].shape == (3, pose_dim)
    assert np.isfinite(np.asarray(out["vertices"])).all()


def test_smpl_param_layout():
    md = synthetic_smplx_npz(num_verts=150, num_joints=24, seed=9)
    model = load_model(md)
    p = model.zero_params(1)
    assert p["body_pose"].shape == (1, 63)       # 21 joints
    assert p["left_hand_pose"].shape == (1, 3)   # wrists fold into pose
    assert "jaw_pose" not in p                   # smplx-only params absent


def test_mano_param_layout():
    md = synthetic_smplx_npz(num_verts=120, num_joints=16, seed=10)
    model = load_model(md, flat_hand_mean=True)
    p = model.zero_params(2)
    assert "hand_pose" in p and p["hand_pose"].shape == (2, 45)
    assert "body_pose" not in p
