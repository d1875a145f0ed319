"""SMPL-X forward parity vs an independent numpy implementation.

The numpy reference below is written directly from the SMPL equations
(shape blend -> joint regression -> pose blend -> kinematic chain ->
skinning), using scipy for rotations — it shares no code with either
lemo_tpu.body_model or the upstream repo.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
from lemo_tpu.testing.synthetic import synthetic_smplx_npz, SMPLX_PARENTS

RNG = np.random.RandomState(7)


def numpy_smplx_forward(md, params, num_betas=10, num_expr=10,
                        use_pca=False, num_pca=12, flat_hand_mean=False):
    """Plain-numpy SMPL-X forward. md: raw model dict; params: numpy dict."""
    B = params["global_orient"].shape[0]
    v_template = md["v_template"]
    V = v_template.shape[0]
    J_reg = md["J_regressor"]
    nj = J_reg.shape[0]
    parents = SMPLX_PARENTS[:nj].copy()
    parents[0] = 0

    # hands
    def hand(side):
        raw = params[f"{side}_hand_pose"]
        if use_pca:
            comp = md[f"hands_components{side[0]}"][:num_pca]
            raw = raw @ comp
        mean = md[f"hands_mean{side[0]}"]
        if flat_hand_mean:
            mean = np.zeros_like(mean)
        return raw + mean

    full_pose = np.concatenate(
        [params["global_orient"], params["body_pose"], params["jaw_pose"],
         params["leye_pose"], params["reye_pose"], hand("left"), hand("right")],
        axis=1,
    )  # [B, 165]

    # expression dirs live at column 300 in the production 400-dir layout
    # (smplx SMPLX.__init__), at 10 in the compact synthetic layout
    expr_begin = 300 if md["shapedirs"].shape[-1] > 300 else 10
    shapedirs = np.concatenate(
        [md["shapedirs"][:, :, :num_betas],
         md["shapedirs"][:, :, expr_begin:expr_begin + num_expr]], axis=-1)
    shape_comp = np.concatenate([params["betas"], params["expression"]], axis=1)

    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, nj, 3))
    for b in range(B):
        v_shaped = v_template + np.einsum("vks,s->vk", shapedirs, shape_comp[b])
        Jrest = J_reg @ v_shaped  # [nj, 3]
        rots = R.from_rotvec(full_pose[b].reshape(-1, 3) + 1e-8 / np.sqrt(3)).as_matrix()
        # NOTE: the +1e-8 regularizer mirrors batch_rodrigues' norm(aa+eps)
        # only approximately; at the magnitudes tested the difference is
        # below tolerance.
        pose_feat = (rots[1:] - np.eye(3)).reshape(-1)
        posedirs = md["posedirs"].reshape(V * 3, -1)
        v_posed = v_shaped + (posedirs @ pose_feat).reshape(V, 3)

        # kinematic chain
        G = np.zeros((nj, 4, 4))
        for j in range(nj):
            T = np.eye(4)
            T[:3, :3] = rots[j]
            T[:3, 3] = Jrest[j] - (Jrest[parents[j]] if j > 0 else 0)
            G[j] = T if j == 0 else G[parents[j]] @ T
        out_j[b] = G[:, :3, 3]
        # remove rest-pose offset
        A = G.copy()
        for j in range(nj):
            A[j, :3, 3] -= G[j, :3, :3] @ Jrest[j]
        Tv = np.einsum("vj,jmn->vmn", md["weights"], A)
        vh = np.concatenate([v_posed, np.ones((V, 1))], axis=1)
        out_v[b] = np.einsum("vmn,vn->vm", Tv, vh)[:, :3]
    out_v += params["transl"][:, None, :]
    out_j += params["transl"][:, None, :]
    return out_v, out_j


def _random_params(model, B):
    p = model.zero_params(B)
    upd = {}
    for k, v in p.items():
        scale = 0.3 if "pose" in k or "orient" in k else 0.5
        upd[k] = jnp.asarray(RNG.randn(*v.shape) * scale, jnp.float32)
    upd["transl"] = jnp.asarray(RNG.randn(B, 3), jnp.float32)
    return upd


@pytest.fixture(scope="module")
def md():
    return synthetic_smplx_npz(num_verts=300, seed=11)


class TestSmplxForward:
    def test_matches_numpy_reference(self, md):
        model = load_model(md, use_pca=False, flat_hand_mean=True)
        fwd = jax.jit(make_forward_fn(model))
        params = _random_params(model, 4)
        out = fwd(params, model.consts)
        np_params = {k: np.asarray(v, np.float64) for k, v in params.items()}
        ref_v, ref_j = numpy_smplx_forward(
            md, np_params, use_pca=False, flat_hand_mean=True)
        np.testing.assert_allclose(
            np.asarray(out["vertices"]), ref_v, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["joints"])[:, :55], ref_j, atol=2e-5)

    def test_pca_hands_and_mean(self, md):
        model = load_model(md, use_pca=True, num_pca_comps=12,
                           flat_hand_mean=False)
        fwd = jax.jit(make_forward_fn(model))
        params = _random_params(model, 2)
        assert params["left_hand_pose"].shape == (2, 12)
        out = fwd(params, model.consts)
        np_params = {k: np.asarray(v, np.float64) for k, v in params.items()}
        ref_v, ref_j = numpy_smplx_forward(
            md, np_params, use_pca=True, num_pca=12, flat_hand_mean=False)
        np.testing.assert_allclose(np.asarray(out["vertices"]), ref_v, atol=2e-5)

    def test_joint_layout(self, md):
        model = load_model(md)
        fwd = make_forward_fn(model)
        out = fwd(model.zero_params(1), model.consts)
        # 55 regressor + 21 surface + 51 face landmarks
        assert out["joints"].shape == (1, 127, 3)
        assert out["vertices"].shape == (1, 300, 3)
        assert out["full_pose"].shape == (1, 165)

    def test_joint_mapper_openpose(self, md):
        model = load_model(md)
        mapper = smpl_to_openpose("smplx", True, True, False, "coco25")
        assert mapper.shape == (118,)
        fwd = make_forward_fn(model, joint_mapper=mapper)
        out = fwd(model.zero_params(3), model.consts)
        assert out["joints"].shape == (3, 118, 3)

    def test_grad_flows(self, md):
        model = load_model(md)
        fwd = make_forward_fn(model)

        def loss(params):
            return (fwd(params, model.consts)["vertices"] ** 2).sum()

        g = jax.grad(loss)(model.zero_params(2))
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)

    def test_vmap_over_frames(self, md):
        """vmap over a leading clip axis — the sequence-fitting pattern."""
        model = load_model(md)
        fwd = make_forward_fn(model)
        B, T = 2, 3
        params_bt = {k: jnp.asarray(RNG.randn(B, T, *v.shape[1:]) * 0.1, jnp.float32)
                     for k, v in model.zero_params(1).items()}
        out = jax.vmap(lambda p: fwd(p, model.consts))(params_bt)
        assert out["vertices"].shape == (B, T, 300, 3)

    def test_zero_pose_is_template_plus_transl(self, md):
        model = load_model(md, flat_hand_mean=True)
        fwd = make_forward_fn(model)
        params = model.zero_params(1)
        params["transl"] = jnp.asarray([[1.0, 2.0, 3.0]])
        out = fwd(params, model.consts)
        ref = np.asarray(model.consts["v_template"]) + np.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(out["vertices"][0]), ref, atol=2e-5)


class TestChainImplementations:
    def test_doubling_matches_level(self, md):
        """Pointer-doubling chain is the level chain up to f32
        association order (both exact HIGHEST selections)."""
        from lemo_tpu.body_model import lbs as L
        from lemo_tpu.ops.rotations import aa_to_matrot

        parents = np.asarray(md["kintree_table"][0], np.int64)
        parents[0] = 0
        J = len(parents)
        rng = np.random.RandomState(5)
        Rm = aa_to_matrot(jnp.asarray(rng.randn(3, J, 3) * 0.4, jnp.float32))
        joints = jnp.asarray(rng.randn(3, J, 3), jnp.float32)
        pj_d, rel_d = L.rigid_transform_chain_doubling(Rm, joints, parents)
        pj_l, rel_l = L.rigid_transform_chain_level(Rm, joints, parents)
        np.testing.assert_allclose(np.asarray(pj_d), np.asarray(pj_l),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rel_d), np.asarray(rel_l),
                                   atol=1e-5)
