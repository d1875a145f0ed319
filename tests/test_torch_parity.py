"""Full-production-shape SMPL-X forward parity vs an independent torch
composition of the LBS math.

The torch implementation below is written directly from the SMPL equations
(reference `human_body_prior/body_model/lbs.py:34-119` semantics: shape
blend, joint regression, pose blend, batch_rodrigues, sequential kinematic
chain, homogeneous skinning) — it shares no code with lemo_tpu or the
reference. Running it at the full 10475-vertex / 55-joint / 400-shapedir
layout pins the JAX forward at production scale, complementing the small
numpy parity in test_body_model.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from lemo_tpu.body_model import load_model, make_forward_fn  # noqa: E402
from lemo_tpu.testing.synthetic import (SMPLX_PARENTS,  # noqa: E402
                                        synthetic_smplx_npz)

RNG = np.random.RandomState(21)


def torch_rodrigues(aa):
    """[N, 3] axis-angle -> [N, 3, 3] rotation matrices (Rodrigues)."""
    angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
    axis = aa / angle
    c = torch.cos(angle)[:, :, None]
    s = torch.sin(angle)[:, :, None]
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = torch.zeros_like(x)
    K = torch.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros],
                    dim=1).view(-1, 3, 3)
    eye = torch.eye(3, dtype=aa.dtype)[None]
    return eye + s * K + (1 - c) * torch.bmm(K, K)


def torch_smplx_forward(md, params, num_betas=10, num_expr=10,
                        use_pca=True, num_pca=12):
    """Independent torch SMPL-X forward. Everything float64 so the oracle
    itself contributes no rounding."""
    t = lambda x: torch.as_tensor(np.asarray(x), dtype=torch.float64)
    B = params["global_orient"].shape[0]
    v_template = t(md["v_template"])
    V = v_template.shape[0]
    J_reg = t(md["J_regressor"])
    nj = J_reg.shape[0]
    parents = SMPLX_PARENTS[:nj].copy()
    parents[0] = 0

    def hand(side):
        raw = t(params[f"{side}_hand_pose"])
        if use_pca:
            raw = raw @ t(md[f"hands_components{side[0]}"][:num_pca])
        return raw + t(md[f"hands_mean{side[0]}"])

    full_pose = torch.cat(
        [t(params["global_orient"]), t(params["body_pose"]),
         t(params["jaw_pose"]), t(params["leye_pose"]),
         t(params["reye_pose"]), hand("left"), hand("right")], dim=1)

    # SMPL-X convention: expression dirs start at 300 in the full 400-dir
    # layout, at 10 in truncated test layouts (body_model.py:103-111)
    expr_at = 300 if md["shapedirs"].shape[-1] > 300 else 10
    shapedirs = torch.cat(
        [t(md["shapedirs"][:, :, :num_betas]),
         t(md["shapedirs"][:, :, expr_at:expr_at + num_expr])], dim=-1)
    shape_comp = torch.cat([t(params["betas"]), t(params["expression"])],
                           dim=1)

    v_shaped = v_template[None] + \
        torch.einsum("vks,bs->bvk", shapedirs, shape_comp)
    Jrest = torch.einsum("jv,bvk->bjk", J_reg, v_shaped)

    rots = torch_rodrigues(full_pose.reshape(-1, 3)).view(B, nj, 3, 3)
    pose_feat = (rots[:, 1:] - torch.eye(3, dtype=rots.dtype)).reshape(B, -1)
    posedirs = t(md["posedirs"]).reshape(V * 3, -1)
    v_posed = v_shaped + (pose_feat @ posedirs.T).view(B, V, 3)

    # sequential kinematic chain with homogeneous transforms
    G = torch.zeros(B, nj, 4, 4, dtype=torch.float64)
    for j in range(nj):
        T = torch.zeros(B, 4, 4, dtype=torch.float64)
        T[:, :3, :3] = rots[:, j]
        T[:, 3, 3] = 1.0
        T[:, :3, 3] = Jrest[:, j] - (Jrest[:, parents[j]] if j > 0 else 0)
        G[:, j] = T if j == 0 else torch.bmm(G[:, parents[j]].clone(), T)
    joints = G[:, :, :3, 3].clone()
    A = G.clone()
    A[:, :, :3, 3] -= torch.einsum("bjmn,bjn->bjm", G[:, :, :3, :3], Jrest)

    Tv = torch.einsum("vj,bjmn->bvmn", t(md["weights"]), A)
    vh = torch.cat([v_posed, torch.ones(B, V, 1, dtype=torch.float64)],
                   dim=2)
    verts = torch.einsum("bvmn,bvn->bvm", Tv, vh)[:, :, :3]
    transl = t(params["transl"])[:, None, :]
    return (verts + transl).numpy(), (joints + transl).numpy()


@pytest.mark.slow
def test_full_size_forward_matches_torch():
    """10475 verts x 55 joints x 400 shapedirs, batch 8: ours vs the
    float64 torch oracle to <=1e-4 m (VERDICT round-1 item 4b)."""
    md = synthetic_smplx_npz(full_size=True, seed=2)
    model = load_model(md, use_pca=True, num_pca_comps=12,
                       flat_hand_mean=False)
    B = 8
    params = model.zero_params(B)
    upd = dict(params)
    for k in ("global_orient", "body_pose", "jaw_pose", "leye_pose",
              "reye_pose"):
        upd[k] = jnp.asarray(RNG.randn(*params[k].shape) * 0.3, jnp.float32)
    for k in ("left_hand_pose", "right_hand_pose"):
        upd[k] = jnp.asarray(RNG.randn(*params[k].shape) * 0.5, jnp.float32)
    upd["betas"] = jnp.asarray(RNG.randn(B, 10) * 0.5, jnp.float32)
    upd["expression"] = jnp.asarray(RNG.randn(B, 10) * 0.5, jnp.float32)
    upd["transl"] = jnp.asarray(RNG.randn(B, 3), jnp.float32)

    out = make_forward_fn(model)(upd, model.consts)
    np_params = {k: np.asarray(v) for k, v in upd.items()}
    verts_t, joints_t = torch_smplx_forward(md, np_params)

    verts_err = np.abs(np.asarray(out["vertices"]) - verts_t).max()
    # joints: compare the raw 55 skeleton joints (the forward also appends
    # extra landmark joints; slice to the skeleton)
    joints_err = np.abs(
        np.asarray(out["joints"])[:, :55] - joints_t).max()
    assert verts_err < 1e-4, verts_err
    assert joints_err < 1e-4, joints_err
