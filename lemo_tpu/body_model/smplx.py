"""SMPL / SMPL-H / SMPL-X / MANO forward as a pure JAX function.

Capability parity with the two body-model entry points the reference uses:

- the vendored ``BodyModel`` (human_body_prior/body_model/body_model.py:35-284)
  — params split {trans, root_orient, pose_body, pose_hand, pose_jaw,
  pose_eye, betas, expression};
- the public ``smplx`` package models created via ``smplx.create`` with
  ``use_pca``/``flat_hand_mean``/``joint_mapper`` (train_smooth_prior.py:86,
  temp_prox/main_slide.py:160-179) — params split {transl, global_orient,
  body_pose, left/right_hand_pose, jaw_pose, leye_pose, reye_pose, betas,
  expression} and 127-joint output (55 regressor + 21 vertex landmarks +
  51 face landmarks).

Design: model constants live in a plain dict of jnp arrays (`consts`), the
static configuration in a hashable NamedTuple (`SmplxConfig`). The forward
is a pure function — jit once, `vmap` over frames for sequence fitting.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import lbs as _lbs
from lemo_tpu.body_model.vertex_ids import extra_joint_vertex_ids

# number of axis-angle pose joints (incl. root) per model family
_NUM_POSE_JOINTS = {"smpl": 24, "smplh": 52, "smplx": 55, "mano": 16}
# body_pose joints (without root / hands / face)
# body joints excluding root/hands: SMPL keeps its wrists in pose_hand
# (2x3) following the reference BodyModel convention (body_model.py:153-167)
_NUM_BODY_JOINTS = {"smpl": 21, "smplh": 21, "smplx": 21}


class SmplxConfig(NamedTuple):
    """Static (hashable) model configuration."""

    model_type: str = "smplx"
    gender: str = "neutral"
    num_betas: int = 10
    num_expressions: int = 10
    use_pca: bool = False
    num_pca_comps: int = 12
    flat_hand_mean: bool = False
    use_posedirs: bool = True
    use_face_landmarks: bool = True
    use_extra_joints: bool = True


@dataclasses.dataclass
class SmplxModel:
    """A loaded body model: static config + host-side constant arrays.

    `consts` (device pytree) is what the jitted forward consumes.
    """

    config: SmplxConfig
    consts: dict[str, jnp.ndarray]
    faces: np.ndarray  # [F, 3] int32 (host)
    parents: np.ndarray  # [J] int64 (host, static topology)
    num_verts: int
    num_joints: int  # regressor joints

    def zero_params(self, batch_size: int = 1) -> dict[str, jnp.ndarray]:
        """All-zeros parameter pytree (the reference's reset_params)."""
        c = self.config
        nhand = 45
        if c.use_pca:
            nhand = c.num_pca_comps
        shapes = {
            "transl": 3,
            "global_orient": 3,
            "betas": c.num_betas,
        }
        if c.model_type in ("smpl", "smplh", "smplx"):
            shapes["body_pose"] = 3 * _NUM_BODY_JOINTS[c.model_type]
        if c.model_type == "smpl":
            shapes["left_hand_pose"] = 3
            shapes["right_hand_pose"] = 3
        elif c.model_type in ("smplh", "smplx"):
            shapes["left_hand_pose"] = nhand
            shapes["right_hand_pose"] = nhand
        elif c.model_type == "mano":
            shapes["hand_pose"] = nhand
        if c.model_type == "smplx":
            shapes["jaw_pose"] = 3
            shapes["leye_pose"] = 3
            shapes["reye_pose"] = 3
            shapes["expression"] = c.num_expressions
        return {
            k: jnp.zeros((batch_size, n), jnp.float32) for k, n in shapes.items()
        }


def find_smplx_npz(base_path: str, gender: str) -> str:
    """Resolve a SMPL-X npz under any of the conventional layouts:
    <base>/SMPLX_<G>.npz, <base>/smplx/SMPLX_<G>.npz,
    <base>/smplx_model/smplx/SMPLX_<G>.npz (the reference's
    body_models/smplx_model convention)."""
    import os

    fname = f"SMPLX_{gender.upper()}.npz"
    for cand in (
        os.path.join(base_path, fname),
        os.path.join(base_path, "smplx", fname),
        os.path.join(base_path, "smplx_model", fname),
        os.path.join(base_path, "smplx_model", "smplx", fname),
    ):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no {fname} under {base_path} (tried ./, smplx/, smplx_model/)")


def load_model(
    bm_path_or_dict: Any,
    model_type: str | None = None,
    gender: str = "neutral",
    num_betas: int = 10,
    num_expressions: int = 10,
    use_pca: bool = False,
    num_pca_comps: int = 12,
    flat_hand_mean: bool = False,
    use_posedirs: bool = True,
    dtype=jnp.float32,
    build_fused: bool | None = None,
) -> SmplxModel:
    """Load a SMPL-family model from an official .npz file (or a dict of
    arrays with the same keys: v_template, shapedirs, posedirs,
    J_regressor, kintree_table, weights, f, hands_components{l,r},
    hands_mean{l,r}, lmk_faces_idx, lmk_bary_coords).

    Mirrors the loading logic of body_model.py:62-139 (model-type inference
    from posedirs width, expression dirs slicing at 300/10) and the smplx
    package (PCA hands, landmark embeddings).

    `build_fused`: attach the fused-vertex-path constants (~64 MB
    fused_dirs + padded copies, body_model/vertex_pallas.py). Default
    (None) builds them only on the TPU backend — the only place
    lbs.LBS_IMPL='auto' ever uses them; pass True for interpreter-mode
    kernel tests on CPU, False to skip even on TPU.
    """
    if isinstance(bm_path_or_dict, (str,)):
        smpl_dict = dict(np.load(bm_path_or_dict, allow_pickle=True))
    else:
        smpl_dict = dict(bm_path_or_dict)

    posedirs_raw = np.asarray(smpl_dict["posedirs"], np.float64)
    njoints = posedirs_raw.shape[2] // 3
    inferred = {69: "smpl", 153: "smplh", 162: "smplx", 45: "mano"}[njoints]
    if model_type is None:
        model_type = inferred
    assert model_type == inferred, (model_type, inferred)

    V = smpl_dict["v_template"].shape[0]
    shapedirs_all = np.asarray(smpl_dict["shapedirs"], np.float64)  # [V,3,S]
    num_total = shapedirs_all.shape[-1]
    num_betas_eff = num_total if num_betas < 1 else min(num_betas, num_total)
    shapedirs = shapedirs_all[:, :, :num_betas_eff]

    consts: dict[str, np.ndarray] = {}

    if model_type == "smplx":
        begin = 300 if num_total > 300 else 10
        exprdirs = shapedirs_all[:, :, begin : begin + num_expressions]
        shape_expr = np.concatenate([shapedirs, exprdirs], axis=-1)
    else:
        shape_expr = shapedirs
    # pre-flatten [V, 3, S] -> [S, V*3] for a single MXU matmul
    consts["shapedirs_flat"] = (
        shape_expr.reshape(V * 3, -1).T.astype(np.float32)
    )

    if use_posedirs:
        # [V, 3, 9(J-1)] -> [9(J-1), V*3] (same transform the reference does
        # at body_model.py:126-128)
        consts["posedirs"] = (
            posedirs_raw.reshape(V * 3, -1).T.astype(np.float32)
        )

    consts["v_template"] = np.asarray(smpl_dict["v_template"], np.float32)
    J_regressor = np.asarray(smpl_dict["J_regressor"], np.float64)
    if J_regressor.ndim != 2:  # sparse-stored variants
        J_regressor = np.asarray(J_regressor.item().todense())
    consts["J_regressor"] = J_regressor.astype(np.float32)
    consts["lbs_weights"] = np.asarray(smpl_dict["weights"], np.float32)

    if build_fused is None:
        build_fused = jax.default_backend() == "tpu"
    if use_posedirs and build_fused:
        # fused vertex-path constants (body_model/vertex_pallas.py):
        # plane-major blend dirs (pose block permuted to plane order) +
        # padded skinning weights + the J_regressor pre-applied to the
        # shape dirs (f64 association) so rest-pose joint planes come
        # straight from the shape components
        from lemo_tpu.body_model.vertex_pallas import build_fused_consts

        v_template_f64 = np.asarray(smpl_dict["v_template"], np.float64)
        consts.update(build_fused_consts(
            shape_expr, posedirs_raw, v_template_f64,
            consts["lbs_weights"], J_regressor))

    kintree = np.asarray(smpl_dict["kintree_table"], np.int64)
    parents = kintree[0].copy()
    parents[0] = 0  # root sentinel (stored as 2**32-1 in official files)

    faces = np.asarray(smpl_dict["f"], np.int64).astype(np.int32)

    # hands
    if model_type in ("smplh", "smplx", "mano") and "hands_componentsl" in smpl_dict:
        compl = np.asarray(smpl_dict["hands_componentsl"], np.float64)
        compr = np.asarray(smpl_dict["hands_componentsr"], np.float64)
        meanl = np.asarray(smpl_dict["hands_meanl"], np.float64)
        meanr = np.asarray(smpl_dict["hands_meanr"], np.float64)
        if use_pca:
            consts["hand_comps_l"] = compl[:num_pca_comps].astype(np.float32)
            consts["hand_comps_r"] = compr[:num_pca_comps].astype(np.float32)
        consts["hand_mean_l"] = (
            np.zeros_like(meanl) if flat_hand_mean else meanl
        ).astype(np.float32)
        consts["hand_mean_r"] = (
            np.zeros_like(meanr) if flat_hand_mean else meanr
        ).astype(np.float32)

    # extra surface-landmark joints (fingertips, nose, toes, ...)
    config = SmplxConfig(
        model_type=model_type,
        gender=gender,
        num_betas=num_betas_eff,
        num_expressions=num_expressions,
        use_pca=use_pca,
        num_pca_comps=num_pca_comps,
        flat_hand_mean=flat_hand_mean,
        use_posedirs=use_posedirs,
        use_face_landmarks=(model_type == "smplx" and "lmk_faces_idx" in smpl_dict),
        use_extra_joints=model_type in ("smpl", "smplh", "smplx"),
    )
    if config.use_extra_joints:
        extra_ids = extra_joint_vertex_ids(model_type)
        extra_ids = np.clip(extra_ids, 0, V - 1)  # tolerate reduced meshes
        consts["extra_joint_ids"] = extra_ids.astype(np.int32)

    if config.use_face_landmarks:
        lmk_faces_idx = np.asarray(smpl_dict["lmk_faces_idx"], np.int64)
        lmk_bary = np.asarray(smpl_dict["lmk_bary_coords"], np.float64)
        # gather the 3 vertex ids of each landmark face once, on host
        consts["lmk_vert_ids"] = faces[lmk_faces_idx].astype(np.int32)  # [51,3]
        consts["lmk_bary"] = lmk_bary.astype(np.float32)  # [51, 3]

    consts_j = {k: jnp.asarray(v) for k, v in consts.items()}
    return SmplxModel(
        config=config,
        consts=consts_j,
        faces=faces,
        parents=parents,
        num_verts=V,
        num_joints=J_regressor.shape[0],
    )


def full_pose_from_params(
    params: dict[str, jnp.ndarray], consts: dict[str, jnp.ndarray], config: SmplxConfig
) -> jnp.ndarray:
    """Assemble the [B, J*3] axis-angle pose vector.

    SMPL-X order (body_model.py:229-231): root(3), body(63), jaw(3),
    leye(3), reye(3), left_hand(45), right_hand(45). Hands are PCA-decoded
    and mean-offset per the smplx package when configured so.
    """
    B = params["global_orient"].shape[0]
    mt = config.model_type

    def hand(side: str) -> jnp.ndarray:
        raw = params[f"{side}_hand_pose"]
        if config.use_pca:
            raw = jnp.matmul(raw, consts[f"hand_comps_{side[0]}"],
                             precision=jax.lax.Precision.HIGHEST)
        if f"hand_mean_{side[0]}" in consts:
            raw = raw + consts[f"hand_mean_{side[0]}"]
        return raw

    if mt == "smplx":
        return jnp.concatenate(
            [
                params["global_orient"],
                params["body_pose"],
                params["jaw_pose"],
                params["leye_pose"],
                params["reye_pose"],
                hand("left"),
                hand("right"),
            ],
            axis=1,
        )
    if mt == "smplh":
        return jnp.concatenate(
            [params["global_orient"], params["body_pose"], hand("left"), hand("right")],
            axis=1,
        )
    if mt == "smpl":
        return jnp.concatenate(
            [
                params["global_orient"],
                params["body_pose"],
                params["left_hand_pose"],
                params["right_hand_pose"],
            ],
            axis=1,
        )
    if mt == "mano":
        raw = params["hand_pose"]
        if config.use_pca and "hand_comps_l" in consts:
            raw = jnp.matmul(raw, consts["hand_comps_l"],
                             precision=jax.lax.Precision.HIGHEST)
        if "hand_mean_l" in consts:
            raw = raw + consts["hand_mean_l"]
        return jnp.concatenate([params["global_orient"], raw], axis=1)
    raise ValueError(mt)


def smplx_forward(
    params: dict[str, jnp.ndarray],
    consts: dict[str, jnp.ndarray],
    config: SmplxConfig,
    parents: tuple,  # static tuple of ints
    joint_mapper: jnp.ndarray | None = None,
    fused: bool = True,
) -> dict[str, jnp.ndarray]:
    """Pure forward pass. params arrays are [B, ...].

    Returns {vertices [B,V,3], joints [B,K,3], full_pose [B,J*3]} where K is
    127 for SMPL-X (or len(joint_mapper) if given).
    """
    full_pose = full_pose_from_params(params, consts, config)

    if config.model_type == "smplx":
        shape_comp = jnp.concatenate(
            [params["betas"], params["expression"]], axis=1
        )
    else:
        shape_comp = params["betas"]

    parents_np = np.asarray(parents, np.int64)
    fused_consts = None
    if fused and "fused_dirs" in consts:
        fused_consts = {k: consts[k] for k in
                        ("fused_dirs", "lbs_w_pad", "j_ext")}
    verts, joints = _lbs.lbs(
        shape_comp,
        full_pose,
        consts["v_template"],
        consts["shapedirs_flat"],
        consts.get("posedirs"),
        consts["J_regressor"],
        parents_np,
        consts["lbs_weights"],
        fused_consts=fused_consts,
    )

    if config.use_extra_joints and "extra_joint_ids" in consts:
        extra = verts[:, consts["extra_joint_ids"], :]
        joints = jnp.concatenate([joints, extra], axis=1)

    if config.use_face_landmarks and "lmk_vert_ids" in consts:
        tri = verts[:, consts["lmk_vert_ids"], :]  # [B, 51, 3verts, 3]
        lmk = jnp.einsum("blvk,lv->blk", tri, consts["lmk_bary"],
                         precision=jax.lax.Precision.HIGHEST)
        joints = jnp.concatenate([joints, lmk], axis=1)

    if joint_mapper is not None:
        joints = joints[:, joint_mapper, :]

    transl = params["transl"][:, None, :]
    return {
        "vertices": verts + transl,
        "joints": joints + transl,
        "full_pose": full_pose,
    }


def make_forward_fn(model: SmplxModel, joint_mapper: np.ndarray | None = None,
                    fused: bool = True):
    """Bind a model's static pieces; returns f(params, consts) -> outputs.

    Keeping `consts` an explicit argument lets callers donate/shard it and
    lets a single jitted computation serve multiple genders (same shapes).

    `fused=False` opts out of the fused Pallas vertex path
    (lbs.LBS_IMPL); builders that `vmap` the forward MUST pass it —
    batching a pallas_call broadcasts the ~64 MB dirs operand per batch
    element.
    """
    parents = tuple(int(p) for p in model.parents)
    config = model.config
    jm = None if joint_mapper is None else jnp.asarray(joint_mapper)

    def forward(params, consts):
        return smplx_forward(params, consts, config, parents, jm,
                             fused=fused)

    return forward
