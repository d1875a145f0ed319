"""Drill into the Stage-2 base step (markers-only) on the real TPU.

Times value_and_grad+Adam scan steps for surgically modified forwards,
all compiled first and timed interleaved in one process:

  base        : full SMPL-X forward, gather markers, L1
  nogather    : L1 on verts.mean() (no marker gather / scatter-backward)
  onehot      : markers via one-hot MXU matmul instead of gather
  noposedirs  : pose blend matmul removed
  nochain     : kinematic chain replaced by identity transforms
  noskin      : skinning replaced by v_posed (chain still runs)
  novposer    : vposer decode replaced by zeros body pose
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import lemo_tpu.body_model.lbs as lbs_mod
    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.fitting import params as P
    from lemo_tpu.fitting.adam import piecewise_lr, run_adam
    from lemo_tpu.ops.rotations import aa_to_rot6d, rot6d_to_aa
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    print("device:", jax.devices()[0])
    T, steps = 100, 20
    rng = np.random.RandomState(0)
    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67 = jnp.asarray(marker_indices(False))
    V = model.consts["v_template"].shape[0]
    onehot67 = jnp.zeros((len(ids67), V), jnp.float32).at[
        jnp.arange(len(ids67)), ids67].set(1.0)

    init72 = np.zeros((T, 72), np.float32)
    init72[:, 16:48] = rng.randn(T, 32) * 0.2
    target = jnp.asarray(rng.randn(T, 67, 3).astype(np.float32) * 0.3)
    i72 = jnp.asarray(init72)
    lr_table = piecewise_lr([(0, 0.01)], steps)
    fwd = make_forward_fn(model)

    def make_runner(marker_mode="gather", posedirs=True, chain=True,
                    skin=True, vposer=True):
        consts = dict(model.consts)
        if not posedirs:
            consts["posedirs"] = None

        def loss_fn(v, shape10):
            x72 = jnp.concatenate(
                [v["transl"], rot6d_to_aa(v["rot6d"]), shape10, v["other"]],
                axis=-1)
            sp = P.smplx_params_from_72(x72, vpp,
                                        model.config.num_expressions)
            if not vposer:
                sp = dict(sp)
                sp["body_pose"] = jnp.zeros_like(sp["body_pose"])
            if chain and skin and posedirs and marker_mode == "full":
                out = fwd(sp, consts)
                verts = out["vertices"]
            else:
                # hand-rolled forward with pieces disabled (no extra
                # joints / face landmarks — the "handroll" variant vs
                # "base" isolates their cost)
                from lemo_tpu.body_model.smplx import full_pose_from_params
                from lemo_tpu.ops.rotations import aa_to_matrot
                pose = full_pose_from_params(sp, consts, model.config)
                B = pose.shape[0]
                shape_comp = jnp.concatenate(
                    [sp["betas"], sp["expression"]], axis=1)
                v_shaped = consts["v_template"][None] + lbs_mod.blend_shapes(
                    shape_comp, consts["shapedirs_flat"])
                Jr = lbs_mod.vertices2joints(consts["J_regressor"], v_shaped)
                rot = aa_to_matrot(pose.reshape(B, -1, 3))
                if posedirs:
                    ident = jnp.eye(3, dtype=rot.dtype)
                    pf = (rot[:, 1:] - ident).reshape(B, -1)
                    v_posed = v_shaped + jnp.matmul(
                        pf, consts["posedirs"],
                        precision=jax.lax.Precision.HIGHEST
                    ).reshape(B, V, 3)
                else:
                    v_posed = v_shaped
                if chain:
                    _, A = lbs_mod.rigid_transform_chain(
                        rot, Jr, model.parents)
                else:
                    A = jnp.broadcast_to(
                        jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))],
                                        axis=1)[None, None],
                        (B, Jr.shape[1], 3, 4))
                if skin:
                    Tm = jnp.einsum(
                        "vj,bjk->bvk", consts["lbs_weights"],
                        A.reshape(B, -1, 12),
                        precision=jax.lax.Precision.HIGHEST
                    ).reshape(B, V, 3, 4)
                    verts = jnp.einsum(
                        "bvmn,bvn->bvm", Tm[..., :3], v_posed,
                        precision=jax.lax.Precision.HIGHEST) + Tm[..., 3]
                else:
                    verts = v_posed
                verts = verts + sp["transl"][:, None]
            if marker_mode in ("gather", "full"):
                mk = verts[:, ids67]
            elif marker_mode == "onehot":
                mk = jnp.einsum("mv,bvk->bmk", onehot67, verts,
                                precision=jax.lax.Precision.HIGHEST)
            else:  # none
                mk = verts.mean(axis=1, keepdims=True)
            tgt = target if marker_mode != "none" else target[:, :1]
            return jnp.abs(mk - tgt).mean()

        def run(i72v):
            shape10 = i72v[:, 6:16]
            init_vars = {"transl": i72v[:, 0:3],
                         "rot6d": aa_to_rot6d(i72v[:, 3:6]),
                         "other": i72v[:, 16:]}
            _, losses, _ = run_adam(lambda v: loss_fn(v, shape10),
                                    init_vars, steps, lr_table)
            return losses

        return jax.jit(run)

    variants = {
        "base       ": make_runner(marker_mode="full"),
        "handroll   ": make_runner(),          # no extra joints/landmarks
        "nogather   ": make_runner(marker_mode="none"),
        "onehot     ": make_runner(marker_mode="onehot"),
        "noposedirs ": make_runner(posedirs=False),
        "nochain    ": make_runner(chain=False),
        "noskin     ": make_runner(skin=False),
        "novposer   ": make_runner(vposer=False),
    }
    for name, fn in variants.items():
        jax.block_until_ready(fn(i72))  # compile
    times = {k: [] for k in variants}
    for _ in range(6):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            jax.block_until_ready(fn(i72))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: {np.median(ts) / steps * 1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
