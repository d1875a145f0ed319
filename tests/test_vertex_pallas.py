"""Fused Pallas vertex path (body_model/vertex_pallas.py) vs the XLA
LBS path: forward and gradient parity (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lemo_tpu.body_model.lbs as lbs_mod
from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.testing.synthetic import synthetic_smplx_npz


@pytest.fixture(scope="module")
def model():
    # build_fused=True: the fused consts are gated to the TPU backend by
    # default; these tests exercise the kernel in interpreter mode on CPU
    return load_model(synthetic_smplx_npz(), use_pca=True, num_pca_comps=12,
                      build_fused=True)


def _params(model, B, seed=0):
    rng = np.random.RandomState(seed)
    p = dict(model.zero_params(B))
    p["body_pose"] = jnp.asarray(rng.randn(B, 63) * 0.4, jnp.float32)
    p["global_orient"] = jnp.asarray(rng.randn(B, 3) * 0.5, jnp.float32)
    p["transl"] = jnp.asarray(rng.randn(B, 3), jnp.float32)
    p["betas"] = jnp.asarray(rng.randn(B, 10) * 0.5, jnp.float32)
    p["expression"] = jnp.asarray(rng.randn(B, 10) * 0.5, jnp.float32)
    p["left_hand_pose"] = jnp.asarray(rng.randn(B, 12) * 0.3, jnp.float32)
    return p


def _run(model, params, impl):
    old = lbs_mod.LBS_IMPL
    lbs_mod.LBS_IMPL = impl
    try:
        fwd = make_forward_fn(model)
        return fwd(params, model.consts)
    finally:
        lbs_mod.LBS_IMPL = old


class TestFusedForwardParity:
    @pytest.mark.parametrize("B", [1, 5])
    def test_vertices_and_joints_match(self, model, B):
        p = _params(model, B)
        ref = _run(model, p, "xla")
        out = _run(model, p, "fused")
        np.testing.assert_allclose(np.asarray(out["vertices"]),
                                   np.asarray(ref["vertices"]),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(out["joints"]),
                                   np.asarray(ref["joints"]), atol=2e-6)

    def test_gradients_match(self, model):
        """d loss / d {betas, body_pose, transl, expression} through the
        custom VJP vs XLA autodiff."""
        B = 3
        p = _params(model, B, seed=4)
        target = jnp.asarray(
            np.random.RandomState(9).randn(B, model.num_verts, 3) * 0.1,
            jnp.float32)

        def loss(impl, bp, betas, transl, expr):
            q = dict(p)
            q.update(body_pose=bp, betas=betas, transl=transl,
                     expression=expr)
            out = _run(model, q, impl)
            return (jnp.abs(out["vertices"] - target).mean()
                    + (out["joints"] ** 2).mean())

        args = (p["body_pose"], p["betas"], p["transl"], p["expression"])
        g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3))(
            *args)
        g_fus = jax.grad(lambda *a: loss("fused", *a), argnums=(0, 1, 2, 3))(
            *args)
        for gr, gf, name in zip(g_ref, g_fus,
                                ["body_pose", "betas", "transl", "expr"]):
            scale = max(float(jnp.abs(gr).max()), 1e-8)
            diff = float(jnp.abs(gr - gf).max()) / scale
            assert diff < 5e-5, (name, diff)

    def test_fused_off_for_vmapped_builders(self, model):
        """make_forward_fn(fused=False) must never hit the kernel even
        when LBS_IMPL forces it."""
        old = lbs_mod.LBS_IMPL
        lbs_mod.LBS_IMPL = "fused"
        try:
            p = _params(model, 2)
            fwd = make_forward_fn(model, fused=False)
            out = jax.vmap(lambda q: fwd(q, model.consts)["vertices"])(
                jax.tree_util.tree_map(lambda x: x[:, None], p))
            assert out.shape == (2, 1, model.num_verts, 3)
        finally:
            lbs_mod.LBS_IMPL = old
