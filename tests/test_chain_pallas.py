"""Pallas kinematic-chain kernel vs the XLA level-parallel chain.

Runs in Pallas interpreter mode on the CPU test mesh; the same code
compiles natively on TPU (A/B'd by scripts/ab_chain_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import lbs as L
from lemo_tpu.body_model.chain_pallas import rigid_transform_chain_pallas
from lemo_tpu.ops.rotations import aa_to_matrot
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(13)


def _inputs(B=6):
    md = synthetic_smplx_npz()
    parents = np.asarray(md["kintree_table"][0], np.int64)
    parents[0] = 0
    J = len(parents)
    R = aa_to_matrot(jnp.asarray(RNG.randn(B, J, 3) * 0.5, jnp.float32))
    joints = jnp.asarray(RNG.randn(B, J, 3), jnp.float32)
    return R, joints, parents


class TestChainPallas:
    def test_forward_matches_level(self):
        R, joints, parents = _inputs()
        pj_p, rel_p = rigid_transform_chain_pallas(R, joints, parents)
        pj_l, rel_l = L.rigid_transform_chain_level(R, joints, parents)
        np.testing.assert_allclose(np.asarray(pj_p), np.asarray(pj_l),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rel_p), np.asarray(rel_l),
                                   atol=1e-5)

    def test_gradients_match_level(self):
        R, joints, parents = _inputs(B=3)

        def loss(chain):
            def f(r, j):
                pj, rel = chain(r, j, parents)
                return (rel ** 2).sum() + (pj * 0.3).sum()
            return jax.grad(f, argnums=(0, 1))(R, joints)

        gp = loss(rigid_transform_chain_pallas)
        gl = loss(L.rigid_transform_chain_level)
        scale = max(float(jnp.abs(gl[0]).max()), 1.0)
        assert float(jnp.abs(gp[0] - gl[0]).max()) / scale < 1e-5
        assert float(jnp.abs(gp[1] - gl[1]).max()) / scale < 1e-5

    def test_vmap_jit(self):
        R, joints, parents = _inputs(B=4)
        Rc = jnp.stack([R, R * 1.0])  # [2, B, J, 3, 3] (valid rotations)
        jc = jnp.stack([joints, joints + 0.1])
        f = jax.jit(jax.vmap(
            lambda r, j: rigid_transform_chain_pallas(r, j, parents)[0]))
        g = jax.jit(jax.vmap(
            lambda r, j: L.rigid_transform_chain_level(r, j, parents)[0]))
        np.testing.assert_allclose(np.asarray(f(Rc, jc)),
                                   np.asarray(g(Rc, jc)), atol=1e-5)

    def test_non_monotone_topology_falls_back(self):
        # parents[1] = 2 > 1 violates the kernel's ordering assumption;
        # the wrapper must fall back to the level chain, not mis-compose
        parents = np.array([0, 2, 0, 1], np.int64)
        R = aa_to_matrot(jnp.asarray(RNG.randn(2, 4, 3) * 0.3, jnp.float32))
        joints = jnp.asarray(RNG.randn(2, 4, 3), jnp.float32)
        pj_p, rel_p = rigid_transform_chain_pallas(R, joints, parents)
        pj_l, rel_l = L.rigid_transform_chain_level(R, joints, parents)
        np.testing.assert_allclose(np.asarray(pj_p), np.asarray(pj_l),
                                   atol=1e-5)

    def test_full_forward_through_dispatcher(self):
        md = synthetic_smplx_npz()
        from lemo_tpu.body_model import load_model, make_forward_fn
        model = load_model(md, flat_hand_mean=True)
        fwd = make_forward_fn(model)
        params = {k: jnp.asarray(RNG.randn(*v.shape) * 0.2, jnp.float32)
                  for k, v in model.zero_params(2).items()}
        old = L.CHAIN_IMPL
        try:
            L.CHAIN_IMPL = "level"
            ref = fwd(params, model.consts)
            L.CHAIN_IMPL = "pallas"
            out = fwd(params, model.consts)
        finally:
            L.CHAIN_IMPL = old
        np.testing.assert_allclose(np.asarray(out["vertices"]),
                                   np.asarray(ref["vertices"]), atol=1e-5)
