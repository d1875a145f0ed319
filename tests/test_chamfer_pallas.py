"""Pallas Chamfer kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lemo_tpu.ops.chamfer import nn_distance
from lemo_tpu.ops.chamfer_pallas import nn_distance_pallas

RNG = np.random.RandomState(17)


def test_pallas_matches_xla_interpret():
    q = jnp.asarray(RNG.randn(300, 3), jnp.float32)
    p = jnp.asarray(RNG.randn(700, 3), jnp.float32)
    d_ref, i_ref = nn_distance(q, p, chunk=256)
    d_pl, i_pl = nn_distance_pallas(q, p, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_pl), np.asarray(i_ref))


def test_pallas_mask_interpret():
    q = jnp.asarray(RNG.randn(128, 3), jnp.float32)
    p = jnp.asarray(np.concatenate([RNG.randn(100, 3),
                                    np.zeros((60, 3))]), jnp.float32)
    mask = jnp.asarray(np.arange(160) < 100)
    d_pl, i_pl = nn_distance_pallas(q, p, mask, interpret=True)
    assert int(np.asarray(i_pl).max()) < 100
    d_ref, i_ref = nn_distance(q, p, mask, chunk=64)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_gradient_interpret():
    q = jnp.asarray(RNG.randn(64, 3), jnp.float32)
    p = jnp.asarray(RNG.randn(96, 3), jnp.float32)

    def loss(q, p):
        d, _ = nn_distance_pallas(q, p, interpret=True)
        return d.mean()

    gq, gp = jax.grad(loss, argnums=(0, 1))(q, p)
    assert float(jnp.abs(gq).sum()) > 0
    assert float(jnp.abs(gp).sum()) > 0
