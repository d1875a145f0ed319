"""ops/select.py: one-hot MXU row selection must be exactly a gather."""

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.ops.select import onehot_rows, take_rows

RNG = np.random.RandomState(3)


class TestTakeRows:
    def test_matches_indexing_bitexact(self):
        x = jnp.asarray(RNG.randn(4, 500, 3).astype(np.float32) * 2.5)
        ids = RNG.choice(500, size=67, replace=False)
        sel = onehot_rows(ids, 500)
        got = np.asarray(take_rows(x, sel))
        want = np.asarray(x[:, ids, :])
        assert (got == want).all()  # HIGHEST one-hot selection is exact

    def test_2d_input(self):
        x = jnp.asarray(RNG.randn(100, 8).astype(np.float32))
        ids = [7, 3, 3, 99]
        got = np.asarray(take_rows(x, onehot_rows(ids, 100)))
        assert (got == np.asarray(x)[ids]).all()

    def test_grad_is_dense_not_scatter(self):
        # value check of the backward: d/dx sum(sel(x)) places ones at
        # selected rows (duplicated ids accumulate)
        x = jnp.asarray(RNG.randn(2, 50, 3).astype(np.float32))
        ids = [4, 4, 10]
        sel = onehot_rows(ids, 50)
        g = jax.grad(lambda v: take_rows(v, sel).sum())(x)
        g = np.asarray(g)
        assert g[0, 4, 0] == 2.0 and g[0, 10, 1] == 1.0 and g[0, 0, 0] == 0.0

    def test_vmap(self):
        x = jnp.asarray(RNG.randn(5, 3, 40, 2).astype(np.float32))
        sel = onehot_rows([1, 39], 40)
        got = np.asarray(jax.vmap(lambda b: take_rows(b, sel))(x))
        assert got.shape == (5, 3, 2, 2)
        assert (got == np.asarray(x)[:, :, [1, 39], :]).all()
