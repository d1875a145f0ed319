"""L-BFGS strong-Wolfe optimizer tests."""

import numpy as np
import jax.numpy as jnp

from lemo_tpu.fitting.lbfgs import create_optimizer, lbfgs_minimize


def test_quadratic_converges():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0])

    def loss(x):
        return 0.5 * x @ A @ x - b @ x

    x0 = jnp.zeros(3)
    x, losses = lbfgs_minimize(loss, x0, max_iter=30)
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_star), atol=1e-3)
    assert float(losses[-1]) < float(losses[0])


def test_rosenbrock_pytree():
    def loss(p):
        x, y = p["x"], p["y"]
        return (1 - x) ** 2 + 100.0 * (y - x ** 2) ** 2

    p0 = {"x": jnp.asarray(-1.2), "y": jnp.asarray(1.0)}
    p, losses = lbfgs_minimize(loss, p0, max_iter=80)
    assert float(loss(p)) < 1e-3, float(loss(p))


def test_factory_types():
    import optax

    assert isinstance(create_optimizer("adam", 0.01),
                      optax.GradientTransformation)
    assert isinstance(create_optimizer("sgd", 0.01),
                      optax.GradientTransformation)
    assert isinstance(create_optimizer("rmsprop", 0.01),
                      optax.GradientTransformation)
    assert create_optimizer("lbfgsls") is None
    try:
        create_optimizer("nope")
        raise AssertionError("should have raised")
    except ValueError:
        pass
