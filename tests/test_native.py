"""Native C++ host library: build, bind, match numpy."""

import numpy as np

from lemo_tpu.ops import native

RNG = np.random.RandomState(44)


def test_builds_and_loads():
    assert native.available(), "native build failed (g++ present in image)"


def test_nn_matches_numpy():
    q = RNG.randn(200, 3).astype(np.float32)
    p = RNG.randn(300, 3).astype(np.float32)
    d, i = native.nn_distance_cpu(q, p)
    D = ((q[:, None] - p[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, D.min(1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i, D.argmin(1))


def test_nn_grid_matches_bruteforce():
    q = RNG.randn(500, 3).astype(np.float32) * 2
    p = RNG.randn(3000, 3).astype(np.float32) * 2
    d, i = native.nn_distance_cpu(q, p, use_grid=True)
    D = ((q[:, None] - p[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, D.min(1), rtol=1e-5, atol=1e-6)


def test_nn_mask():
    q = RNG.randn(50, 3).astype(np.float32)
    p = RNG.randn(80, 3).astype(np.float32)
    mask = np.arange(80) < 40
    d, i = native.nn_distance_cpu(q, p, mask=mask)
    assert i.max() < 40


def test_chamfer_bidirectional():
    a = RNG.randn(100, 3).astype(np.float32)
    b = RNG.randn(150, 3).astype(np.float32)
    da, db, ia, ib = native.chamfer_cpu(a, b)
    assert da.shape == (100,) and db.shape == (150,)
    assert (da >= 0).all() and (db >= 0).all()
