"""Multi-device sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lemo_tpu.parallel import make_mesh, data_parallel_step
from lemo_tpu.parallel.sharding import shard_frames


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestSharding:
    def test_data_parallel_training_step_matches_single(self):
        """DP-sharded train step must produce the same update as
        single-device (the all-reduce is exact)."""
        from lemo_tpu.train import smooth as ts

        cfg = ts.SmoothTrainConfig(batch_size=8, lr=1e-3)
        params = ts.init_params(jax.random.PRNGKey(0), cfg)
        train_step, _, opt = ts.make_train_step(cfg)
        opt_state = opt.init(params)
        batch = jnp.asarray(
            np.random.RandomState(0).randn(8, 1, 24, 16), jnp.float32)

        p1, _, m1 = train_step(params, opt_state, batch)

        mesh = make_mesh(8)
        step = data_parallel_step(train_step, mesh)
        with mesh:
            p2, _, m2 = step(params, opt_state, batch)
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                                   rtol=1e-5)
        for k in p1["enc"]:
            np.testing.assert_allclose(np.asarray(p1["enc"][k]),
                                       np.asarray(p2["enc"][k]), atol=1e-6)

    def test_frame_sharded_fit_matches_single(self):
        """Sharding the frame axis of a parallel Stage-1 fit must not
        change the result (frames are independent)."""
        from lemo_tpu.body_model import load_model, vposer as vp
        from lemo_tpu.data.markers import marker_indices
        from lemo_tpu.fitting import amass_perframe as s1
        from lemo_tpu.testing.synthetic import synthetic_smplx_npz

        model = load_model(synthetic_smplx_npz(num_verts=128),
                           use_pca=True, num_pca_comps=12)
        vpp = vp.init_vposer(jax.random.PRNGKey(1))
        ids = marker_indices(False, num_verts=128)
        T = 8
        target = jnp.asarray(
            np.random.RandomState(1).randn(T, 67, 3) * 0.2, jnp.float32)
        fit = s1.make_stage1_fitter(model, vpp, ids, num_steps=5)

        x1, l1 = fit(target, jnp.zeros(10))

        mesh = make_mesh(8)
        with mesh:
            target_sh = shard_frames(mesh, target)
            x2, l2 = fit(target_sh, jnp.zeros(10))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)


class TestPodMesh:
    """2-D pod mesh (outer dp over processes/DCN, inner axis over ICI)."""

    def test_default_shape_single_host(self):
        from lemo_tpu.parallel import initialize_multihost, make_pod_mesh

        assert initialize_multihost() == 0  # no-op on one host
        mesh = make_pod_mesh()
        assert mesh.devices.shape == (1, 8)
        assert mesh.axis_names == ("dp", "win")

    def test_explicit_factorization_and_use(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lemo_tpu.parallel import make_pod_mesh

        mesh = make_pod_mesh(dp=2, within=4)
        assert mesh.devices.shape == (2, 4)
        x = jnp.arange(8 * 6, dtype=jnp.float32).reshape(8, 6)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        y = jax.jit(lambda a: (a * 2).sum())(xs)
        assert float(y) == float((x * 2).sum())

    def test_bad_factorization_raises(self):
        import pytest as _pt

        from lemo_tpu.parallel import make_pod_mesh

        with _pt.raises(ValueError):
            make_pod_mesh(dp=3)
