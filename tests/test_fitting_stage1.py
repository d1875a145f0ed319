"""Stage-1 fitting end-to-end on synthetic assets: recover ground-truth
markers by optimizing body params through the full SMPL-X + VPoser stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.body_model import vposer as vp
from lemo_tpu.data.markers import marker_indices
from lemo_tpu.fitting import amass_perframe as s1
from lemo_tpu.fitting import infill as fi
from lemo_tpu.fitting import params as P
from lemo_tpu.priors.conv_ae import init_infill_ae
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(9)


@pytest.fixture(scope="module")
def setup():
    md = synthetic_smplx_npz(num_verts=400, seed=4)
    model = load_model(md, use_pca=True, num_pca_comps=12,
                       flat_hand_mean=False)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids = marker_indices(False, num_verts=400)
    return model, vpp, ids


class TestVPoser:
    def test_decode_shape(self, setup):
        _, vpp, _ = setup
        z = jnp.asarray(RNG.randn(5, 32), jnp.float32)
        aa = vp.decode(vpp, z, "aa")
        assert aa.shape == (5, 63)
        mr = vp.decode(vpp, z, "matrot")
        assert mr.shape == (5, 1, 21, 9)
        # matrot output consists of valid rotations
        R = np.asarray(mr).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", R, R),
            np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-5)

    def test_encode_shapes(self, setup):
        _, vpp, _ = setup
        pose = jnp.asarray(RNG.randn(4, 21 * 9), jnp.float32)
        mu, sigma = vp.encode(vpp, pose)
        assert mu.shape == (4, 32) and sigma.shape == (4, 32)
        assert (np.asarray(sigma) > 0).all()


class TestStage1Fit:
    def test_parallel_fit_recovers_markers(self, setup):
        model, vpp, ids = setup
        T = 8
        # ground truth: random params through the same stack
        gt72 = np.zeros((T, 72), np.float32)
        gt72[:, 0:3] = RNG.randn(T, 3) * 0.1 + [0, 0.4, 1.0]
        gt72[:, 3:6] = [0, 1.6, 3.14]
        gt72[:, 6:16] = RNG.randn(10) * 0.3
        gt72[:, 16:48] = RNG.randn(T, 32) * 0.5
        gt72[:, 48:] = RNG.randn(T, 24) * 0.2
        sp = P.smplx_params_from_72(jnp.asarray(gt72), vpp)
        fwd = make_forward_fn(model)
        gt_markers = fwd(sp, model.consts)["vertices"][:, jnp.asarray(ids), :]

        fitted, losses = s1.fit_clip(
            model, vpp, ids, gt_markers, jnp.asarray(gt72[0, 6:16]),
            mode="parallel", num_steps=150)
        assert fitted.shape == (T, 72)
        assert float(losses[-1]) < float(losses[0]) * 0.2

        sp_f = P.smplx_params_from_72(fitted, vpp)
        m_f = fwd(sp_f, model.consts)["vertices"][:, jnp.asarray(ids), :]
        err = float(jnp.abs(m_f - gt_markers).mean())
        assert err < 0.05, err  # markers recovered to cm level

    def test_sequential_mode_runs(self, setup):
        model, vpp, ids = setup
        T = 3
        tgt = jnp.asarray(RNG.randn(T, 67, 3) * 0.3 + np.array([0, 0.4, 1.0]),
                          jnp.float32)
        fitted, losses = s1.fit_clip(model, vpp, ids, tgt,
                                     jnp.zeros(10), mode="sequential",
                                     num_steps=20)
        assert fitted.shape == (T, 72)
        assert np.isfinite(np.asarray(losses)).all()


class TestInfillStage:
    @pytest.mark.slow
    def test_finetune_reduces_visible_residual(self):
        ae = init_infill_ae(jax.random.PRNGKey(1), in_channel=4)
        clip = jnp.asarray(RNG.randn(1, 4, 208, 119) * 0.5, jnp.float32)
        mask = jnp.asarray(fi.amass_input_mask(208, 119))
        rec, tuned, losses = fi.infill_infer(ae, clip, mask,
                                             finetune_steps=10,
                                             finetune_lr=1e-4)
        assert rec.shape == (1, 1, 208, 119)
        assert float(losses[-1]) < float(losses[0])  # finetune descends

    def test_contact_labels_binary(self):
        rec = jnp.asarray(RNG.randn(2, 1, 208, 119), jnp.float32)
        lbl = fi.contact_labels_from_rec(rec)
        assert lbl.shape == (2, 119, 4)
        assert set(np.unique(np.asarray(lbl))) <= {0.0, 1.0}

    def test_mask_rows_cover_legs(self):
        rows = fi.leg_mask_rows(208)
        assert rows.min() >= 3 and rows.max() < 204
        assert len(rows) == 22 * 3
