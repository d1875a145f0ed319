"""Format-level regression against the reference's committed golden
outputs (res_opt_amass_{perframe,temp}/TotalCapture): our pipelines must
consume and produce the same artifact schemas. Numerical parity of marker
trajectories requires the licensed SMPL-X model, which is absent; these
tests pin down everything that does not."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN_PF = "/root/reference/res_opt_amass_perframe/TotalCapture"
GOLDEN_T = "/root/reference/res_opt_amass_temp/TotalCapture"


@pytest.mark.skipif(not os.path.isdir(GOLDEN_PF), reason="goldens absent")
class TestGoldenOutputs:
    def test_schema(self):
        for d in (GOLDEN_PF, GOLDEN_T):
            for fn in glob.glob(os.path.join(d, "body_params_opt_clip_*.npy")):
                arr = np.load(fn)
                assert arr.shape == (119, 72), (fn, arr.shape)
            for fn in glob.glob(os.path.join(d, "contact_lbl_rec_clip_*.npy")):
                lbl = np.load(fn)
                assert lbl.shape == (119, 4)
                assert set(np.unique(lbl)) <= {0.0, 1.0}
            genders = np.load(os.path.join(d, "gender_list.npy"))
            assert set(np.unique(genders)) <= {0, 1}

    def test_golden_params_run_through_our_stack(self):
        """The golden [T, 72] rows decode through our param layout and the
        full SMPL-X forward without NaN (on a synthetic model)."""
        from lemo_tpu.body_model import load_model, make_forward_fn
        from lemo_tpu.body_model import vposer as vp
        from lemo_tpu.fitting import params as P
        from lemo_tpu.testing.synthetic import synthetic_smplx_npz

        x72 = np.load(glob.glob(
            os.path.join(GOLDEN_T, "body_params_opt_clip_*.npy"))[0])
        model = load_model(synthetic_smplx_npz(num_verts=300),
                           use_pca=True, num_pca_comps=12)
        vpp = vp.init_vposer(jax.random.PRNGKey(0))
        sp = P.smplx_params_from_72(jnp.asarray(x72, jnp.float32), vpp)
        out = make_forward_fn(model)(sp, model.consts)
        assert np.isfinite(np.asarray(out["vertices"])).all()
        assert out["vertices"].shape == (119, 300, 3)

    def test_golden_rotations_are_valid(self):
        """Golden global orientations are valid axis-angles; our 6-D
        round-trip preserves them (the fitters optimize in 6-D)."""
        from lemo_tpu.ops.rotations import aa_to_rot6d, rot6d_to_aa, \
            aa_to_matrot

        x72 = np.load(glob.glob(
            os.path.join(GOLDEN_PF, "body_params_opt_clip_*.npy"))[0])
        aa = jnp.asarray(x72[:, 3:6], jnp.float32)
        back = rot6d_to_aa(aa_to_rot6d(aa))
        R1 = np.asarray(aa_to_matrot(aa))
        R2 = np.asarray(aa_to_matrot(back))
        np.testing.assert_allclose(R1, R2, atol=1e-4)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(GOLDEN_T), reason="goldens absent")
def test_golden_fixed_point_stage2_recovery():
    """Production-shape fixed-point check with zero licensed assets:
    markers generated from the golden Stage-2 params [119, 72]
    (res_opt_amass_temp/TotalCapture) through the FULL-SIZE synthetic
    SMPL-X become the fitting target, and the real Stage-2 fitter starts
    from the golden Stage-1 params (res_opt_amass_perframe). Since the
    golden Stage-2 solution is (near) a minimizer of the marker term by
    construction, the fitter must recover it: marker error to the target
    drops well below the Stage-1 starting error. This exercises the
    optimizer + model + prior stack at exactly the golden layout."""
    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.fitting import amass_temp as s2
    from lemo_tpu.fitting import params as P
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    clip = sorted(glob.glob(
        os.path.join(GOLDEN_T, "body_params_opt_clip_*.npy")))[0]
    x72_gt = np.load(clip).astype(np.float32)                  # [119, 72]
    x72_init = np.load(os.path.join(
        GOLDEN_PF, os.path.basename(clip))).astype(np.float32)

    model = load_model(synthetic_smplx_npz(full_size=True),
                       use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67 = marker_indices(False)
    ids81 = marker_indices(True)
    fwd = jax.jit(make_forward_fn(model))

    def markers67(x72):
        sp = P.smplx_params_from_72(jnp.asarray(x72), vpp,
                                    model.config.num_expressions)
        return fwd(sp, model.consts)["vertices"][:, jnp.asarray(ids67)]

    target = markers67(x72_gt)
    err0 = float(jnp.abs(markers67(x72_init) - target).mean())

    # data-dominant weights: with the synthetic model, the golden params
    # minimize only the marker term (the learned smoothness prior and
    # the contact hinge were trained/labeled on the REAL body, so at
    # reference weights they pull the synthetic-marker fit off the
    # target — measured: 27 mm start grows to 48-53 mm; with the data
    # term dominant the fit recovers to ~3.4 mm in 30 steps)
    w = s2.Stage2Weights(smooth=0.0, contact_vel=0.0,
                         vposer=1e-4, shape=1e-4, hand=1e-4)
    fit = s2.make_temporal_fitter(model, vpp, None, None, ids67, ids81,
                                  foot_vertex_ids(), num_steps=30,
                                  weights=w)
    x72_fit, losses = fit(target, jnp.zeros((x72_gt.shape[0], 4)),
                          jnp.asarray(x72_init))
    err1 = float(jnp.abs(markers67(x72_fit) - target).mean())
    assert np.isfinite(np.asarray(losses)).all()
    assert err1 < 0.3 * err0, (err0, err1)
    assert err1 < 0.005, (err0, err1)  # recovers to < 5 mm mean |.|


def test_metrics_module():
    from lemo_tpu.data.segments import foot_vertex_ids
    from lemo_tpu.utils import metrics as M

    pred = jnp.asarray(np.random.RandomState(0).randn(10, 67, 3), jnp.float32)
    gt = pred + 0.01
    e = M.marker_error(pred, gt)
    assert abs(e["mean"] - 0.01 * np.sqrt(3)) < 1e-3
    assert M.mpjpe(pred, gt) < 0.02
    assert M.accel_error(pred, pred) == 0.0
    feet = foot_vertex_ids(num_verts=67)
    verts = jnp.zeros((5, 67, 3))
    assert M.foot_skate(verts, jnp.ones((5, 4)), feet) == 0.0
    moving = verts.at[1:].add(
        jnp.arange(1, 5, dtype=jnp.float32)[:, None, None] * 0.05)
    assert M.foot_skate(moving, jnp.ones((5, 4)), feet) > 0.5
