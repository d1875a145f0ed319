"""Prior-type wiring (gmm/l2 via cfg.*_prior_type) and multi-stage
weight-schedule execution (fit_temp_loadprox_slide.py:377-417,507-528)."""

import os
import pickle
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
from lemo_tpu.config import ProxConfig
from lemo_tpu.fitting.prox.camera import PerspectiveCamera
from lemo_tpu.fitting.prox.driver import (ProxAssets, build_priors,
                                          run_prox_fitting,
                                          stage_joint_weights,
                                          weights_from_config)
from lemo_tpu.fitting.prox.losses import (ProxStatic, ProxWeights,
                                          make_prox_loss)
from lemo_tpu.priors.body_priors import MaxMixturePrior, create_prior
from lemo_tpu.testing.synthetic import synthetic_smplx_npz
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording


def _write_gmm_pickle(path: str, K: int = 3, D: int = 63, seed: int = 0):
    """Synthetic sklearn-style GMM pickle in the dict form the reference
    accepts (temp_prox/prior.py:130-134)."""
    rng = np.random.RandomState(seed)
    means = rng.randn(K, D).astype(np.float64)
    covs = []
    for _ in range(K):
        a = rng.randn(D, D) * 0.05
        covs.append(a @ a.T + np.eye(D))
    gmm = {"means": means, "covars": np.stack(covs),
           "weights": rng.dirichlet(np.ones(K))}
    with open(path, "wb") as fh:
        pickle.dump(gmm, fh)
    return gmm


def _reference_min_nll(gmm: dict, pose: np.ndarray) -> np.ndarray:
    """Independent min-component weighted NLL (prior.py:181-196)."""
    means, covs, weights = gmm["means"], gmm["covars"], gmm["weights"]
    K, D = means.shape
    prec = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (D / 2.0)
    nll_w = weights / (const * (sqrdets / sqrdets.min()))
    out = []
    for p in pose:
        diff = p[None] - means                      # [K, D]
        quad = np.einsum("kd,kde,ke->k", diff, prec, diff)
        out.append((0.5 * quad - np.log(nll_w)).min())
    return np.array(out)


class TestCreatePrior:
    def test_gmm_reference_file_naming(self, tmp_path):
        _write_gmm_pickle(str(tmp_path / "gmm_03.pkl"), K=3, D=6)
        prior = create_prior("gmm", prior_folder=str(tmp_path),
                             num_gaussians=3)
        assert isinstance(prior, MaxMixturePrior)
        assert prior.means.shape == (3, 6)

    def test_build_priors_materializes_only_non_l2(self, tmp_path):
        _write_gmm_pickle(str(tmp_path / "gmm_08.pkl"), K=8, D=63)
        cfg = ProxConfig(body_prior_type="gmm",
                         prior_folder=str(tmp_path), num_gaussians=8)
        priors = build_priors(cfg)
        assert set(priors) == {"body"}
        assert isinstance(priors["body"], MaxMixturePrior)

    def test_build_priors_hand_uses_pca_comps(self, tmp_path):
        # hand GMMs load gmm_{num_pca_comps:02d}.pkl (main_slide.py:218)
        _write_gmm_pickle(str(tmp_path / "gmm_12.pkl"), K=12, D=12)
        cfg = ProxConfig(left_hand_prior_type="gmm", num_gaussians=8,
                         num_pca_comps=12, prior_folder=str(tmp_path))
        priors = build_priors(cfg)
        assert priors["left_hand"].means.shape == (12, 12)


class TestGmmBodyPriorInLoss:
    def test_pprior_equals_min_component_nll(self, tmp_path):
        """body_prior_type=gmm with use_vposer=False: the loss's
        pprior term must equal the independently computed min-component
        NLL summed over frames, scaled by body_pose_weight**2
        (fitting_temp_slide.py:588-591)."""
        gmm = _write_gmm_pickle(str(tmp_path / "gmm_04.pkl"), K=4, D=63)
        cfg = ProxConfig(body_prior_type="gmm", num_gaussians=4,
                         prior_folder=str(tmp_path), use_vposer=False)
        priors = build_priors(cfg)

        model = load_model(synthetic_smplx_npz(), use_pca=True,
                           num_pca_comps=12)
        from lemo_tpu.body_model import make_forward_fn

        T = 3
        st = ProxStatic(
            gt_joints=jnp.zeros((T, 118, 2)),
            joints_conf=jnp.ones((T, 118)),
            joint_weights=jnp.ones(118),
            camera=PerspectiveCamera(500.0, 500.0, (320.0, 240.0)),
            R=jnp.eye(3), t=jnp.zeros(3),
        )
        w = ProxWeights(body_pose=0.5, motion_smooth=0.0,
                        friction_normal=0.0, friction_tangent=0.0,
                        sdf_penetration=0.0)
        mapper = smpl_to_openpose("smplx", True, True, False)
        loss_fn = make_prox_loss(make_forward_fn(model), model.consts,
                                 mapper, None, st, w,
                                 priors=priors, use_vposer=False)

        rng = np.random.RandomState(3)
        opt_vars = {
            "transl": jnp.zeros((T, 3)),
            "global_orient": jnp.zeros((T, 3)),
            "left_hand_pose": jnp.zeros((T, 12)),
            "right_hand_pose": jnp.zeros((T, 12)),
            "jaw_pose": jnp.zeros((T, 3)),
            "leye_pose": jnp.zeros((T, 3)),
            "reye_pose": jnp.zeros((T, 3)),
            "expression": jnp.zeros((T, 10)),
            "body_pose": jnp.asarray(rng.randn(T, 63) * 0.3, jnp.float32),
        }
        _, terms = loss_fn(opt_vars, jnp.zeros((T, 10)), st)
        expected = _reference_min_nll(
            gmm, np.asarray(opt_vars["body_pose"])).sum() * 0.5 ** 2
        np.testing.assert_allclose(float(terms["pprior_loss"]), expected,
                                   rtol=2e-4)


@pytest.fixture(scope="module")
def prox_base():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=20, seed=7)
    return base, info


def _minimal_cfg(info, **kw):
    base = dict(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=6, lr=0.01, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        init_mode="none", sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    base.update(kw)
    return ProxConfig(**base)


class TestMultiStageSchedules:
    def test_n_stages_from_weight_lists(self):
        assert ProxConfig().n_stages == 1
        assert ProxConfig(data_weights=[1.0, 0.5]).n_stages == 2
        assert ProxConfig(num_stages=3).n_stages == 3

    def test_multistage_yaml_parses(self):
        from lemo_tpu.config.prox_config import parse_config

        yml = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cfg_files",
            "PROXD_temp_S2_multistage.yaml")
        cfg = parse_config(["--config", yml])
        assert cfg.n_stages == 2
        assert cfg.stage_weights(0)["sdf_penetration"] == 0.001
        assert cfg.stage_weights(1)["sdf_penetration"] == 0.003

    def test_stage_joint_weights(self):
        cfg = ProxConfig(hand_joints_weights=[2.0, 0.5],
                         face_joints_weights=[2.0, 1.5])
        jw = np.ones(118, np.float32)
        s0 = stage_joint_weights(cfg, jw, 0)
        s1 = stage_joint_weights(cfg, jw, 1)
        assert s0[30] == 2.0 and s1[30] == 0.5
        assert s0[80] == 2.0 and s1[80] == 1.5
        for j in cfg.joints_to_ign:
            assert s0[j] == 0.0 and s1[j] == 0.0

    def test_two_stage_weights_apply_per_block(self, prox_base):
        """smooth_vel off in stage 1, on in stage 2: the term history
        must be exactly zero for the first maxiters steps and positive
        after (markers always move in the synthetic recording)."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        cfg = _minimal_cfg(info, smooth_vel=True,
                           smooth_vel_weights=[0.0, 10.0])
        assert cfg.n_stages == 2
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        m = cfg.maxiters
        assert len(res.loss_history) == 2 * m
        sv = res.term_history["smooth_vel_loss"]
        assert np.all(sv[:m] == 0.0)
        assert np.all(sv[m:] > 0.0)

    def test_two_stage_window_parallel(self, prox_base):
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                          num_pca_comps=12)
        cfg = _minimal_cfg(info, smooth_vel=True,
                           smooth_vel_weights=[0.0, 10.0],
                           window_parallel=True, window_polish_iters=0)
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        res = run_prox_fitting(cfg, assets, verbose=False)
        assert len(res) >= 1
        assert len(res[0].loss_history) == 2 * cfg.maxiters
        for r in res:
            assert np.isfinite(r.final_loss)


class TestUseVposerFalsePipeline:
    def test_direct_body_pose_fit(self, prox_base):
        """use_vposer=False: the pose variable is the raw 63-d body_pose
        warm-started from the pkls; the fit still reduces the loss."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        cfg = _minimal_cfg(info, use_vposer=False, maxiters=30)
        assets = ProxAssets(model=model, vposer_params=None)
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        assert res.body_pose.shape == (16, 63)
        assert res.loss_history[-1] < res.loss_history[0]


class TestConfigHygiene:
    def test_coll_frame_chunk_wired(self):
        w = weights_from_config(ProxConfig(coll_frame_chunk=5))
        assert w.coll_frame_chunk == 5

    def test_missing_smooth_stats_clear_error(self, tmp_path):
        ref_enc = "/root/reference/runs/15217/Enc_last_model.pkl"
        if not os.path.exists(ref_enc):
            pytest.skip("reference checkpoint not mounted")
        from lemo_tpu.fitting.prox.driver import load_assets

        import numpy as _np

        mdir = tmp_path / "models" / "smplx"
        mdir.mkdir(parents=True)
        _np.savez(mdir / "SMPLX_MALE.npz", **synthetic_smplx_npz())
        cfg = ProxConfig(model_folder=str(tmp_path / "models"),
                         AE_Enc_path=ref_enc,
                         smooth_stats_path=str(tmp_path / "nope.npz"))
        with pytest.raises(FileNotFoundError) as ei:
            load_assets(cfg)
        assert "smooth_stats_path" in str(ei.value)

    def test_smooth_stats_path_override_loads(self, tmp_path):
        ref_enc = "/root/reference/runs/15217/Enc_last_model.pkl"
        ref_stats = ("/root/reference/preprocess_stats/"
                     "preprocess_stats_smooth_withHand_global_markers.npz")
        if not (os.path.exists(ref_enc) and os.path.exists(ref_stats)):
            pytest.skip("reference assets not mounted")
        from lemo_tpu.fitting.prox.driver import load_assets
        import numpy as _np

        mdir = tmp_path / "models" / "smplx"
        mdir.mkdir(parents=True)
        _np.savez(mdir / "SMPLX_MALE.npz", **synthetic_smplx_npz())
        # stats copied OUTSIDE the reference layout: only the explicit
        # path can find them
        import shutil

        stats_copy = tmp_path / "my_stats.npz"
        shutil.copy(ref_stats, stats_copy)
        cfg = ProxConfig(model_folder=str(tmp_path / "models"),
                         AE_Enc_path=ref_enc,
                         smooth_stats_path=str(stats_copy))
        assets = load_assets(cfg)
        assert assets.smooth_stats is not None
