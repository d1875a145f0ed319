"""PROX Stage-3: occlusion-robust fitting with the motion-infill prior
(the reference's PROXD_temp_S3 configuration) on a synthetic recording."""

import os
import tempfile

import numpy as np
import jax
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.config import ProxConfig
from lemo_tpu.data.stats import GlobalStats, Local4ChanStats
from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
from lemo_tpu.priors.conv_ae import init_infill_ae, init_smooth_enc, \
    load_torch_state_dict
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording

REF_STATS = ("/root/reference/preprocess_stats/"
             "preprocess_stats_infill_local_markers_4chan.npz")
REF_ENC = "/root/reference/runs/15217/Enc_last_model.pkl"


@pytest.mark.skipif(not os.path.exists(REF_STATS), reason="stats absent")
@pytest.mark.slow
def test_s3_pipeline_with_infill_prior():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=18, seed=3,
                                          occlusion_frac=0.3)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)

    infill_stats = Local4ChanStats.load(REF_STATS)
    if os.path.exists(REF_ENC):
        enc = load_torch_state_dict(REF_ENC)
        smooth_stats = GlobalStats.load(
            "/root/reference/preprocess_stats/"
            "preprocess_stats_smooth_withHand_global_markers.npz")
    else:
        enc = init_smooth_enc(jax.random.PRNGKey(0))
        smooth_stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))

    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=5, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=True,
        motion_prior_smooth_weights=[1e2],
        use_motion_infill_prior=True,
        motion_infill_rec_weights=[2.0],
        motion_infill_contact_weights=[0.1],
        interpenetration=False, contact=False,
    )
    assets = ProxAssets(
        model=model, vposer_params=info["vposer_params"],
        smooth_enc_params=enc, smooth_stats=smooth_stats,
        infill_ae_params=init_infill_ae(jax.random.PRNGKey(2), in_channel=4),
        infill_stats=infill_stats)
    results = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
    assert len(results) == 1
    assert np.isfinite(results[0].final_loss)
    # infill terms actually contributed (recording has 30% occlusion)
    th = results[0].term_history
    assert th is not None and "motion_infill_loss" in th
    assert np.isfinite(th["motion_infill_loss"]).all()
    assert float(np.abs(th["motion_infill_loss"]).sum()) > 0


ASSET_AE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "lemo_tpu", "assets", "infill_ae.npz")


@pytest.mark.skipif(not os.path.exists(ASSET_AE),
                    reason="shipped infill asset absent")
@pytest.mark.slow
def test_s3_runs_from_config_with_shipped_asset():
    """S3 with NO extra assets: AE_infill_path empty -> load_assets falls
    back to the shipped retrained AE + stats (VERDICT r1 item 6 — the
    reference's pretrained blob is missing from its distribution)."""
    import dataclasses

    from lemo_tpu.fitting.prox.driver import load_assets
    from lemo_tpu.testing.synthetic import write_smplx_model_dir

    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=18, seed=5,
                                          occlusion_frac=0.3)
    model_dir = write_smplx_model_dir(tempfile.mkdtemp())

    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        model_folder=model_dir, gender="male",
        batch_size=16, maxiters=4, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False,
        use_motion_infill_prior=True, AE_infill_path="",
        motion_infill_rec_weights=[2.0],
        motion_infill_contact_weights=[0.1],
        interpenetration=False, contact=False,
    )
    assets = load_assets(cfg)
    assert assets.infill_ae_params is not None, "shipped AE not loaded"
    assert assets.infill_stats is not None
    # the recording was generated with its own synthetic body + vposer;
    # inject those (load_assets loaded the on-disk model instead)
    assets = dataclasses.replace(
        assets,
        model=load_model(info["model_dict"], use_pca=True,
                         num_pca_comps=12),
        vposer_params=info["vposer_params"])
    results = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
    th = results[0].term_history
    assert np.isfinite(results[0].final_loss)
    assert float(np.abs(th["motion_infill_loss"]).sum()) > 0


@pytest.mark.skipif(not os.path.exists(REF_STATS), reason="stats absent")
def test_batched_prepass_matches_sequential():
    """make_batched_prepass (one vmapped dispatch for all windows — the
    window-parallel driver path) reproduces run_infill_prepass per
    window."""
    from lemo_tpu.fitting.prox.infill_prepass import (make_batched_prepass,
                                                      run_infill_prepass)

    stats = Local4ChanStats.load(REF_STATS)
    ae = init_infill_ae(jax.random.PRNGKey(0), in_channel=4)
    rng = np.random.RandomState(7)
    W, T = 3, 12
    mv = rng.randn(W, T, 67, 3).astype(np.float32) * 0.2
    mv[..., 2] += 1.0
    mj = rng.randn(W, T, 25, 3).astype(np.float32) * 0.2
    mj[..., 2] += 1.0
    mask = (rng.rand(W, T, 67) > 0.3).astype(np.float32)

    tw_b, cl_b = make_batched_prepass(stats, finetune_steps=4)(
        ae, mv, mj, mask)
    assert tw_b.shape == (W, T - 1, 67, 3) and cl_b.shape == (W, T - 1, 4)
    for i in range(W):
        r = run_infill_prepass(ae, mv[i], mj[i], mask[i], stats,
                               finetune_steps=4)
        np.testing.assert_allclose(np.asarray(tw_b[i]),
                                   np.asarray(r.targets_world),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cl_b[i]),
                                      np.asarray(r.contact_lbl))
