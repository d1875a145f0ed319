"""Self-intersection candidate auto-K + stage-boundary candidate refresh.

cfg.coll_candidates_auto (VERDICT-r4 ask #2): the driver's broad-phase
pre-pass already counts the faces on FIRING energy pairs at the warm
start; auto mode grows K (to a 1024 multiple) to cover them, so the
subset energy is exact at refresh time at any shipped K — the reference's
per-step CUDA BVH (fit_temp_loadprox_slide.py:319-344) is exact every
step, ours must be exact at refresh.

cfg.candidates_refresh_stages (VERDICT-r4 ask #5): multi-stage fits
rebuild the sdf/coll/depth candidate sets from each stage's own warm
start instead of holding stage-0 sets throughout.
"""

import dataclasses
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from lemo_tpu.body_model import load_model  # noqa: E402
from lemo_tpu.config import ProxConfig  # noqa: E402
from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset  # noqa: E402
from lemo_tpu.fitting.prox.driver import (  # noqa: E402
    ProxAssets, _coll_candidate_ids, _coll_pick_K, _warm_start_vertices,
    build_window_static, run_prox_fitting)
from lemo_tpu.ops.intersection import (  # noqa: E402
    batched_self_intersection, intersection_candidate_scores)
from lemo_tpu.testing.synthetic import synthetic_smplx_npz  # noqa: E402
from lemo_tpu.testing.synthetic_prox import \
    write_synthetic_prox_recording  # noqa: E402


def _setup(coll_candidates=32, auto=True, seed=23, pose_scale=0.9):
    base = tempfile.mkdtemp()
    md = synthetic_smplx_npz(smooth_surface=True)
    info = write_synthetic_prox_recording(
        base, num_frames=8, model_dict=md, seed=seed, write_depth=False,
        pose_scale=pose_scale)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=6, maxiters=4, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        init_mode="none", sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=True,
        coll_loss_weights=[1.0], contact=False,
        use_motion_infill_prior=False, use_vposer=False,
        coll_candidates=coll_candidates, coll_candidates_auto=auto,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    return cfg, assets, info, md


def _warm(cfg):
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=cfg.batch_size, flip=False,
                           read_depth=False, read_mask=False)
    return ds.load_window(0)["warm_start"]


class TestCollAutoK:
    def test_pick_K_growth_rule(self):
        cfg = ProxConfig(coll_candidates=64, coll_candidates_auto=True)
        assert _coll_pick_K(cfg, n_active=40, n_within=40, F=30000) == 64
        assert _coll_pick_K(cfg, n_active=100, n_within=100, F=30000) == 1024
        assert _coll_pick_K(cfg, n_active=1500, n_within=1500,
                            F=30000) == 2048
        assert _coll_pick_K(cfg, n_active=29999, n_within=29999,
                            F=30000) == 30000
        off = dataclasses.replace(cfg, coll_candidates_auto=False)
        with pytest.warns(UserWarning, match="FIRING"):
            assert _coll_pick_K(off, n_active=100, n_within=100,
                                F=30000) == 64

    def test_auto_K_exact_at_refresh(self):
        """With a deliberately tiny configured K, auto mode must grow the
        candidate set to cover every firing face — the subset energy then
        equals the full sweep at the warm start."""
        cfg, assets, info, md = _setup(coll_candidates=8, auto=True)
        warm = _warm(cfg)
        verts = _warm_start_vertices(cfg, assets, warm)
        faces = jnp.asarray(md["f"].astype(np.int32))
        _, counts = intersection_candidate_scores(verts[0], faces)
        n_active = int(counts[0])
        assert n_active > 8, "test needs a pose with firing pairs"
        ids = _coll_candidate_ids(cfg, assets, warm)
        assert ids.shape[1] >= n_active
        full = batched_self_intersection(verts[:1], faces)
        sub = batched_self_intersection(verts[:1], faces,
                                        candidate_ids=jnp.asarray(ids[:1]))
        np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                                   rtol=1e-5)

    def test_no_auto_warns_and_keeps_K(self):
        cfg, assets, _, _ = _setup(coll_candidates=8, auto=False)
        warm = _warm(cfg)
        with pytest.warns(UserWarning, match="coll_candidates"):
            ids = _coll_candidate_ids(cfg, assets, warm)
        assert ids.shape[1] == 8


class TestStageRefresh:
    def test_two_stage_candidates_match_exact(self):
        """A 2-stage fit with stage-refreshed coll candidates tracks the
        candidates-off (full-sweep) fit: the stage-1 candidate set is
        rebuilt from the stage-0 solution, so the subset energy is exact
        at the second stage's warm start too."""
        cfg, assets, _, _ = _setup(coll_candidates=8, auto=True)
        two_stage = dict(coll_loss_weights=[1.0, 1.0],
                         data_weights=[1.0, 1.0], maxiters=4)
        cfg_on = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(), **two_stage)
        cfg_off = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(), coll_candidates=0,
            **two_stage)
        res_on = run_prox_fitting(cfg_on, assets, max_windows=1,
                                  verbose=False)[0]
        res_off = run_prox_fitting(cfg_off, assets, max_windows=1,
                                   verbose=False)[0]
        assert res_on.term_history["self_penetration_loss"].shape[0] == 8
        np.testing.assert_allclose(
            res_on.term_history["self_penetration_loss"],
            res_off.term_history["self_penetration_loss"],
            rtol=5e-3, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(res_on.params["transl"]),
            np.asarray(res_off.params["transl"]), atol=5e-5)

    def test_refresh_rebuilds_from_stage_warm(self, monkeypatch):
        """The stage-1 candidate pre-pass must see the stage-0 SOLUTION,
        not the original window warm start."""
        import lemo_tpu.fitting.prox.driver as drv

        cfg, assets, _, _ = _setup(coll_candidates=8, auto=True)
        cfg = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(),
            coll_loss_weights=[1.0, 1.0], data_weights=[1.0, 1.0],
            maxiters=4)
        seen = []
        orig = drv._coll_candidate_ids

        def spy(cfg_, assets_, warm_):
            seen.append(np.asarray(warm_["transl"]).copy())
            return orig(cfg_, assets_, warm_)

        monkeypatch.setattr(drv, "_coll_candidate_ids", spy)
        run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        assert len(seen) == 2
        assert np.abs(seen[1] - seen[0]).max() > 0
