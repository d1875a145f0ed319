"""Temporal-coherence candidates for the depth Chamfer terms.

cfg.depth_candidates (losses.depth_terms candidate branch +
driver._depth_candidate_data) subsets the s2m/m2s clouds to the K scan
points / K body vertices nearest their warm-start counterparts and
freezes the remainder at warm-start values — the amortized analog of the
reference's full-cloud per-iteration Chamfer
(fitting_temp_slide.py:637-670). Contract (the sdf_candidates /
coll_candidates contract): the subset energy reproduces the exact term
at refresh time BY CONSTRUCTION at any K, and K=full reproduces the
whole fit.
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
    ProxAssets, _depth_candidate_data, _warm_start_vertices,
    build_window_static, run_prox_fitting, weights_from_config)
from lemo_tpu.fitting.prox.losses import depth_terms  # noqa: E402
from lemo_tpu.testing.synthetic_prox import \
    write_synthetic_prox_recording  # noqa: E402


def _setup(num_frames=12, batch_size=8, depth_candidates=0, seed=3):
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=num_frames,
                                          seed=seed, write_depth=True)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=batch_size, maxiters=4, lr=0.005, flip=False,
        s2m=True, m2s=True, read_depth=True, read_mask=True,
        init_mode="none", sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
        depth_candidates=depth_candidates,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    return cfg, assets, info


def _window_static(cfg, assets):
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=cfg.batch_size, flip=False,
                           read_depth=True, read_mask=True)
    wd = ds.load_window(0)
    st = build_window_static(cfg, assets, rec, wd, ds.joint_weights())
    return st, wd


class TestDepthCandidates:
    def test_refresh_energy_exact_at_small_K(self):
        """At the warm start (= refresh time) the candidate energy equals
        the full-cloud energy for ANY K: the frozen remainders are
        defined as full-minus-candidate warm values."""
        cfg, assets, _ = _setup(depth_candidates=48)
        st, wd = _window_static(cfg, assets)
        assert st.depth_scan_cand_ids is not None
        assert st.depth_scan_cand_ids.shape[1] == 48
        st_exact = dataclasses.replace(
            st, depth_scan_cand_ids=None, depth_vert_cand_ids=None,
            s2m_frozen=None, m2s_frozen=None)
        w = weights_from_config(cfg)
        verts_warm = _warm_start_vertices(cfg, assets, wd["warm_start"])
        s2m_c, m2s_c = depth_terms(verts_warm, st, w)
        s2m_e, m2s_e = depth_terms(verts_warm, st_exact, w)
        np.testing.assert_allclose(float(s2m_c), float(s2m_e), rtol=2e-4)
        np.testing.assert_allclose(float(m2s_c), float(m2s_e), rtol=2e-4)
        assert float(s2m_e) > 0 and float(m2s_e) > 0

    def test_moved_body_diverges_but_stays_close(self):
        """Away from the warm start the subset energy is an approximation:
        it must move WITH the exact energy (candidates carry the live
        gradient paths), not stay glued to the frozen value."""
        cfg, assets, _ = _setup(depth_candidates=512)
        st, wd = _window_static(cfg, assets)
        st_exact = dataclasses.replace(
            st, depth_scan_cand_ids=None, depth_vert_cand_ids=None,
            s2m_frozen=None, m2s_frozen=None)
        w = weights_from_config(cfg)
        verts_warm = _warm_start_vertices(cfg, assets, wd["warm_start"])
        s2m_w, _ = depth_terms(verts_warm, st_exact, w)
        moved = verts_warm + jnp.asarray([0.02, 0.0, 0.0])
        s2m_c, _ = depth_terms(moved, st, w)
        s2m_e, _ = depth_terms(moved, st_exact, w)
        # exact term changed with the motion; candidate term tracks it
        assert abs(float(s2m_e) - float(s2m_w)) > 0
        np.testing.assert_allclose(float(s2m_c), float(s2m_e), rtol=0.05)

    def test_full_K_reproduces_exact_fit(self):
        """K >= max(S, V): the candidate sets are the whole clouds and the
        frozen remainders vanish — the fit matches the exact one."""
        cfg, assets, info = _setup(depth_candidates=0)
        res_exact = run_prox_fitting(cfg, assets, max_windows=1,
                                     verbose=False)[0]
        V = assets.model.num_verts
        rec = ProxRecording.from_recording_dir(cfg.recording_dir)
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=cfg.batch_size, flip=False,
                               read_depth=True, read_mask=True)
        S = ds.load_window(0)["scan"].shape[1]
        cfg_full = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(),
            depth_candidates=max(S, V),
            # bit-parity check: frozen visibility intentionally diverges
            # from the per-step z-buffer once the body moves
            depth_frozen_visibility=False)
        res_cand = run_prox_fitting(cfg_full, assets, max_windows=1,
                                    verbose=False)[0]
        np.testing.assert_allclose(
            res_cand.term_history["s2m_dist"],
            res_exact.term_history["s2m_dist"], rtol=1e-3)
        np.testing.assert_allclose(
            res_cand.term_history["m2s_dist"],
            res_exact.term_history["m2s_dist"], rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(res_cand.params["transl"]),
            np.asarray(res_exact.params["transl"]), atol=1e-4)

    def test_pipeline_runs_with_candidates(self):
        """End-to-end fit with a small candidate budget: terms live,
        finite, loss history honest."""
        cfg, assets, _ = _setup(depth_candidates=256)
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        assert np.isfinite(res.final_loss)
        s2m = res.term_history["s2m_dist"]
        m2s = res.term_history["m2s_dist"]
        assert np.isfinite(s2m).all() and np.isfinite(m2s).all()
        assert (s2m > 0).all() and (m2s > 0).all()

    def test_margin_warning_when_K_too_small(self):
        """More scan points within the margin than K at warm start →
        the pre-pass warns (the coll_candidates idiom)."""
        cfg, assets, _ = _setup(depth_candidates=8)
        cfg = dataclasses.replace(cfg, depth_candidates_margin=10.0)
        with pytest.warns(UserWarning, match="depth_candidates"):
            _window_static(cfg, assets)

    def test_two_stage_refresh_matches_exact(self):
        """Stage-boundary refresh (cfg.candidates_refresh_stages): a
        2-stage fit with a small candidate budget tracks the exact fit —
        stage 1's candidate sets and frozen remainders are rebuilt from
        the stage-0 solution, so the energy is exact at BOTH stages' warm
        starts."""
        cfg, assets, _ = _setup(depth_candidates=512)
        # live visibility: this test pins the stage-refresh mechanism
        # against the exact fit; frozen visibility is a separate,
        # intentionally-approximate lever (legitimately ~4% off here)
        two_stage = dict(s2m_weights=[5e2, 5e2], m2s_weights=[1.0, 1.0],
                         maxiters=4, depth_frozen_visibility=False)
        cfg_on = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(), **two_stage)
        cfg_off = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(), depth_candidates=0,
            **two_stage)
        res_on = run_prox_fitting(cfg_on, assets, max_windows=1,
                                  verbose=False)[0]
        res_off = run_prox_fitting(cfg_off, assets, max_windows=1,
                                   verbose=False)[0]
        assert res_on.term_history["s2m_dist"].shape[0] == 8
        for term in ("s2m_dist", "m2s_dist"):
            np.testing.assert_allclose(
                res_on.term_history[term], res_off.term_history[term],
                rtol=0.02)
        np.testing.assert_allclose(
            np.asarray(res_on.params["transl"]),
            np.asarray(res_off.params["transl"]), atol=2e-4)

    def test_refresh_exactness_at_stage_boundary(self, monkeypatch):
        """The stage-1 frozen remainders are recomputed from the stage-0
        solution (not reused from the original warm start): spy on the
        pre-pass and check it runs once per stage with moving geometry."""
        import lemo_tpu.fitting.prox.driver as drv

        cfg, assets, _ = _setup(depth_candidates=256)
        cfg = dataclasses.replace(
            cfg, output_folder=tempfile.mkdtemp(),
            s2m_weights=[5e2, 5e2], m2s_weights=[1.0, 1.0], maxiters=4)
        seen = []
        orig = drv._depth_candidate_data

        def spy(cfg_, assets_, warm_, st_):
            seen.append(np.asarray(warm_["transl"]).copy())
            return orig(cfg_, assets_, warm_, st_)

        monkeypatch.setattr(drv, "_depth_candidate_data", spy)
        run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        assert len(seen) == 2
        assert np.abs(seen[1] - seen[0]).max() > 0
