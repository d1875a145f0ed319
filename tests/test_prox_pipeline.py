"""PROX sliding-window pipeline end-to-end on a synthetic recording."""

import os
import tempfile

import numpy as np
import jax
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.config import ProxConfig
from lemo_tpu.data.prox import (ProxRecording, ProxWindowDataset,
                                read_prox_pkl, sliding_windows)
from lemo_tpu.data.stats import GlobalStats
from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
from lemo_tpu.priors.conv_ae import init_smooth_enc, load_torch_state_dict
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording

REF_ENC = "/root/reference/runs/15217/Enc_last_model.pkl"


@pytest.fixture(scope="module")
def prox_base():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=24, seed=1)
    return base, info


class TestSlidingWindows:
    def test_reference_stride(self):
        # 100-frame windows, stride 70 (data_parser_slide.py:199-212)
        w = sliding_windows(240, 100)
        assert w[0] == (0, 100)
        assert w[1] == (70, 170)
        assert w[-1][1] == 240

    def test_short_sequence_single_window(self):
        assert sliding_windows(50, 100) == [(0, 50)]


class TestProxData:
    def test_dataset_loads_window(self, prox_base):
        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        assert rec.scene_name == "SynthArea"
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=16, flip=False)
        assert len(ds.windows) >= 2
        wd = ds.load_window(0)
        assert wd["keypoints"].shape == (16, 118, 3)
        assert wd["scan"].shape == (16, 20000, 3)
        assert wd["scan_mask"].any()
        assert wd["marker_mask"].shape == (16, 67)
        assert wd["warm_start"]["pose_embedding"].shape == (16, 32)

    def test_scan_points_near_body(self, prox_base):
        """Depth unprojection must land points near the true body."""
        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=16, flip=False)
        wd = ds.load_window(0)
        pts = wd["scan"][0][wd["scan_mask"][0]]
        centroid = info["gt_body_centroid"][0]
        assert len(pts) > 50
        med = np.median(pts, axis=0)
        assert np.linalg.norm(med - centroid) < 0.5, (med, centroid)

    def test_cam2world_and_sdf(self, prox_base):
        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        R, t = rec.load_cam2world()
        np.testing.assert_allclose(R, info["R_c2w"], atol=1e-6)
        sdf, lo, hi, normals = rec.load_sdf()
        assert sdf.shape == (48, 48, 48)
        assert normals is not None


class TestProxFit:
    @pytest.mark.slow
    def test_full_pipeline_two_windows(self, prox_base):
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        if os.path.exists(REF_ENC):
            enc = load_torch_state_dict(REF_ENC)
            stats = GlobalStats.load(
                "/root/reference/preprocess_stats/"
                "preprocess_stats_smooth_withHand_global_markers.npz")
        else:
            enc = init_smooth_enc(jax.random.PRNGKey(0))
            stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))

        out_dir = tempfile.mkdtemp()
        cfg = ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=out_dir,
            batch_size=16, maxiters=8, lr=0.005, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            init_mode="none",
            sdf_penetration=True, use_friction=True,
            use_motion_smooth_prior=True,
            motion_prior_smooth_weights=[1e2],
            interpenetration=False, contact=False,
            use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"],
                            smooth_enc_params=enc, smooth_stats=stats)
        results = run_prox_fitting(cfg, assets, max_windows=2, verbose=False)
        assert len(results) == 2
        for r in results:
            assert np.isfinite(r.final_loss)
            assert r.params["transl"].shape == (16, 3)

        # per-frame pkls written in the reference schema, and the second
        # window warm-started from them (resume structure)
        res_dir = os.path.join(out_dir, info["recording_name"], "results")
        frames = sorted(os.listdir(res_dir))
        assert len(frames) >= 16
        rec0 = read_prox_pkl(os.path.join(res_dir, frames[0], "000.pkl"))
        assert rec0["transl"].shape == (3,)
        assert rec0["pose_embedding"].shape == (32,)
        assert rec0["body_pose"].shape == (63,)

    def test_fit_moves_toward_keypoints(self, prox_base):
        """With only the 2-D keypoint term, fitting from noisy warm starts
        must reduce reprojection error."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        out_dir = tempfile.mkdtemp()
        cfg = ProxConfig(
            recording_dir=info["recording_dir"], output_folder=out_dir,
            batch_size=16, maxiters=40, lr=0.01, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        results = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)
        hist = results[0].loss_history
        assert hist[-1] < hist[0], hist[[0, -1]]


class TestFilterFacesWiring:
    def test_pipeline_interpenetration_with_part_filter(self, prox_base):
        """interpenetration: True with a part-segm file: the driver loads
        the pickle, builds the ignore table, and the loss's
        self-penetration term sees it — with ALL part pairs ignored the
        term is exactly zero at every step (dead-code guard for
        build_face_filter wiring; fit_temp_loadprox_slide.py:319-344)."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        from lemo_tpu.fitting.prox.driver import load_part_segm
        from lemo_tpu.testing.synthetic import write_part_segm_pkl

        segm_fn = os.path.join(tempfile.mkdtemp(), "parts_segm.pkl")
        write_part_segm_pkl(segm_fn, np.asarray(model.faces), num_parts=4)
        all_pairs = [f"{a},{b}" for a in range(4) for b in range(4)]
        faces_segm, ign_table = load_part_segm(segm_fn, model.faces,
                                               all_pairs)
        assert ign_table.all()

        def run(assets):
            cfg = ProxConfig(
                recording_dir=info["recording_dir"],
                output_folder=tempfile.mkdtemp(),
                batch_size=8, maxiters=4, lr=0.005, flip=False,
                s2m=False, m2s=False, read_depth=False, read_mask=False,
                init_mode="none", sdf_penetration=False, use_friction=False,
                use_motion_smooth_prior=False, interpenetration=True,
                coll_loss_weights=[1.0],
                contact=False, use_motion_infill_prior=False,
            )
            return run_prox_fitting(cfg, assets, max_windows=1,
                                    verbose=False)[0]

        filtered = run(ProxAssets(model=model,
                                  vposer_params=info["vposer_params"],
                                  faces_segm=faces_segm,
                                  ign_table=ign_table))
        pen = filtered.term_history["self_penetration_loss"]
        np.testing.assert_array_equal(pen, np.zeros_like(pen))
        assert np.isfinite(filtered.final_loss)

    def test_load_part_segm_reads_reference_pickle_format(self):
        """latin1 pickle with 'segm'/'parents' keys, like
        smplx_parts_segm.pkl."""
        from lemo_tpu.fitting.prox.driver import load_part_segm
        from lemo_tpu.testing.synthetic import write_part_segm_pkl

        faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8]])
        fn = os.path.join(tempfile.mkdtemp(), "p.pkl")
        data = write_part_segm_pkl(fn, faces, num_parts=2)
        segm, tab = load_part_segm(fn, faces, ["0,1"])
        np.testing.assert_array_equal(segm, data["segm"])
        assert tab[0, 1] and tab[1, 0]


class TestSceneContactFromConfig:
    def test_contact_runs_from_config_alone(self, prox_base):
        """contact: True with no injected scene_verts: the driver reads
        scenes/<scene>.ply itself (fit_temp_loadprox_slide.py:365-373) and
        the contact term is live."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        cfg = ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=8, maxiters=4, lr=0.005, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            init_mode="none", sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=True, contact_loss_weights=[1.0],
            use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        assert assets.scene_verts is None
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        contact = res.term_history["contact_loss"]
        assert np.isfinite(contact).all() and (contact > 0).all()

    def test_ply_roundtrip_ascii_and_binary(self):
        from lemo_tpu.data.prox import read_ply_vertices, write_ply_vertices

        verts = np.random.RandomState(0).randn(17, 3).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        d = tempfile.mkdtemp()
        pa = os.path.join(d, "a.ply")
        write_ply_vertices(pa, verts, faces)
        np.testing.assert_allclose(read_ply_vertices(pa), verts, atol=1e-5)

        # binary_little_endian with extra vertex props + face list element
        pb = os.path.join(d, "b.ply")
        with open(pb, "wb") as fh:
            hdr = ("ply\nformat binary_little_endian 1.0\n"
                   f"element vertex {len(verts)}\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "property uchar red\n"
                   f"element face {len(faces)}\n"
                   "property list uchar int vertex_indices\n"
                   "end_header\n")
            fh.write(hdr.encode())
            rec = np.zeros(len(verts), dtype=np.dtype(
                [("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("red", "u1")]))
            rec["x"], rec["y"], rec["z"] = verts.T
            fh.write(rec.tobytes())
            for f in faces:
                fh.write(np.uint8(3).tobytes())
                fh.write(f.astype("<i4").tobytes())
        np.testing.assert_allclose(read_ply_vertices(pb), verts, atol=1e-5)


class TestMissingDetections:
    def test_empty_people_frame_gets_zero_confidence(self, prox_base):
        """A frame whose OpenPose json has no detections loads as
        zero-confidence keypoints (the 2-D term vanishes for it; temporal
        priors keep constraining it) instead of crashing — LEMO's
        occluded-frame story (data_parser_slide.py:277-280 analog)."""
        import json as _json
        import shutil

        base, info = prox_base
        # clone the keypoint dir with frame 2 emptied
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        kdir = tempfile.mkdtemp()
        shutil.copytree(rec.keyp_folder, kdir, dirs_exist_ok=True)
        victim = sorted(os.listdir(kdir))[2]
        with open(os.path.join(kdir, victim), "w") as fh:
            _json.dump({"version": 1.3, "people": []}, fh)
        rec.keyp_folder = kdir

        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=8, flip=False, read_depth=False,
                               read_mask=False)
        wd = ds.load_window(0)
        assert wd["keypoints"].shape[0] == 8
        np.testing.assert_array_equal(wd["keypoints"][2], 0.0)
        assert (wd["keypoints"][1, :, 2] > 0).any()  # neighbors intact

    def test_multi_person_json_keeps_all_people(self, prox_base):
        """read_keypoints_all returns every detected person + gender_pd
        (reference Keypoints tuple, data_parser_slide.py:42-101); the
        dataset fits person 0 like the reference."""
        import json as _json

        from lemo_tpu.data.prox import read_keypoints, read_keypoints_all

        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        src = os.path.join(rec.keyp_folder,
                           sorted(os.listdir(rec.keyp_folder))[0])
        with open(src) as fh:
            data = _json.load(fh)
        p2 = dict(data["people"][0])
        p2["gender_pd"] = "female"
        data["people"][0]["gender_pd"] = "male"
        data["people"].append(p2)
        two = os.path.join(tempfile.mkdtemp(), "two_keypoints.json")
        with open(two, "w") as fh:
            _json.dump(data, fh)

        people, gender_pd = read_keypoints_all(two)
        assert len(people) == 2 and people[0].shape == (118, 3)
        assert gender_pd == ["male", "female"]
        np.testing.assert_array_equal(read_keypoints(two), people[0])
        np.testing.assert_array_equal(read_keypoints(two, person_id=1),
                                      people[1])


class TestDepthTermPipeline:
    @pytest.mark.slow
    def test_s2m_m2s_end_to_end(self, prox_base):
        """Depth (s2m/m2s) term through the full pipeline: Kinect depth ->
        scan clouds -> per-frame z-buffer visibility (with body-topology
        backface culling) -> bidirectional Chamfer
        (fitting_temp_slide.py:637-670). The synthetic recording rasterizes
        the true body into its Depth frames, so both terms are live and
        finite."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        cfg = ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=16, maxiters=6, lr=0.005, flip=False,
            s2m=True, m2s=True, read_depth=True, read_mask=True,
            init_mode="none", sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        assert np.isfinite(res.final_loss)
        s2m = res.term_history["s2m_dist"]
        m2s = res.term_history["m2s_dist"]
        # scan points exist near the body -> both terms engage
        assert np.isfinite(s2m).all() and np.isfinite(m2s).all()
        assert (s2m > 0).all() and (m2s > 0).all()


class TestLbfgslsWindow:
    def test_pipeline_with_lbfgsls(self, prox_base):
        """optim_type: lbfgsls end-to-end on a PROX window (the reference's
        shipped alternative optimizer, optim_factory.py:27-65): loss
        decreases, term history is honest per-step, NaN guard and chunked
        dispatch are active, and the second window reuses the compiled
        stepper + freezes its overlap head."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        cfg = ProxConfig(
            recording_dir=info["recording_dir"],
            output_folder=tempfile.mkdtemp(),
            batch_size=16, maxiters=8, lr=0.005, flip=False,
            optim_type="lbfgsls", steps_per_dispatch=3,  # 3+3+2 dispatches
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            init_mode="none", sdf_penetration=True, use_friction=True,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        results = run_prox_fitting(cfg, assets, max_windows=2,
                                   verbose=False)
        assert len(results) == 2
        for r in results:
            assert np.isfinite(r.final_loss)
            assert r.loss_history.shape == (8,)
            # strong-Wolfe L-BFGS must strictly reduce a smooth objective
            assert r.loss_history[-1] < r.loss_history[0]
            # honest per-step history: the keypoint term varies across
            # steps (a repeated final snapshot would be constant)
            jl = r.term_history["joint_loss"]
            assert jl.shape == (8,)
            assert np.unique(jl).size > 1
        # second window: frozen head frames keep their warm-start transl
        wd1 = ProxWindowDataset(
            ProxRecording.from_recording_dir(info["recording_dir"]),
            output_params_dir=os.path.join(
                cfg.output_folder, info["recording_name"]),
            batch_size=16, flip=False, read_depth=False,
            read_mask=False).load_window(1)
        erase_n = int(16 * 0.15)
        np.testing.assert_allclose(
            results[1].params["transl"][:erase_n],
            np.asarray(wd1["warm_start"]["transl"])[:erase_n], atol=1e-6)

    def test_lbfgs_nan_guard_freezes(self):
        """A loss that goes NaN mid-run freezes the iterate instead of
        poisoning it."""
        import jax.numpy as jnp

        from lemo_tpu.fitting.lbfgs import make_lbfgs_stepper

        def loss(v):
            x = v["x"]
            # NaN once x drifts past 0.5
            val = jnp.where(x.sum() > 0.5, jnp.nan, ((x - 1.0) ** 2).sum())
            return val, {"v": val}

        init, run, unr = make_lbfgs_stepper(loss, {"x": jnp.zeros(2)},
                                            has_aux=True)
        st, losses, _ = run(init({"x": jnp.zeros(2)}), 12)
        x = np.asarray(unr(st[0])["x"])
        assert np.isfinite(x).all()


class TestStepsPerDispatch:
    def test_chunked_dispatch_identical(self, prox_base):
        """steps_per_dispatch only changes dispatch granularity: Adam
        state is carried across chunks, so the result is bit-identical."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        enc = init_smooth_enc(jax.random.PRNGKey(0))
        stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"],
                            smooth_enc_params=enc, smooth_stats=stats)

        def run(spd):
            cfg = ProxConfig(
                recording_dir=info["recording_dir"],
                output_folder=tempfile.mkdtemp(),
                batch_size=16, maxiters=6, lr=0.005, flip=False,
                s2m=False, m2s=False, read_depth=False, read_mask=False,
                init_mode="none", sdf_penetration=True, use_friction=True,
                use_motion_smooth_prior=False, interpenetration=False,
                contact=False, use_motion_infill_prior=False,
                steps_per_dispatch=spd,
            )
            return run_prox_fitting(cfg, assets, max_windows=1,
                                    verbose=False)[0]

        r_all = run(100)   # one 6-step dispatch
        r_two = run(2)     # three 2-step dispatches
        np.testing.assert_array_equal(np.asarray(r_all.params["transl"]),
                                      np.asarray(r_two.params["transl"]))
        assert r_all.final_loss == r_two.final_loss


class TestSdfCandidates:
    def test_pipeline_with_candidates_runs_and_matches(self, prox_base):
        """With a candidate budget covering every near-scene vertex, the
        candidate-sampled fit matches the full-vertex fit."""
        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        common = dict(
            recording_dir=info["recording_dir"],
            batch_size=16, maxiters=6, lr=0.005, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            init_mode="none", sdf_penetration=True, use_friction=True,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        full = run_prox_fitting(
            ProxConfig(output_folder=tempfile.mkdtemp(), **common),
            assets, max_windows=1, verbose=False)
        cand = run_prox_fitting(
            ProxConfig(output_folder=tempfile.mkdtemp(),
                       sdf_candidates=model.num_verts,  # cover everything
                       **common),
            assets, max_windows=1, verbose=False)
        # K = V covers every vertex -> identical penetration term
        np.testing.assert_allclose(cand[0].loss_history,
                                   full[0].loss_history, rtol=1e-5)

        small = run_prox_fitting(
            ProxConfig(output_folder=tempfile.mkdtemp(),
                       sdf_candidates=64, **common),
            assets, max_windows=1, verbose=False)
        assert np.isfinite(small[0].final_loss)

    def test_candidate_ids_warning_and_clamp(self, prox_base):
        """K smaller than the near-scene vertex count warns; K > V clamps."""
        import warnings as _w

        base, info = prox_base
        from lemo_tpu.config import ProxConfig
        from lemo_tpu.fitting.prox.driver import (ProxAssets,
                                                  _sdf_candidate_ids)

        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=8, flip=False)
        wd = ds.load_window(0)
        R, t = rec.load_cam2world()
        sdf, gmin, gmax, _ = rec.load_sdf()
        assets = ProxAssets(model=model,
                            vposer_params=info["vposer_params"])
        cfg = ProxConfig(recording_dir=info["recording_dir"],
                         output_folder="/tmp/y", sdf_candidates=4,
                         sdf_candidates_margin=1e9)  # everything is "near"
        with _w.catch_warnings(record=True) as rec_w:
            _w.simplefilter("always")
            ids = _sdf_candidate_ids(cfg, assets, wd["warm_start"], R, t,
                                     sdf, gmin, gmax)
        assert ids.shape == (4,)
        assert any("sdf_candidates" in str(x.message) for x in rec_w)

        cfg2 = ProxConfig(recording_dir=info["recording_dir"],
                          output_folder="/tmp/y",
                          sdf_candidates=10 * model.num_verts)
        ids2 = _sdf_candidate_ids(cfg2, assets, wd["warm_start"], R, t,
                                  sdf, gmin, gmax)
        assert ids2.shape == (model.num_verts,)
        assert len(set(ids2.tolist())) == model.num_verts


ALL_TERM_KEYS = ["joint_loss", "pprior_loss", "shape_loss",
                 "angle_prior_loss", "s2m_dist", "m2s_dist",
                 "sdf_penetration_loss", "loss_fric_tangent",
                 "loss_fric_normal", "contact_loss",
                 "self_penetration_loss", "motion_prior_smooth_loss",
                 "motion_infill_loss"]


def _all_terms_setup(info, **cfg_overrides):
    """(cfg, assets) with EVERY loss family enabled (the
    cfg_files/PROXD_temp_S3_all_terms.yaml shape on synthetic assets)."""
    import jax as _jax

    from lemo_tpu.data.stats import Local4ChanStats
    from lemo_tpu.fitting.prox.driver import load_part_segm
    from lemo_tpu.priors.conv_ae import init_infill_ae
    from lemo_tpu.testing.synthetic import write_part_segm_pkl

    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    segm_fn = os.path.join(tempfile.mkdtemp(), "parts_segm.pkl")
    write_part_segm_pkl(segm_fn, np.asarray(model.faces), num_parts=4)
    faces_segm, ign_table = load_part_segm(segm_fn, model.faces, ["0,3"])

    if os.path.exists(REF_ENC):
        enc = load_torch_state_dict(REF_ENC)
        smooth_stats = GlobalStats.load(
            "/root/reference/preprocess_stats/"
            "preprocess_stats_smooth_withHand_global_markers.npz")
    else:
        enc = init_smooth_enc(jax.random.PRNGKey(0))
        smooth_stats = GlobalStats(np.zeros((1, 1, 243)), np.ones(243))
    asset_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lemo_tpu", "assets")
    infill_stats = Local4ChanStats.load(
        os.path.join(asset_dir, "infill_stats.npz"))

    kw = dict(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=6, lr=0.005, flip=False,
        init_mode="none",
        s2m=True, m2s=True, read_depth=True, read_mask=True,
        s2m_weights=[5e2], m2s_weights=[1.0],
        sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=True,
        motion_prior_smooth_weights=[1e2],
        use_motion_infill_prior=True,
        motion_infill_rec_weights=[2.0],
        motion_infill_contact_weights=[0.1],
        interpenetration=True, coll_loss_weights=[1e-5],
        contact=True, contact_loss_weights=[1.0],
    )
    kw.update(cfg_overrides)
    cfg = ProxConfig(**kw)
    assets = ProxAssets(
        model=model, vposer_params=info["vposer_params"],
        smooth_enc_params=enc, smooth_stats=smooth_stats,
        infill_ae_params=init_infill_ae(_jax.random.PRNGKey(2),
                                        in_channel=4),
        infill_stats=infill_stats,
        faces_segm=faces_segm, ign_table=ign_table)
    return cfg, assets


class TestAllTermsPipeline:
    @pytest.mark.slow
    def test_every_loss_family_composes(self, prox_base):
        """All 11 loss families live in ONE fit (the reference ships
        s2m/m2s/contact/interpenetration off because of their CUDA-stack
        cost; cfg_files/PROXD_temp_S3_all_terms.yaml turns everything on).
        Every term must be finite and engaged, and the fit must improve."""
        base, info = prox_base
        cfg, assets = _all_terms_setup(info)
        res = run_prox_fitting(cfg, assets, max_windows=1, verbose=False)[0]
        assert np.isfinite(res.final_loss)
        assert res.loss_history[-1] < res.loss_history[0]
        th = res.term_history
        for k in ALL_TERM_KEYS:
            assert np.isfinite(th[k]).all(), k
        # data + scene terms actually contribute energy
        for k in ("joint_loss", "s2m_dist", "m2s_dist", "contact_loss"):
            assert float(np.abs(th[k]).sum()) > 0, k

    @pytest.mark.slow
    def test_all_terms_window_parallel(self):
        """The flagship multi-chip path (window axis sharded over the
        mesh) composes with EVERY loss family — infill targets, part
        filtering, depth Chamfer, and contact all thread through the
        batched window fitter.

        Runs on a deliberately coarse mesh (256 verts) and 2 iters/stage:
        the composition is what's under test, not convergence — the
        dense O(F^2) intersection inside the vmapped fit priced the
        full-size variant at ~30 min on a 1-CPU box. Polish is off:
        it would compile a SECOND sequential all-terms fitter (~4 min
        on that box) and its composition is covered by
        test_window_parallel.py::test_polish_restores_sequential_stitching plus
        the sequential all-terms test above."""
        from lemo_tpu.testing.synthetic import synthetic_smplx_npz

        base = tempfile.mkdtemp()
        info = write_synthetic_prox_recording(
            base, num_frames=16,
            model_dict=synthetic_smplx_npz(num_verts=256), seed=5)
        cfg, assets = _all_terms_setup(
            info, window_parallel=True, window_polish_iters=0,
            batch_size=10, maxiters=2)
        results = run_prox_fitting(cfg, assets, max_windows=2,
                                   verbose=False)
        assert len(results) == 2
        for res in results:
            assert np.isfinite(res.final_loss)
            for k in ALL_TERM_KEYS:
                assert np.isfinite(res.term_history[k]).all(), k


class TestEvalProx:
    def test_evaluate_recording_on_proxd_warm_starts(self, prox_base):
        """eval_prox metrics on the synthetic PROXD pkls (GT + noise):
        every metric present, in range, and the reprojection error small
        because the warm starts ARE near the keypoint-generating body."""
        base, info = prox_base
        from lemo_tpu.cli.eval_prox import (evaluate_recording,
                                            load_fitted_frames)
        from lemo_tpu.fitting.prox.camera import PerspectiveCamera

        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        names, params = load_fitted_frames(
            os.path.join(rec.prox_params_dir, "results"))
        assert len(names) == 24
        from lemo_tpu.testing.synthetic_prox import CX, CY, FX, FY

        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        camera = PerspectiveCamera(FX, FY, (CX, CY))
        res = evaluate_recording(names, params, model, rec, camera,
                                 chunk=16, keyp_folder=rec.keyp_folder)
        assert res["frames"] == 24
        assert 0.0 <= res["non_collision"] <= 1.0
        assert 0.0 <= res["contact"] <= 1.0
        assert np.isfinite(res["accel_m_s2"])
        assert res["frames_with_detection"] == 24
        # warm starts are GT + small noise -> reprojection within tens of px
        assert res["reproj_err_px"] < 80.0

    def test_eval_prox_cli_parser(self):
        from lemo_tpu.cli.eval_prox import build_parser

        a = build_parser().parse_args(
            ["--fitting_dir", "/a", "--recording_dir", "/b",
             "--body_model_path", "/c"])
        assert a.contact_thresh == 0.02


class TestWindowPrefetch:
    def test_prefetch_matches_unprefetched(self, prox_base):
        """Prefetching only moves fit-independent host loads onto a
        thread; warm starts still read after the previous window saved.
        Two-window fits with prefetch on/off must be identical."""
        import dataclasses

        base, info = prox_base
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        common = dict(
            recording_dir=info["recording_dir"],
            batch_size=16, maxiters=5, lr=0.005, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            init_mode="none", sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        outs = {}
        for pf in (True, False):
            cfg = ProxConfig(output_folder=tempfile.mkdtemp(),
                             prefetch_windows=pf, **common)
            assets = ProxAssets(model=model,
                                vposer_params=info["vposer_params"])
            outs[pf] = run_prox_fitting(cfg, assets, max_windows=2,
                                        verbose=False)
        for ra, rb in zip(outs[True], outs[False]):
            assert ra.final_loss == rb.final_loss
            for k in ra.params:
                np.testing.assert_array_equal(np.asarray(ra.params[k]),
                                              np.asarray(rb.params[k]))


def test_result_pkls_carry_camera_params():
    """Reference schema parity: each result pkl serializes the frozen
    camera pose params (fit_temp_loadprox_slide.py:577-580)."""
    import pickle

    from lemo_tpu.fitting.prox.driver import _CAMERA_PKL_PARAMS
    from lemo_tpu.fitting.prox.window import WindowResult, save_window_pkls

    r = WindowResult(params={"transl": np.zeros((2, 3))},
                     pose_embedding=np.zeros((2, 32)),
                     body_pose=np.zeros((2, 63)),
                     final_loss=0.0, loss_history=np.zeros(1))
    paths = save_window_pkls(r, ["f1", "f2"], tempfile.mkdtemp(),
                             camera_params=_CAMERA_PKL_PARAMS)
    rec = pickle.load(open(paths[0], "rb"))
    assert rec["camera_rotation"].shape == (1, 3, 3)
    assert rec["camera_translation"].shape == (1, 3)


class TestFrameSelection:
    """start/step/frame_ids frame selection (data_parser_slide.py:188-191)
    with masks kept frame-aligned (the reference indexes the unsliced mask
    with post-slice positions — a latent misalignment this build fixes)."""

    def test_start_step_slicing(self, prox_base):
        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        full = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                                 batch_size=8, flip=False, read_depth=False)
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=8, flip=False, read_depth=False,
                               start=4, step=2)
        assert ds.frame_names == full.frame_names[4::2]
        np.testing.assert_array_equal(ds.marker_masks,
                                      full.marker_masks[4::2])

    def test_frame_ids_one_based(self, prox_base):
        base, info = prox_base
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        full = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                                 batch_size=8, flip=False, read_depth=False)
        ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                               batch_size=8, flip=False, read_depth=False,
                               frame_ids=[1, 3, 5, 7, 9, 11, 13, 15])
        assert ds.frame_names == [full.frame_names[i]
                                  for i in (0, 2, 4, 6, 8, 10, 12, 14)]

    def test_config_accepts_all_reference_flags(self):
        """Every flag temp_prox/cmd_parser.py declares is a ProxConfig
        field (or --config itself)."""
        import dataclasses as dc
        import re
        src = open("/root/reference/temp_prox/cmd_parser.py").read()
        ref = set(re.findall(r"add_argument\('--([a-z_0-9]+)", src))
        fields = {f.name for f in dc.fields(ProxConfig)}
        missing = ref - fields - {"config"}
        assert not missing, f"missing reference flags: {sorted(missing)}"


def test_save_meshes_and_render_results_outputs(tmp_path):
    """cfg.save_meshes / cfg.render_results produce the reference's
    per-window outputs (fit_temp_loadprox_slide.py:596-704):
    <output>/<mesh_folder>/<frame>/000.ply body meshes and
    <output>/images/<frame>.png overlay renders."""
    import jax

    from lemo_tpu.body_model import load_model
    from lemo_tpu.data.prox import read_ply_mesh
    from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
    from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording

    info = write_synthetic_prox_recording(str(tmp_path / "p"), num_frames=8,
                                          seed=2, write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    out = str(tmp_path / "out")
    cfg = ProxConfig(
        recording_dir=info["recording_dir"], output_folder=out,
        batch_size=8, maxiters=2, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
        save_meshes=True, render_results=True,
        # small virtual camera keeps the software overlay raster fast
        focal_length_x=50.0, focal_length_y=50.0,
        camera_center_x=40.0, camera_center_y=30.0)
    run_prox_fitting(cfg, ProxAssets(model=model,
                                     vposer_params=info["vposer_params"]),
                     max_windows=1, verbose=False)
    root = os.path.join(out, info["recording_name"])
    mesh_frames = sorted(os.listdir(os.path.join(root, "meshes")))
    assert len(mesh_frames) == 8
    v, f = read_ply_mesh(os.path.join(root, "meshes", mesh_frames[0],
                                      "000.ply"))
    assert v.shape == (model.num_verts, 3)
    assert f is not None and f.shape[1] == 3
    imgs = sorted(os.listdir(os.path.join(root, "images")))
    assert len(imgs) == 8 and imgs[0].endswith(".png")
