"""Window-parallel PROX fitting on the 8-device virtual mesh."""

import tempfile

import numpy as np
import jax
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.config import ProxConfig
from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_window_parallel_matches_sequential_first_window():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=9,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)

    common = dict(
        recording_dir=info["recording_dir"],
        batch_size=16, maxiters=6, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])

    seq = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), **common),
        assets, max_windows=3, verbose=False)
    par = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), window_parallel=True,
                   window_polish_iters=0, **common),
        assets, max_windows=3, verbose=False)

    assert len(seq) == len(par) == 3
    # window 0 has no overlap dependence: parallel == sequential exactly
    np.testing.assert_allclose(par[0].params["transl"],
                               seq[0].params["transl"], atol=2e-5)
    np.testing.assert_allclose(par[0].loss_history, seq[0].loss_history,
                               rtol=2e-4)
    # later windows: same warm starts, finite losses (stitching semantics
    # differ by design — overlap frames keep warm-start values)
    for r in par[1:]:
        assert np.isfinite(r.final_loss)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_polish_restores_sequential_stitching():
    """The sequential-polish pass (cfg.window_polish_iters) re-warm-starts
    each window's overlap head from the previous window's fresh solution,
    so polished window-parallel output converges to the sequential
    fitter's (fitting_temp_slide.py:283-289 stitching semantics)."""
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=11,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    # keypoint-only loss: frames are independent, so stitching is the ONLY
    # difference between the modes
    common = dict(
        recording_dir=info["recording_dir"],
        batch_size=16, maxiters=30, lr=0.01, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])

    seq = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), **common),
        assets, max_windows=3, verbose=False)
    par0 = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), window_parallel=True,
                   window_polish_iters=0, **common),
        assets, max_windows=3, verbose=False)
    parP = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), window_parallel=True,
                   window_polish_iters=30, **common),
        assets, max_windows=3, verbose=False)

    erase_n = int(16 * 0.15)  # frames frozen at the head of each window
    ov_n = 16 - int(16 * 0.7)  # overlap with the previous window
    for w in (1, 2):
        # The stitching semantics live in the OVERLAP frames: sequential
        # mode warm-starts them from the previous window's solution
        # (own-output-first pkls); the polish pass reproduces exactly that
        # (frozen head = previous solution verbatim; the rest re-optimized
        # from it). Tail frames get extra polish iterations by design, so
        # only the overlap region is compared.
        t_seq = np.asarray(seq[w].params["transl"])[:ov_n]
        d0 = np.abs(
            np.asarray(par0[w].params["transl"])[:ov_n] - t_seq).mean()
        dP = np.abs(
            np.asarray(parP[w].params["transl"])[:ov_n] - t_seq).mean()
        assert dP < d0, (w, dP, d0)
        # w=1: the previous window (0) is identical in both modes, so the
        # frozen head is near bit-parity and the re-optimized overlap
        # follows the same Adam trajectory from the same init. w>=2
        # inherits window 1's tail, which converged further under polish
        # (extra iterations) — only the dP < d0 improvement is asserted.
        if w == 1:
            np.testing.assert_allclose(
                np.asarray(parP[w].params["transl"])[:erase_n],
                t_seq[:erase_n], atol=5e-4)
            np.testing.assert_allclose(
                np.asarray(parP[w].params["transl"])[erase_n:ov_n],
                t_seq[erase_n:ov_n], atol=5e-3)


def test_fold_matches_vmap_trajectories():
    """make_batched_window_fitter impl='fold' (one [W*T] folded forward,
    fused-path compatible) must reproduce impl='vmap' — window parameters
    are disjoint and the optimizer is elementwise, so the trajectories
    agree up to f32 reassociation."""
    from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
    from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
    from lemo_tpu.fitting.prox.driver import (build_window_static,
                                              weights_from_config)
    from lemo_tpu.fitting.prox.window import make_batched_window_fitter
    import dataclasses as dc
    import jax.numpy as jnp

    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=13,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=6, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=cfg.batch_size, flip=False,
                           read_depth=False, read_mask=False)
    jw = ds.joint_weights()
    mapper = smpl_to_openpose(cfg.model_type, cfg.use_hands, cfg.use_face,
                              cfg.use_face_contour)
    W = min(3, len(ds.windows))
    window_data = [ds.load_window(i) for i in range(W)]
    statics = [build_window_static(cfg, assets, rec, wd, jw)
               for wd in window_data]
    per_w = {"gt_joints", "joints_conf", "scan", "scan_mask",
             "marker_mask", "infill_targets", "infill_contact_lbl",
             "sdf_candidate_ids"}
    batch_kw = {}
    for f in dc.fields(statics[0].__class__):
        vals = [getattr(s, f.name) for s in statics]
        batch_kw[f.name] = (jnp.stack(vals)
                            if f.name in per_w and vals[0] is not None
                            else vals[0])
    static_batch = statics[0].__class__(**batch_kw)
    warm = {k: jnp.stack([jnp.asarray(wd["warm_start"][k])
                          for wd in window_data])
            for k in window_data[0]["warm_start"]}
    first_mask = jnp.asarray([i == 0 for i in range(W)])
    weights = weights_from_config(cfg)

    outs = {}
    for impl in ("fold", "vmap"):
        fitter = make_batched_window_fitter(
            model, assets.vposer_params, mapper, statics[0], weights,
            maxiters=cfg.maxiters, lr=cfg.lr, mesh=None,
            steps_per_dispatch=cfg.steps_per_dispatch, impl=impl)
        outs[impl] = fitter(static_batch, warm, first_mask)

    ov_f, betas_f, losses_f, terms_f = outs["fold"]
    ov_v, betas_v, losses_v, terms_v = outs["vmap"]
    assert losses_f.shape == losses_v.shape
    np.testing.assert_allclose(losses_f, losses_v, rtol=2e-3, atol=2e-5)
    for k in ov_f:
        np.testing.assert_allclose(np.asarray(ov_f[k]),
                                   np.asarray(ov_v[k]),
                                   rtol=6e-2, atol=2e-3, err_msg=k)
    for k in terms_f:
        np.testing.assert_allclose(np.asarray(terms_f[k]),
                                   np.asarray(terms_v[k]),
                                   rtol=5e-3, atol=1e-5, err_msg=k)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_jacobi_polish_histories_and_handoff():
    """The Jacobi polish (window_polish_mode='jacobi', the default) runs
    batched rounds with heads re-injected between them. Asserts the
    VERDICT-r4 #8 observability contract — every window's term history is
    the per-stage records PLUS one record per polish round (no length-1
    overwrite) — and the final head hand-off: each window's frozen head
    frames equal the previous window's final tail verbatim."""
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=17,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    maxiters, polish, rounds = 10, 6, 3
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=maxiters, lr=0.01, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
        window_parallel=True, window_polish_iters=polish,
        window_polish_mode="jacobi", window_polish_rounds=rounds,
        steps_per_dispatch=100,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    res = run_prox_fitting(cfg, assets, max_windows=3, verbose=False)
    assert len(res) == 3

    # per-round chunking: the fitter's compiled chunk is
    # min(steps_per_dispatch, maxiters) and every round runs at least
    # one chunk, so the driver clamps the round count to the configured
    # polish budget (here polish=6 < chunk=10 -> 1 round of one chunk)
    chunk = min(cfg.steps_per_dispatch, maxiters)
    rounds_eff = max(1, min(rounds,
                            polish // chunk if polish >= chunk else 1))
    round_len = -(-max(1, polish // rounds_eff) // chunk) * chunk
    n_stages = cfg.n_stages
    for r in res:
        assert len(r.loss_history) == maxiters + rounds_eff * round_len
        for k, v in r.term_history.items():
            assert v.shape[0] == n_stages + rounds_eff, (k, v.shape)
        assert np.isfinite(r.final_loss)

    # final head hand-off: window w's frozen head == window w-1's tail
    from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=cfg.batch_size, flip=False,
                           read_depth=False, read_mask=False)
    erase_head = int(16 * 0.15)
    for w in (1, 2):
        s_prev, e_prev = ds.windows[w - 1]
        s_cur, _ = ds.windows[w]
        ov_n = e_prev - s_cur
        off = s_cur - s_prev
        n = min(ov_n, erase_head)
        np.testing.assert_array_equal(
            np.asarray(res[w].params["transl"])[:n],
            np.asarray(res[w - 1].params["transl"])[off:off + n])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sequential_polish_term_history_concat():
    """window_polish_mode='sequential' (the Gauss-Seidel chain): polished
    windows append the polish pass's full per-step term history to the
    stage records instead of overwriting with a length-1 record
    (VERDICT-r4 weakness #7)."""
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=19,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    maxiters, polish = 8, 6
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=maxiters, lr=0.01, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
        window_parallel=True, window_polish_iters=polish,
        window_polish_mode="sequential",
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    res = run_prox_fitting(cfg, assets, max_windows=3, verbose=False)
    n_stages = cfg.n_stages
    for k, v in res[0].term_history.items():   # window 0: never polished
        assert v.shape[0] == n_stages, (k, v.shape)
    for r in res[1:]:
        for k, v in r.term_history.items():
            assert v.shape[0] == n_stages + polish, (k, v.shape)
        assert len(r.loss_history) == maxiters + polish


def test_polish_override_hits_chunk_cache():
    """The Jacobi polish rounds must reuse the main fit's compiled chunk
    program: a dtype/weak-type mismatch between the derived erase_n and
    the override array caused a silent 120 s retrace on the first polish
    round (fixed by normalizing to strong int32)."""
    from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
    from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
    from lemo_tpu.fitting.prox.driver import (build_window_static,
                                              weights_from_config)
    from lemo_tpu.fitting.prox.window import make_batched_window_fitter
    import dataclasses as dc
    import jax.numpy as jnp

    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=29,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    cfg = ProxConfig(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=4, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    ds = ProxWindowDataset(rec, output_params_dir=tempfile.mkdtemp(),
                           batch_size=cfg.batch_size, flip=False,
                           read_depth=False, read_mask=False)
    W = min(2, len(ds.windows))
    window_data = [ds.load_window(i) for i in range(W)]
    statics = [build_window_static(cfg, assets, rec, wd,
                                   ds.joint_weights())
               for wd in window_data]
    from lemo_tpu.fitting.prox.losses import PER_WINDOW_FIELDS
    batch_kw = {}
    for f in dc.fields(statics[0].__class__):
        vals = [getattr(s, f.name) for s in statics]
        batch_kw[f.name] = (jnp.stack(vals)
                            if f.name in PER_WINDOW_FIELDS
                            and vals[0] is not None else vals[0])
    static_batch = statics[0].__class__(**batch_kw)
    warm = {k: jnp.stack([jnp.asarray(wd["warm_start"][k])
                          for wd in window_data])
            for k in window_data[0]["warm_start"]}
    first_mask = jnp.asarray([i == 0 for i in range(W)])
    fitter = make_batched_window_fitter(
        model, assets.vposer_params,
        smpl_to_openpose(cfg.model_type, cfg.use_hands, cfg.use_face,
                         cfg.use_face_contour),
        statics[0], weights_from_config(cfg), maxiters=4, lr=0.005)
    fitter(static_batch, warm, first_mask)
    n_compiled = fitter.run_chunk_v._cache_size()
    # jacobi-polish style call: explicit erase override, same shapes
    erase = np.full((W,), int(16 * 0.15), np.int32)
    erase[0] = 16
    fitter(static_batch, warm, first_mask, maxiters_override=4,
           erase_override=erase)
    assert fitter.run_chunk_v._cache_size() == n_compiled
