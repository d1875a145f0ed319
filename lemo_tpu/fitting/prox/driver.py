"""PROX pipeline driver: config -> recording -> sliding-window fits.

Capability parity with temp_prox/main_slide.py:54-373: builds the asset
paths, loads the priors and gendered body model, iterates the overlapping
windows, warm-starts each from the pkls on disk (its own outputs first, so
a killed run resumes mid-sequence), runs the fit, and writes per-frame pkl
results + a conf.yaml snapshot.
"""

from __future__ import annotations

import dataclasses
import os
import os.path as osp
import time

import numpy as np
import jax.numpy as jnp
import yaml

from lemo_tpu.body_model import load_model
from lemo_tpu.body_model.vertex_ids import smpl_to_openpose
from lemo_tpu.config import ProxConfig
from lemo_tpu.data import markers as mk
from lemo_tpu.data import segments as seg
from lemo_tpu.data.prox import ProxRecording, ProxWindowDataset
from lemo_tpu.data.stats import GlobalStats, Local4ChanStats
from lemo_tpu.fitting.prox.camera import PerspectiveCamera
from lemo_tpu.fitting.prox.infill_prepass import run_infill_prepass
from lemo_tpu.fitting.prox.losses import ProxStatic, ProxWeights
from lemo_tpu.fitting.prox.window import fit_window, save_window_pkls


def weights_from_config(cfg: ProxConfig, stage: int = 0) -> ProxWeights:
    w = cfg.stage_weights(stage)
    return ProxWeights(
        data=w["data"], body_pose=w["body_pose"], shape=w["shape"],
        hand_prior=w["hand_prior"], expr=w["expr"], jaw=w["jaw"],
        coll=w["coll"], s2m=w["s2m"], m2s=w["m2s"],
        rho_s2m=w["rho_s2m"], rho_m2s=w["rho_m2s"],
        sdf_penetration=w["sdf_penetration"], contact=w["contact"],
        smooth_acc=w["smooth_acc"], smooth_vel=w["smooth_vel"],
        motion_smooth=w["motion_smooth"],
        friction_normal=w["friction_normal"],
        friction_tangent=w["friction_tangent"],
        motion_infill_rec=w["motion_infill_rec"],
        motion_infill_contact=w["motion_infill_contact"],
        sdf_fp8=bool(getattr(cfg, "sdf_fp8", False)),
        coll_frame_chunk=int(getattr(cfg, "coll_frame_chunk", 2)),
    )


def build_priors(cfg: ProxConfig) -> dict:
    """cfg.*_prior_type -> prior callables for make_prox_loss
    (main_slide.py:199-237; hand GMMs use num_pca_comps components like
    the reference's lhand_args/rhand_args overrides :218-230). Only
    non-default types are materialized — l2 entries stay implicit."""
    from lemo_tpu.priors.body_priors import create_prior

    out: dict = {}
    base = {"prior_folder": cfg.prior_folder,
            "num_gaussians": cfg.num_gaussians}
    hand = {"prior_folder": cfg.prior_folder,
            "num_gaussians": cfg.num_pca_comps}
    for key, ptype, kw in (
            ("body", cfg.body_prior_type, base),
            ("left_hand", cfg.left_hand_prior_type, hand),
            ("right_hand", cfg.right_hand_prior_type, hand),
            ("jaw", cfg.jaw_prior_type, base),
            ("expr", cfg.expr_prior_type, base)):
        if ptype not in (None, "", "l2"):
            out[key] = create_prior(ptype, **kw)
    return out


@dataclasses.dataclass
class ProxAssets:
    """Injectable models/priors (tests pass synthetic ones; production
    loads from cfg paths)."""

    model: object
    vposer_params: dict
    smooth_enc_params: dict | None = None
    smooth_stats: GlobalStats | None = None
    infill_ae_params: dict | None = None
    infill_stats: Local4ChanStats | None = None
    scene_verts: np.ndarray | None = None
    # FilterFaces data (part-pair collision filtering): [F] part id per
    # face + [P, P] bool ignore table folded from ign_part_pairs and the
    # part parent tree (fit_temp_loadprox_slide.py:335-344)
    faces_segm: np.ndarray | None = None
    ign_table: np.ndarray | None = None


def load_part_segm(part_segm_fn: str, faces: np.ndarray,
                   ign_part_pairs: list) -> tuple[np.ndarray, np.ndarray]:
    """Read smplx_parts_segm.pkl ({'segm': [F], 'parents': [F]}, latin1
    pickle like the reference at fit_temp_loadprox_slide.py:335-340) and
    build the (faces_segm, ign_table) pair for the intersection kernel."""
    import pickle

    from lemo_tpu.ops.intersection import build_face_filter

    with open(osp.expandvars(part_segm_fn), "rb") as fh:
        data = pickle.load(fh, encoding="latin1")
    filt = build_face_filter(faces, faces_segm=data["segm"],
                             ign_part_pairs=list(ign_part_pairs),
                             faces_parents=data.get("parents"))
    return filt["segm"], filt["ign_table"]


def load_assets(cfg: ProxConfig) -> ProxAssets:
    from lemo_tpu.priors.conv_ae import load_torch_state_dict

    from lemo_tpu.body_model.smplx import find_smplx_npz

    model = load_model(find_smplx_npz(cfg.model_folder, cfg.gender),
                       gender=cfg.gender, use_pca=cfg.use_pca,
                       num_pca_comps=cfg.num_pca_comps,
                       flat_hand_mean=cfg.flat_hand_mean)
    vposer_params = None
    if cfg.vposer_ckpt:
        from lemo_tpu.utils.tools import load_vposer

        vposer_params, _ = load_vposer(cfg.vposer_ckpt)

    smooth_enc = smooth_stats = None
    if cfg.use_motion_smooth_prior and cfg.AE_Enc_path:
        smooth_enc = load_torch_state_dict(cfg.AE_Enc_path)
        stats_path = osp.expandvars(cfg.smooth_stats_path) \
            if cfg.smooth_stats_path else osp.join(
                osp.dirname(osp.dirname(cfg.AE_Enc_path)), "..",
                "preprocess_stats",
                "preprocess_stats_smooth_withHand_global_markers.npz")
        if not osp.exists(stats_path):
            raise FileNotFoundError(
                f"smoothness-prior stats not found at {stats_path!r} "
                "(derived from AE_Enc_path per the reference layout); "
                "set smooth_stats_path in the config to point at the "
                "preprocess_stats_smooth_withHand_global_markers.npz file")
        smooth_stats = GlobalStats.load(stats_path)
    infill_ae = infill_stats = None
    if cfg.use_motion_infill_prior:
        from lemo_tpu.priors.conv_ae import load_state_dict_npz

        if cfg.infill_stats_path:
            infill_stats = Local4ChanStats.load(
                osp.expandvars(cfg.infill_stats_path))
        if cfg.AE_infill_path:
            infill_ae = (load_torch_state_dict(cfg.AE_infill_path)
                         if cfg.AE_infill_path.endswith((".pkl", ".pt"))
                         else load_state_dict_npz(cfg.AE_infill_path))
        else:
            # the reference's pretrained blob is missing from its
            # distribution; fall back to the shipped synthetic-corpus
            # retrain (scripts/train_infill_asset.py) so the S3 config
            # runs with no extra assets
            asset_dir = osp.join(osp.dirname(osp.dirname(
                osp.dirname(osp.abspath(__file__)))), "assets")
            ae_path = osp.join(asset_dir, "infill_ae.npz")
            if osp.exists(ae_path):
                infill_ae = load_state_dict_npz(ae_path)
                if infill_stats is None:
                    infill_stats = Local4ChanStats.load(
                        osp.join(asset_dir, "infill_stats.npz"))
    faces_segm = ign_table = None
    if cfg.interpenetration and cfg.part_segm_fn:
        faces_segm, ign_table = load_part_segm(
            cfg.part_segm_fn, model.faces, cfg.ign_part_pairs)
    elif cfg.interpenetration and cfg.ign_part_pairs:
        print("[lemo_tpu] interpenetration is on and ign_part_pairs is "
              "set, but part_segm_fn is empty — part-pair filtering is "
              "INERT; the term will penalize all overlapping pairs "
              "(point part_segm_fn at smplx_parts_segm.pkl for "
              "FilterFaces parity)")
    return ProxAssets(model=model, vposer_params=vposer_params,
                      smooth_enc_params=smooth_enc,
                      smooth_stats=smooth_stats,
                      infill_ae_params=infill_ae,
                      infill_stats=infill_stats,
                      faces_segm=faces_segm, ign_table=ign_table)


_SDF_CACHE: dict = {}


def _load_sdf_cached(cfg: ProxConfig, rec: ProxRecording):
    """Per-recording cache of the scene SDF (device array + packed form).

    The scene grid is identical for every window of a recording; loading
    the 64+ MB npy and quantize-packing it per window cost ~1 s of the
    ~14 s window wall-clock."""
    key = (rec.sdf_dir, rec.scene_name,
           bool(getattr(cfg, "sdf_fp8", False)),
           bool(getattr(cfg, "sdf_packed", True)))
    if key not in _SDF_CACHE:
        sdf_np, grid_min, grid_max, _ = rec.load_sdf()
        packed = None
        if key[2]:
            from lemo_tpu.ops.sdf import pack_grid_fp8_quad
            packed = jnp.asarray(pack_grid_fp8_quad(sdf_np))
        elif key[3]:
            from lemo_tpu.ops.sdf import pack_grid_bf16
            packed = jnp.asarray(pack_grid_bf16(sdf_np))
        _SDF_CACHE[key] = (jnp.asarray(sdf_np), packed,
                           jnp.asarray(grid_min), jnp.asarray(grid_max))
        if len(_SDF_CACHE) > 4:   # bound device memory across recordings
            _SDF_CACHE.pop(next(iter(_SDF_CACHE)))
    return _SDF_CACHE[key]


# jitted pre-pass programs per ProxAssets object: every window (and every
# stage refresh) reuses one compilation — rebuilding make_forward_fn per
# call retraced per window and dominated the window-parallel driver's
# host floor (measured ~3 s/window of retrace at production scale)
_PREPASS_JIT_CACHE: dict = {}


def _cached_prepass_fns(cfg: ProxConfig, assets: ProxAssets):
    """(warm_verts(warm) -> [T, V, 3], min_sdf(warm, ...) -> [V],
    min_sdf_batched(warm_stack, ...) -> [W, V]) — each jitted once per
    assets object."""
    import jax

    key = (id(assets), bool(cfg.use_vposer))
    if key in _PREPASS_JIT_CACHE:
        return _PREPASS_JIT_CACHE[key]
    from lemo_tpu.body_model import make_forward_fn, vposer as vp
    from lemo_tpu.ops.sdf import sample_sdf_world

    model = assets.model
    fwd = make_forward_fn(model, fused=False)
    use_vposer = bool(cfg.use_vposer)

    def verts_of(warm):
        params = {k: v for k, v in warm.items()
                  if k not in ("pose_embedding", "body_pose")}
        if use_vposer and "pose_embedding" in warm:
            params["body_pose"] = vp.decode(
                assets.vposer_params, warm["pose_embedding"], "aa")
        elif "body_pose" in warm:
            params["body_pose"] = warm["body_pose"]
        return fwd(params, model.consts)["vertices"]

    def min_sdf_of(warm, R, t, sdf, grid_min, grid_max):
        vw = verts_of(warm) @ R.T + t
        vals = sample_sdf_world(sdf, vw.reshape(-1, 3), grid_min,
                                grid_max, crop=None)
        return vals.reshape(vw.shape[0], -1).min(axis=0)

    fns = (jax.jit(verts_of), jax.jit(min_sdf_of),
           jax.jit(jax.vmap(min_sdf_of,
                            in_axes=(0, None, None, None, None, None))))
    _PREPASS_JIT_CACHE[key] = fns
    if len(_PREPASS_JIT_CACHE) > 4:
        _PREPASS_JIT_CACHE.pop(next(iter(_PREPASS_JIT_CACHE)))
    return fns


def _sdf_candidate_ids(cfg: ProxConfig, assets: ProxAssets, warm: dict,
                       R, t, sdf, grid_min, grid_max) -> np.ndarray:
    """[K] vertex ids whose warm-start body comes within
    cfg.sdf_candidates_margin of the scene anywhere in the window.

    One exact full-vertex SDF sampling per window (amortized over the
    ~900 optimizer iterations that then sample only these K vertices).
    Ids are the K smallest per-vertex min-SDF values, so if more than K
    vertices are inside the margin the nearest/deepest win; if fewer, the
    set is padded with the next-nearest vertices (harmless extra
    samples)."""
    _, min_sdf_of, _ = _cached_prepass_fns(cfg, assets)
    warm_j = {k: jnp.asarray(v) for k, v in warm.items()}
    min_sdf = np.asarray(min_sdf_of(warm_j, jnp.asarray(R),
                                    jnp.asarray(t), sdf, grid_min,
                                    grid_max))
    model = assets.model
    K = min(int(cfg.sdf_candidates), model.num_verts)
    n_close = int((min_sdf < cfg.sdf_candidates_margin).sum())
    if n_close > K:
        import warnings
        warnings.warn(
            f"sdf_candidates={K} < {n_close} vertices within "
            f"{cfg.sdf_candidates_margin} m of the scene at warm start; "
            "raise sdf_candidates or the term may miss penetrations")
    return np.argsort(min_sdf)[:K].astype(np.int32)


def _warm_start_vertices(cfg: ProxConfig, assets: ProxAssets,
                         warm: dict) -> jnp.ndarray:
    """Body vertices (cam coords) of the warm-start parameters — the
    stop-gradient geometry both candidate pre-passes sample."""
    verts_of, _, _ = _cached_prepass_fns(cfg, assets)
    return verts_of({k: jnp.asarray(v) for k, v in warm.items()})


def _coll_candidate_scores(cfg: ProxConfig, assets: ProxAssets,
                           warm: dict) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame face slack scores [T, F] + (n_active, n_within) counts
    [T, 2] for the self-intersection broad phase (one O(F^2) forward-only
    sweep on warm-start geometry; ops.intersection docstring)."""
    from lemo_tpu.ops.intersection import \
        intersection_candidate_scores_batched

    verts = _warm_start_vertices(cfg, assets, warm)
    segm = (jnp.asarray(assets.faces_segm)
            if assets.faces_segm is not None else None)
    tab = (jnp.asarray(assets.ign_table)
           if assets.ign_table is not None else None)
    scores, counts = intersection_candidate_scores_batched(
        verts, jnp.asarray(assets.model.faces),
        margin=float(cfg.coll_candidates_margin), segm=segm, ign_table=tab)
    return np.asarray(scores), np.asarray(counts)


def _coll_pick_K(cfg: ProxConfig, n_active: int, n_within: int,
                 F: int) -> int:
    """Candidate-set size from the configured K and the warm-start live
    count. With cfg.coll_candidates_auto (default), K grows to cover
    every face on a FIRING pair — rounded up to a 1024 multiple to bound
    shape churn (each distinct K is one retrace of the window program) —
    so the subset energy is exact at refresh time at any shipped K."""
    import warnings

    K = min(int(cfg.coll_candidates), F)
    if n_active > K:
        if getattr(cfg, "coll_candidates_auto", False):
            K = min(F, -(-n_active // 1024) * 1024)
            print(f"[lemo_tpu] coll_candidates auto-grown to {K} "
                  f"({n_active} faces on firing pairs at warm start > "
                  f"configured {cfg.coll_candidates})")
        else:
            warnings.warn(
                f"coll_candidates={K} < {n_active} faces on FIRING energy "
                "pairs at warm start — the subset energy is already "
                "missing penetrations at refresh time; raise "
                "coll_candidates or set coll_candidates_auto")
    elif n_within > K:
        warnings.warn(
            f"coll_candidates={K} < {n_within} faces within "
            f"{cfg.coll_candidates_margin} m of a collision partner at "
            f"warm start ({n_active} live): the margin headroom is "
            "truncated — fine for small per-window motion, raise "
            "coll_candidates or lower coll_candidates_margin otherwise")
    return K


def _coll_ids_from_scores(scores: np.ndarray, K: int) -> np.ndarray:
    """[T, F] slack scores -> [T, K] face ids (K smallest slacks).

    argsort order is score order — spatially scattered, which defeats
    the Pallas subset kernel's tile-sphere block skipping. Face-id order
    restores the mesh's spatial coherence; the subset energy is
    order-invariant."""
    ids = np.argsort(scores, axis=1)[:, :K].astype(np.int32)
    return np.sort(ids, axis=-1)


def _coll_candidate_ids(cfg: ProxConfig, assets: ProxAssets,
                        warm: dict) -> np.ndarray:
    """[T, K] face ids for the temporal-coherence self-intersection broad
    phase (cfg.coll_candidates): per frame, the K warm-start faces
    nearest to a valid collision partner. One O(F^2) forward-only sweep
    per window amortizes the reference's per-step BVH rebuild
    (fit_temp_loadprox_slide.py:319-344). K auto-grows to cover the
    firing set when cfg.coll_candidates_auto (default)."""
    scores, counts = _coll_candidate_scores(cfg, assets, warm)
    K = _coll_pick_K(cfg, int(counts[:, 0].max()), int(counts[:, 1].max()),
                     assets.model.faces.shape[0])
    return _coll_ids_from_scores(scores, K)


def _gmof_np(d: np.ndarray, rho: float) -> np.ndarray:
    sq = d ** 2
    return (rho ** 2) * sq / (sq + rho ** 2)


def _depth_candidate_data(cfg: ProxConfig, assets: ProxAssets, warm: dict,
                          st) -> tuple:
    """Per-frame candidate ids + frozen remainders for the depth Chamfer
    terms (cfg.depth_candidates): one exact bidirectional Chamfer pass on
    the warm-start geometry picks, per frame, the Ks scan points nearest
    the visible body and the Kv body vertices nearest the scan; the loss
    then runs Ks x Kv instead of S x V per frame (losses.depth_terms,
    fitting_temp_slide.py:637-670 is the reference's full-cloud form).

    The frozen pairs are (full-cloud warm value) minus (candidate-subset
    warm value, computed exactly as the loss computes the live part), so
    the subset energy reproduces the exact term at refresh time BY
    CONSTRUCTION at any K; in-window motion is the only approximation
    (the sdf_candidates/coll_candidates contract)."""
    import warnings

    import jax

    from lemo_tpu.ops.chamfer_pallas import nn_distance_best as nn_distance
    from lemo_tpu.ops.visibility import vertex_normals, visibility_zbuffer

    verts = _warm_start_vertices(cfg, assets, warm)     # [T, V, 3] cam
    scan, scan_m = st.scan, st.scan_mask
    T, S = int(scan.shape[0]), int(scan.shape[1])
    V = int(verts.shape[1])
    Ks = min(int(cfg.depth_candidates), S)
    Kv = min(int(cfg.depth_candidates), V)
    cam = st.camera

    def per_frame(v, sc, sm_f):
        normals = (vertex_normals(v, st.faces_vis)
                   if st.faces_vis is not None else None)
        vis = visibility_zbuffer(
            v, cam.focal_length_x, cam.focal_length_y, cam.center[0],
            cam.center[1], st.image_size[0], st.image_size[1],
            normals=normals)
        d2s, _ = nn_distance(sc, v, vis)                # scan -> body
        d2v, _ = nn_distance(v, sc, sm_f)               # body -> scan
        return jnp.sqrt(d2s + 1e-12), jnp.sqrt(d2v + 1e-12), vis

    verts_j = jnp.asarray(verts)
    ds, dv, vis = jax.vmap(per_frame)(verts_j, scan, scan_m)
    ds, dv = np.asarray(ds), np.asarray(dv)             # [T,S], [T,V]
    vis_np = np.asarray(vis).astype(bool)
    sm = np.asarray(scan_m) > 0
    bm = np.asarray(st.body_mask) > 0

    # candidates: valid scan points nearest the body / vertices nearest
    # the scan (invalid scan points sort to the end; any picked as pad
    # contribute 0 through their validity mask)
    sids = np.argsort(np.where(sm, ds, np.inf), axis=1)[:, :Ks] \
        .astype(np.int32)
    # vertex relevance: with s2m on, EVERY vertex near the scan is a
    # prospective NN target; with m2s only, vertices statically excluded
    # by body_mask can never contribute — drop them from the ranking and
    # the margin warning (they'd otherwise crowd out real candidates and
    # fire the warning spuriously)
    dv_rank = dv if cfg.s2m else np.where(bm[None, :], dv, np.inf)
    vids = np.argsort(dv_rank, axis=1)[:, :Kv].astype(np.int32)

    margin = float(cfg.depth_candidates_margin)
    n_s = int((np.where(sm, ds, np.inf) < margin).sum(axis=1).max())
    n_v = int((dv_rank < margin).sum(axis=1).max())
    if n_s > Ks or n_v > Kv:
        warnings.warn(
            f"depth_candidates={cfg.depth_candidates} < {max(n_s, n_v)} "
            f"scan points/vertices within {margin} m at warm start: the "
            "energy is exact at refresh but the margin headroom for "
            "in-window motion is truncated; raise depth_candidates")

    # candidate-subset distances at warm start, computed exactly as the
    # loss computes the live part (NN restricted to the candidate clouds)
    def per_frame_sub(v, sc, sm_f, vis_f, si, vi):
        v_c, vis_c = v[vi], vis_f[vi]
        sc_c, sm_c = sc[si], sm_f[si]
        d2s, _ = nn_distance(sc_c, v_c, vis_c)
        d2v, _ = nn_distance(v_c, sc_c, sm_c)
        return jnp.sqrt(d2s + 1e-12), jnp.sqrt(d2v + 1e-12)

    ds_c, dv_c = jax.vmap(per_frame_sub)(
        verts_j, scan, scan_m, jnp.asarray(vis), jnp.asarray(sids),
        jnp.asarray(vids))
    ds_c, dv_c = np.asarray(ds_c), np.asarray(dv_c)

    ar = np.arange(T)[:, None]
    # s2m: frozen = full masked gmof sum - candidate warm sum; the count
    # is the FULL valid count (scan validity is static)
    full_s = (_gmof_np(ds, cfg.rho_s2m) * sm).sum(axis=1)
    live_s = (_gmof_np(ds_c, cfg.rho_s2m) * sm[ar, sids]).sum(axis=1)
    s2m_frozen = np.stack(
        [full_s - live_s, sm.sum(axis=1).astype(np.float64)],
        axis=1).astype(np.float32)
    # m2s: visibility is live in the loss, so both the frozen sum and the
    # frozen count are (full - candidate) at warm visibility
    mask_full = vis_np & bm[None, :]
    mask_live = vis_np[ar, vids] & bm[vids]
    full_m = (_gmof_np(dv, cfg.rho_m2s) * mask_full).sum(axis=1)
    live_m = (_gmof_np(dv_c, cfg.rho_m2s) * mask_live).sum(axis=1)
    m2s_frozen = np.stack(
        [full_m - live_m,
         (mask_full.sum(axis=1) - mask_live.sum(axis=1)).astype(np.float64)],
        axis=1).astype(np.float32)
    # warm-start visibility of the candidate vertices: consumed when
    # cfg.depth_frozen_visibility amortizes the per-step z-buffer
    vis_cand = vis_np[ar, vids]
    return sids, vids, s2m_frozen, m2s_frozen, vis_cand


def _candidate_updates(cfg: ProxConfig, assets: ProxAssets, warm: dict,
                       st: ProxStatic, with_coll: bool = True,
                       with_sdf: bool = True) -> dict:
    """Recompute the candidate-dependent ProxStatic fields from a warm
    start. Shared by the initial window build and the stage-boundary
    refresh (cfg.candidates_refresh_stages) — multi-stage fits would
    otherwise hold stage-0 candidate sets through every stage.

    with_coll/with_sdf=False skip those sets (the window-parallel driver
    computes them batched across windows instead,
    :func:`_apply_candidates_batch`)."""
    upd: dict = {}
    if (with_sdf and cfg.sdf_penetration and st.sdf is not None
            and getattr(cfg, "sdf_candidates", 0) > 0):
        ids = _sdf_candidate_ids(cfg, assets, warm, st.R, st.t, st.sdf,
                                 st.grid_min, st.grid_max)
        upd["sdf_candidate_ids"] = jnp.asarray(ids)
    if (with_coll and cfg.interpenetration
            and getattr(cfg, "coll_candidates", 0) > 0):
        upd["coll_candidate_ids"] = jnp.asarray(
            _coll_candidate_ids(cfg, assets, warm))
    if ((cfg.s2m or cfg.m2s) and st.scan is not None
            and getattr(cfg, "depth_candidates", 0) > 0):
        sids, vids, s2m_fr, m2s_fr, vis_c = _depth_candidate_data(
            cfg, assets, warm, st)
        upd.update(depth_scan_cand_ids=jnp.asarray(sids),
                   depth_vert_cand_ids=jnp.asarray(vids),
                   s2m_frozen=jnp.asarray(s2m_fr),
                   m2s_frozen=jnp.asarray(m2s_fr))
        if getattr(cfg, "depth_frozen_visibility", True):
            upd["depth_vis_frozen"] = jnp.asarray(vis_c)
    return upd


def _apply_candidates_batch(cfg: ProxConfig, assets: ProxAssets,
                            warms: list, statics: list) -> list:
    """Candidate sets for a batch of windows with ONE self-intersection
    K (the auto rule sized from the max live count over ALL windows), so
    the per-window [T, K] sets stack into the window-parallel batch."""
    need_coll = (cfg.interpenetration
                 and getattr(cfg, "coll_candidates", 0) > 0)
    coll_ids = None
    if need_coll:
        scores_all, n_active, n_within = [], 0, 0
        for warm in warms:
            s, c = _coll_candidate_scores(cfg, assets, warm)
            scores_all.append(s)
            n_active = max(n_active, int(c[:, 0].max()))
            n_within = max(n_within, int(c[:, 1].max()))
        K = _coll_pick_K(cfg, n_active, n_within,
                         assets.model.faces.shape[0])
        coll_ids = [jnp.asarray(_coll_ids_from_scores(s, K))
                    for s in scores_all]
    # sdf candidates batched: ONE vmapped forward+SDF dispatch for all
    # windows instead of W sequential ones (the per-window loop was a
    # measurable share of the window-parallel host floor)
    sdf_ids = None
    st0 = statics[0]
    if (cfg.sdf_penetration and st0.sdf is not None
            and getattr(cfg, "sdf_candidates", 0) > 0):
        import warnings

        _, _, min_sdf_batched = _cached_prepass_fns(cfg, assets)
        warm_stack = {k: jnp.stack([jnp.asarray(w[k]) for w in warms])
                      for k in warms[0]}
        min_sdf = np.asarray(min_sdf_batched(
            warm_stack, st0.R, st0.t, st0.sdf, st0.grid_min,
            st0.grid_max))                                  # [W, V]
        K = min(int(cfg.sdf_candidates), assets.model.num_verts)
        n_close = int((min_sdf < cfg.sdf_candidates_margin)
                      .sum(axis=1).max())
        if n_close > K:
            warnings.warn(
                f"sdf_candidates={K} < {n_close} vertices within "
                f"{cfg.sdf_candidates_margin} m of the scene at warm "
                "start; raise sdf_candidates or the term may miss "
                "penetrations")
        sdf_ids = np.argsort(min_sdf, axis=1)[:, :K].astype(np.int32)
    out = []
    for i, (warm, st) in enumerate(zip(warms, statics)):
        upd = _candidate_updates(cfg, assets, warm, st, with_coll=False,
                                 with_sdf=False)
        if need_coll:
            upd["coll_candidate_ids"] = coll_ids[i]
        if sdf_ids is not None:
            upd["sdf_candidate_ids"] = jnp.asarray(sdf_ids[i])
        out.append(dataclasses.replace(st, **upd) if upd else st)
    return out


def stage_joint_weights(cfg: ProxConfig, joint_weights: np.ndarray,
                        stage: int = 0) -> np.ndarray:
    """Per-stage hand/face keypoint weights (the reference re-assigns
    joint_weights[:, 25:76]/[76:] from curr_weights each stage,
    fit_temp_loadprox_slide.py:525-528)."""
    def at(lst):
        return float(lst[min(stage, len(lst) - 1)])

    jw = joint_weights.copy()
    if cfg.use_hands:
        jw[25:76] = at(cfg.hand_joints_weights)
    if cfg.use_face:
        jw[76:] = at(cfg.face_joints_weights)
    for j in cfg.joints_to_ign:
        if 0 <= int(j) < len(jw):
            jw[int(j)] = 0.0
    return jw


def build_window_static(cfg: ProxConfig, assets: ProxAssets,
                        rec: ProxRecording, window_data: dict,
                        joint_weights: np.ndarray,
                        infill_result=None, stage: int = 0,
                        with_candidates: bool = True) -> ProxStatic:
    model = assets.model
    V = model.num_verts
    camera = PerspectiveCamera(cfg.focal_length_x, cfg.focal_length_y,
                               (cfg.camera_center_x, cfg.camera_center_y))
    R, t = rec.load_cam2world()
    sdf = sdf_packed = grid_min = grid_max = None
    if cfg.sdf_penetration or cfg.use_friction:
        sdf, sdf_packed, grid_min, grid_max = _load_sdf_cached(cfg, rec)

    jw = stage_joint_weights(cfg, joint_weights, stage)

    _, body_mask = seg.head_and_body_masks(V)

    keypoints = window_data["keypoints"]
    st = ProxStatic(
        gt_joints=jnp.asarray(keypoints[:, :, :2]),
        joints_conf=jnp.asarray(keypoints[:, :, 2]),
        joint_weights=jnp.asarray(jw),
        camera=camera,
        R=jnp.asarray(R), t=jnp.asarray(t),
        scan=jnp.asarray(window_data["scan"]) if cfg.s2m or cfg.m2s else None,
        scan_mask=(jnp.asarray(window_data["scan_mask"])
                   if cfg.s2m or cfg.m2s else None),
        body_mask=jnp.asarray(body_mask),
        sdf=sdf, sdf_packed=sdf_packed,
        grid_min=grid_min, grid_max=grid_max,
        scene_verts=(jnp.asarray(assets.scene_verts)
                     if cfg.contact and assets.scene_verts is not None
                     else None),
        contact_verts_ids=jnp.asarray(
            seg.contact_vertex_ids(cfg.contact_body_parts, V))
        if cfg.contact else None,
        fric_verts_ids=jnp.asarray(seg.friction_vertex_ids(V))
        if cfg.use_friction else None,
        foot_ids=seg.foot_vertex_ids(V),
        smooth_enc_params=assets.smooth_enc_params,
        smooth_stats=assets.smooth_stats,
        smooth_marker_ids=jnp.asarray(mk.marker_indices(True, num_verts=V)),
        marker_mask=jnp.asarray(window_data["marker_mask"]),
        infill_marker_ids=jnp.asarray(mk.marker_indices(False, num_verts=V)),
        faces=jnp.asarray(model.faces) if cfg.interpenetration else None,
        faces_vis=(jnp.asarray(model.faces)
                   if (cfg.s2m or cfg.m2s) else None),
        faces_segm=(jnp.asarray(assets.faces_segm)
                    if cfg.interpenetration and assets.faces_segm is not None
                    else None),
        ign_table=(jnp.asarray(assets.ign_table)
                   if cfg.interpenetration and assets.ign_table is not None
                   else None),
    )
    if with_candidates:
        upd = _candidate_updates(cfg, assets, window_data["warm_start"], st)
        if upd:
            st = dataclasses.replace(st, **upd)
    if infill_result is not None:
        st = dataclasses.replace(
            st, infill_targets=infill_result.targets_world,
            infill_contact_lbl=infill_result.contact_lbl)
    return st


_CAMERA_PKL_PARAMS = {
    # the PROX camera's pose parameters are frozen at identity/zero
    # (main_slide.py:192-193; extrinsics live in cam2world) — the
    # reference still serializes them per frame
    # (fit_temp_loadprox_slide.py:577-580)
    "rotation": np.eye(3, dtype=np.float32),
    "translation": np.zeros(3, np.float32),
}


def _make_warm_world_markers(assets, rec):
    """Jitted warm-start body -> (world 67-markers, world 25-joints) for
    the infill pre-pass (one compile per recording; the eager per-window
    forward cost dozens of dispatches each)."""
    import jax

    from lemo_tpu.body_model import make_forward_fn
    from lemo_tpu.body_model import vposer as vp

    model = assets.model
    # fused=False: the window-parallel driver vmaps this forward
    fwd = make_forward_fn(model, fused=False)
    Rw, tw = rec.load_cam2world()
    Rw, tw = jnp.asarray(Rw), jnp.asarray(tw)
    ids67 = jnp.asarray(mk.marker_indices(False, num_verts=model.num_verts))

    @jax.jit
    def warm_world_markers(warm):
        params = {k: warm[k] for k in
                  ("transl", "global_orient", "betas",
                   "left_hand_pose", "right_hand_pose", "jaw_pose",
                   "leye_pose", "reye_pose", "expression")}
        params["body_pose"] = vp.decode(assets.vposer_params,
                                        warm["pose_embedding"], "aa")
        out = fwd(params, model.consts)
        mv = out["vertices"] @ Rw.T + tw
        mj = out["joints"][:, :25] @ Rw.T + tw
        return mv[:, ids67], mj

    return warm_world_markers


def _make_window_extras_saver(cfg, assets, rec, output_folder):
    """Per-window `save_meshes` / `render_results` outputs
    (fit_temp_loadprox_slide.py:596-704): body ply per frame under
    <output>/<mesh_folder>/<frame>/000.ply and body-over-Color overlay
    renders under <output>/images/<frame>.png. Returns
    ``save(frame_names, result)`` or None when both flags are off.

    The overlay render uses the built-in software rasterizer (the
    reference uses pyrender) — seconds per frame at full resolution, so
    it is opt-in exactly like the reference's flag."""
    if not (cfg.save_meshes or cfg.render_results):
        return None
    import jax

    from lemo_tpu.body_model import make_forward_fn
    from lemo_tpu.data.prox import write_ply_vertices

    model = assets.model
    fwd = jax.jit(make_forward_fn(model))
    faces = np.asarray(model.faces)
    mesh_dir = osp.join(output_folder, cfg.mesh_folder)
    img_dir = osp.join(output_folder, "images")
    color_dir = osp.join(rec.recording_dir, cfg.img_folder)

    def save(frame_names, result):
        params = model.zero_params(len(frame_names))
        for k, v in result.params.items():
            if k in params:
                params[k] = jnp.asarray(v)
        verts = np.asarray(fwd(params, model.consts)["vertices"])
        n_mesh = n_img = 0
        for i, fn in enumerate(frame_names):
            if cfg.save_meshes:
                d = osp.join(mesh_dir, fn)
                os.makedirs(d, exist_ok=True)
                write_ply_vertices(osp.join(d, "000.ply"), verts[i],
                                   faces=faces)
                n_mesh += 1
            if cfg.render_results:
                import cv2

                from lemo_tpu.utils.raster import render_body_overlay

                img_path = None
                for ext in (".jpg", ".png"):
                    cand = osp.join(color_dir, fn + ext)
                    if osp.exists(cand):
                        img_path = cand
                        break
                if img_path is None:
                    continue
                img = cv2.imread(img_path)[:, :, ::-1]
                if cfg.flip:
                    img = img[:, ::-1]
                over = render_body_overlay(
                    verts[i], faces, img,
                    cfg.focal_length_x, cfg.focal_length_y,
                    cfg.camera_center_x, cfg.camera_center_y)
                os.makedirs(img_dir, exist_ok=True)
                cv2.imwrite(osp.join(img_dir, fn + ".png"),
                            over[:, :, ::-1])
                n_img += 1
        return n_mesh, n_img

    return save


# wall-clock split of the most recent _run_window_parallel call:
# load/prepass/static_build/fit/refresh/polish/save seconds, plus the
# shardable (mesh-sharded device programs) vs unshardable (host) split
# that multi-chip projections must Amdahl over. Read by the perf
# harnesses (scripts/ab_window_parallel_tpu.py).
LAST_PARALLEL_TIMINGS: dict = {}


def _run_window_parallel(cfg, assets, rec, ds, jw, mapper, weights,
                         result_folder, n_windows, verbose,
                         save_extras=None):
    """All windows fitted concurrently, window axis sharded over the
    device mesh (the multi-chip path; see
    window.make_batched_window_fitter for the stitching semantics)."""
    import dataclasses as _dc

    import jax

    from lemo_tpu.body_model import vposer as vp
    from lemo_tpu.fitting.prox.window import (WindowResult,
                                              make_batched_window_fitter,
                                              save_window_pkls)
    from lemo_tpu.parallel import make_mesh

    t0 = time.time()
    tsec = time.time()
    # all warm starts come from the previous stage's pkls here (no
    # sequential dependence), so whole windows load concurrently —
    # cv2/numpy release the GIL for the expensive parts
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as ex:
        window_data = list(ex.map(ds.load_window, range(n_windows)))
    timings = {"load_s": time.time() - tsec}
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    tsec = time.time()
    # S3: the infill pre-pass runs from the warm starts (the parallel
    # path has no sequential dependence — all warm starts come from the
    # previous stage's pkls), batched over the window axis: one vmapped
    # warm-start forward + one vmapped 60-step AE finetune dispatch for
    # the whole recording instead of W sequential ones. Under a mesh the
    # window axis is sharded (AE params replicate), so the pre-pass
    # scales with the fit instead of sitting on the host floor.
    infill_results = [None] * n_windows
    if cfg.use_motion_infill_prior and assets.infill_ae_params:
        from lemo_tpu.fitting.prox.infill_prepass import (
            InfillPrepassResult, make_batched_prepass)

        warm_world_markers = _make_warm_world_markers(assets, rec)
        warm_stack = {k: jnp.stack([jnp.asarray(wd["warm_start"][k])
                                    for wd in window_data])
                      for k in window_data[0]["warm_start"]}
        masks = np.stack([wd["marker_mask"] for wd in window_data])
        masks_j = jnp.asarray(masks)
        W_eff = n_windows
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_sh = mesh.devices.size
            W_pad = ((n_windows + n_sh - 1) // n_sh) * n_sh
            if W_pad > n_windows:
                rep = lambda x: jnp.concatenate(  # noqa: E731
                    [x, jnp.broadcast_to(x[:1],
                                         (W_pad - n_windows,) + x.shape[1:])])
                warm_stack = {k: rep(v) for k, v in warm_stack.items()}
                masks_j = rep(masks_j)
            shard = NamedSharding(mesh, P("dp"))
            warm_stack = {k: jax.device_put(v, shard)
                          for k, v in warm_stack.items()}
            masks_j = jax.device_put(masks_j, shard)
            W_eff = W_pad
        # jit the vmapped forward: with mesh-sharded inputs an eager vmap
        # dispatches every op as its own multi-device computation
        mv67, mj = jax.jit(jax.vmap(warm_world_markers))(warm_stack)
        # explicit AOT compile so the one-time XLA compile is split from
        # the sharded run (the compile neither shards nor repeats under
        # the persistent compilation cache)
        prepass_fn = make_batched_prepass(
            assets.infill_stats,
            finetune_steps=int(getattr(cfg, "infill_finetune_steps", 60)))
        t_c = time.time()
        compiled = prepass_fn.lower(
            assets.infill_ae_params, mv67, mj, masks_j).compile()
        timings["prepass_compile_s"] = time.time() - t_c
        tw, cl = compiled(assets.infill_ae_params, mv67, mj, masks_j)
        infill_results = [
            InfillPrepassResult(
                targets_world=tw[i], contact_lbl=cl[i],
                had_occlusion=bool(masks[i].size > masks[i].sum()))
            for i in range(n_windows)]
        del W_eff
    timings["prepass_s"] = time.time() - tsec
    tsec = time.time()
    # candidate sets are applied separately (_apply_candidates_batch)
    # so the self-intersection auto-K is harmonized across windows
    statics = [build_window_static(cfg, assets, rec, wd, jw, ir,
                                   with_candidates=False)
               for wd, ir in zip(window_data, infill_results)]
    statics = _apply_candidates_batch(
        cfg, assets, [wd["warm_start"] for wd in window_data], statics)
    from lemo_tpu.fitting.prox.losses import PER_WINDOW_FIELDS as _PER_WINDOW

    def stack_statics(st_list):
        batch_kw = {}
        for f in _dc.fields(st_list[0].__class__):
            vals = [getattr(s, f.name) for s in st_list]
            if f.name in _PER_WINDOW and vals[0] is not None:
                batch_kw[f.name] = jnp.stack(vals)
            else:
                batch_kw[f.name] = vals[0]
        return st_list[0].__class__(**batch_kw)

    static_batch = stack_statics(statics)

    warm = {k: jnp.stack([jnp.asarray(wd["warm_start"][k])
                          for wd in window_data])
            for k in window_data[0]["warm_start"]}
    first_mask = jnp.asarray([i == 0 for i in range(n_windows)])
    timings["static_build_s"] = time.time() - tsec

    priors = build_priors(cfg)
    n_stages = cfg.n_stages
    timings["fit_s"] = timings["refresh_s"] = 0.0
    losses_stages, terms_stages = [], []
    fitter = static_batch_s = None
    for stage in range(n_stages):
        w_s = weights_from_config(cfg, stage)
        if stage > 0 and getattr(cfg, "candidates_refresh_stages", True):
            # rebuild sdf/coll/depth candidate sets from THIS stage's
            # warm start (the previous stage's solution) — stage 0's
            # sets were computed from a now-stale geometry
            tsec = time.time()
            warm_np = {k: np.asarray(v) for k, v in warm.items()}
            warms_s = [{k: v[widx] for k, v in warm_np.items()}
                       for widx in range(n_windows)]
            statics = _apply_candidates_batch(cfg, assets, warms_s, statics)
            static_batch = stack_statics(statics)
            timings["refresh_s"] += time.time() - tsec
        static_batch_s = _dc.replace(
            static_batch, joint_weights=jnp.asarray(
                stage_joint_weights(cfg, jw, stage)))
        fitter = make_batched_window_fitter(
            assets.model, assets.vposer_params, mapper, statics[0], w_s,
            maxiters=cfg.maxiters, lr=cfg.lr, mesh=mesh,
            steps_per_dispatch=cfg.steps_per_dispatch,
            priors=priors, use_vposer=cfg.use_vposer,
            optim_type=cfg.optim_type)
        tsec = time.time()
        opt_vars, betas, losses, batch_terms = fitter(
            static_batch_s, warm, first_mask)
        timings["fit_s"] += time.time() - tsec
        # first chunk carries the stage program's XLA compile; estimate
        # it as (first chunk - median of the rest) so projections can
        # separate compile (per recording-shape, amortized by the
        # persistent compilation cache) from steady stepping
        from lemo_tpu.fitting.prox.window import LAST_CHUNK_TIMES
        if len(LAST_CHUNK_TIMES) > 1:
            import statistics
            timings["fit_compile_s"] = timings.get("fit_compile_s", 0.0) \
                + max(0.0, LAST_CHUNK_TIMES[0]
                      - statistics.median(LAST_CHUNK_TIMES[1:]))
        losses_stages.append(np.asarray(losses))
        terms_stages.append(batch_terms)
        if stage + 1 < n_stages:
            warm = dict(opt_vars)
            warm["betas"] = betas
        weights = w_s  # the polish pass below runs at final-stage weights
    losses = np.concatenate(losses_stages, axis=1)

    sols = [{k: v[widx] for k, v in opt_vars.items()}
            for widx in range(n_windows)]
    loss_hists = [np.asarray(losses[widx]) for widx in range(n_windows)]
    # per-window terms record: each stage contributes its final-solution
    # terms, concatenated across stages (mirroring the sequential driver's
    # per-stage term-history concatenation); the polish pass appends its
    # own records below (per round for jacobi, per step for sequential)
    term_hists = [
        {k: np.concatenate([ts[k][widx:widx + 1] for ts in terms_stages])
         for k in terms_stages[0]}
        for widx in range(n_windows)]

    # Polish pass: the parallel fit's overlap-frozen head frames kept
    # their warm-start values, not the previous window's fresh solution.
    # Re-fit with each window's head re-warm-started from the previous
    # window's solution — restoring the reference's sequential stitching
    # semantics (fitting_temp_slide.py:283-289 + data_parser_slide.py
    # :325-333 own-output-first warm start).
    polish = int(getattr(cfg, "window_polish_iters", 0) or 0)
    polish_mode = getattr(cfg, "window_polish_mode", "jacobi")
    spans = ds.windows
    T = int(statics[0].gt_joints.shape[0])
    erase_head = int(T * 0.15)
    tsec = time.time()
    if polish > 0 and n_windows > 1 and polish_mode == "jacobi":
        # Jacobi schedule: rounds of the BATCHED fitter with heads
        # re-injected between rounds — the whole polish remains one
        # device program sharded over the mesh (the Gauss-Seidel chain
        # below is inherently sequential). Window 0 is fully frozen
        # (erase = T), matching the sequential polish which never
        # re-fits it; each round propagates stitching one window
        # downstream, and windows barely move during polish, so 2-3
        # rounds recover the sequential semantics (tested).
        # each round executes at least one compiled optimizer chunk
        # (min(steps_per_dispatch, maxiters) steps — the unit the fitter
        # compiled); clamp the round count so the TOTAL polish stays at
        # the configured budget instead of silently tripling it when
        # window_polish_iters <= the chunk size
        chunk = min(max(int(cfg.steps_per_dispatch), 1), cfg.maxiters)
        rounds = max(1, min(int(getattr(cfg, "window_polish_rounds", 3)),
                            polish // chunk if polish >= chunk else 1))
        iters_per_round = max(1, polish // rounds)
        erase = np.full((n_windows,), erase_head, np.int32)
        erase[0] = T
        # np.array (copy): jax arrays view as read-only through asarray,
        # and the head injection writes in place
        cur = {k: np.array(v) for k, v in opt_vars.items()}

        def inject_heads(arrs, n_inject_of):
            for widx in range(1, n_windows):
                s_prev, e_prev = spans[widx - 1]
                s_cur, _ = spans[widx]
                ov_n = max(e_prev - s_cur, 0)
                n_inj = n_inject_of(ov_n)
                if n_inj > 0:
                    off = s_cur - s_prev
                    for k in arrs:
                        arrs[k][widx, :n_inj] = \
                            arrs[k][widx - 1, off:off + n_inj]

        round_s = []
        for _ in range(rounds):
            t_r = time.time()
            inject_heads(cur, lambda ov_n: ov_n)
            params = {k: jnp.asarray(v) for k, v in cur.items()}
            params["betas"] = betas
            ov2, _b, p_losses, p_terms = fitter(
                static_batch_s, params, first_mask,
                maxiters_override=iters_per_round, erase_override=erase)
            cur = {k: np.array(v) for k, v in ov2.items()}
            round_s.append(round(time.time() - t_r, 1))
            for widx in range(n_windows):
                loss_hists[widx] = np.concatenate(
                    [loss_hists[widx], np.asarray(p_losses[widx])])
                term_hists[widx] = {
                    k: np.concatenate([term_hists[widx][k],
                                       np.asarray(p_terms[k][widx:widx + 1])])
                    for k in term_hists[widx]}
        timings["polish_round_s"] = round_s
        # final head hand-off: the frozen head frames equal the previous
        # window's FINAL tail verbatim (the sequential-polish invariant;
        # these frames were frozen during the rounds, so this changes no
        # optimized frame)
        inject_heads(cur, lambda ov_n: min(ov_n, erase_head))
        sols = [{k: jnp.asarray(v[widx]) for k, v in cur.items()}
                for widx in range(n_windows)]
    elif polish > 0 and n_windows > 1:
        from lemo_tpu.fitting.prox.window import make_window_fitter

        jw_final = jnp.asarray(stage_joint_weights(cfg, jw, n_stages - 1))
        statics = [_dc.replace(s, joint_weights=jw_final) for s in statics]
        pfitter = make_window_fitter(
            assets.model, assets.vposer_params, mapper, statics[0],
            weights, maxiters=polish, lr=cfg.lr,
            steps_per_dispatch=cfg.steps_per_dispatch,
            priors=priors, use_vposer=cfg.use_vposer)
        for widx in range(1, n_windows):
            s_prev, e_prev = spans[widx - 1]
            s_cur, _ = spans[widx]
            ov_n = max(e_prev - s_cur, 0)
            prox_params = dict(sols[widx])
            prox_params["betas"] = betas[widx]
            if ov_n > 0:
                prev, off = sols[widx - 1], s_cur - s_prev
                for k, v in list(prox_params.items()):
                    if k != "betas":
                        prox_params[k] = v.at[:ov_n].set(
                            prev[k][off:off + ov_n])
            final, p_losses, p_terms, _betas = pfitter(
                statics[widx], prox_params, first_window=False)
            sols[widx] = final
            loss_hists[widx] = np.concatenate(
                [loss_hists[widx], np.asarray(p_losses)])
            # append the polish pass's per-step terms to the stage
            # records (same concatenation the sequential driver does)
            term_hists[widx] = {
                k: np.concatenate([term_hists[widx][k], np.asarray(v)])
                for k, v in p_terms.items() if k in term_hists[widx]}
    timings["polish_s"] = time.time() - tsec

    tsec = time.time()
    results = []
    for widx in range(n_windows):
        final = sols[widx]
        if cfg.use_vposer:
            body_pose = vp.decode(assets.vposer_params,
                                  final["pose_embedding"], "aa")
            pose_embedding = np.asarray(final["pose_embedding"])
        else:
            body_pose = final["body_pose"]
            pose_embedding = np.zeros(
                (body_pose.shape[0], vp.latent_dim(assets.vposer_params)),
                np.float32)
        params_np = {k: np.asarray(v) for k, v in final.items()
                     if k != "pose_embedding"}
        params_np["betas"] = np.asarray(betas[widx])
        params_np["body_pose"] = np.asarray(body_pose)
        result = WindowResult(
            params=params_np,
            pose_embedding=pose_embedding,
            body_pose=np.asarray(body_pose),
            final_loss=float(loss_hists[widx][-1]),
            loss_history=loss_hists[widx],
            term_history={k: np.asarray(v)
                          for k, v in term_hists[widx].items()},
        )
        results.append(result)
    # pkl writes threaded over windows (2000 files; pickle+write release
    # the GIL) — save_extras (mesh/render IO) stays sequential
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(
            lambda wr: save_window_pkls(
                wr[1], window_data[wr[0]]["fns"], result_folder,
                camera_params=_CAMERA_PKL_PARAMS),
            enumerate(results)))
    if save_extras is not None:
        for widx, result in enumerate(results):
            save_extras(window_data[widx]["fns"], result)
    timings["save_s"] = time.time() - tsec
    timings["total_s"] = time.time() - t0
    timings["polish_mode"] = polish_mode if polish > 0 else "off"
    # the batched fit, the (jacobi) polish rounds, and the window-axis-
    # sharded infill pre-pass are mesh-sharded device programs;
    # everything else (window IO, candidate pre-passes, pkl saves) is
    # host/serial work that does NOT shard — multi-chip projections must
    # use this split (Amdahl), never total/N. fit_compile_s (inside
    # fit_s) is the per-recording-shape XLA compile: it neither shards
    # nor repeats once the persistent compilation cache is warm, so it
    # is reported separately for cold vs cache-warm projections.
    timings["compile_s"] = (timings.get("fit_compile_s", 0.0)
                            + timings.get("prepass_compile_s", 0.0))
    timings["shardable_s"] = (
        timings["fit_s"] - timings.get("fit_compile_s", 0.0)
        + timings["prepass_s"] - timings.get("prepass_compile_s", 0.0)
        + (timings["polish_s"] if timings["polish_mode"] == "jacobi"
           else 0.0))
    timings["unshardable_s"] = (timings["total_s"] - timings["shardable_s"]
                                - timings["compile_s"])
    LAST_PARALLEL_TIMINGS.clear()
    LAST_PARALLEL_TIMINGS.update(timings)
    if verbose:
        print(f"[window-parallel] {n_windows} windows on "
              f"{len(jax.devices())} device(s) in {time.time() - t0:.1f}s"
              f"{f' (+{polish}-iter {polish_mode} polish)' if polish else ''}"
              f"; losses {[round(float(h[-1]), 3) for h in loss_hists]}; "
              "split " + ", ".join(
                  f"{k}={v:.1f}s" for k, v in timings.items()
                  if k.endswith("_s") and isinstance(v, float)))
    return results


def run_prox_fitting(cfg: ProxConfig, assets: ProxAssets | None = None,
                     max_windows: int | None = None,
                     verbose: bool = True) -> list:
    """Fit a full recording window-by-window; returns WindowResults."""
    if assets is None:
        assets = load_assets(cfg)
    model = assets.model

    rec = ProxRecording.from_recording_dir(cfg.recording_dir)
    if cfg.contact and cfg.load_scene and assets.scene_verts is None:
        # scenes/<scene>.ply -> contact-term target point set
        # (fit_temp_loadprox_slide.py:365-373)
        assets = dataclasses.replace(assets,
                                     scene_verts=rec.load_scene_mesh())
    output_folder = osp.join(osp.expandvars(cfg.output_folder),
                             rec.recording_name)
    result_folder = osp.join(output_folder, cfg.result_folder)
    os.makedirs(result_folder, exist_ok=True)
    with open(osp.join(output_folder, "conf.yaml"), "w") as fh:
        yaml.safe_dump(dataclasses.asdict(cfg), fh)
    try:
        from lemo_tpu.utils.logging import RunLogger

        logger = RunLogger(osp.join(output_folder, "tensorboard_log"),
                           use_tensorboard=True)
    except Exception:
        logger = None

    ds = ProxWindowDataset(
        rec, output_params_dir=output_folder, batch_size=cfg.batch_size,
        img_folder=cfg.img_folder,
        read_depth=cfg.read_depth and (cfg.s2m or cfg.m2s or
                                       cfg.init_mode == "scan"),
        read_mask=cfg.read_mask, mask_on_color=cfg.mask_on_color,
        flip=cfg.flip, use_hands=cfg.use_hands, use_face=cfg.use_face,
        joints_to_ign=cfg.joints_to_ign,
        start=getattr(cfg, "start", 0), step=getattr(cfg, "step", 1),
        frame_ids=getattr(cfg, "frame_ids", None))
    jw = ds.joint_weights()
    mapper = smpl_to_openpose(cfg.model_type, cfg.use_hands, cfg.use_face,
                              cfg.use_face_contour)
    weights = weights_from_config(cfg)

    results = []
    n_windows = len(ds.windows) if max_windows is None else \
        min(max_windows, len(ds.windows))
    save_extras = _make_window_extras_saver(cfg, assets, rec, output_folder)

    if cfg.window_parallel:
        return _run_window_parallel(cfg, assets, rec, ds, jw, mapper,
                                    weights, result_folder, n_windows,
                                    verbose, save_extras=save_extras)

    warm_world_markers = None
    if cfg.use_motion_infill_prior and assets.infill_ae_params:
        warm_world_markers = _make_warm_world_markers(assets, rec)

    # Host-side window loading (cv2 depth reads + scan unprojection,
    # measured ~2-4 s/window) overlaps the previous window's device fit:
    # the fit-independent parts prefetch on a thread, while the
    # warm-start pkls are read ONLY after the previous window saved its
    # results (own-output-first resume semantics must see them).
    from concurrent.futures import ThreadPoolExecutor

    prefetcher = ThreadPoolExecutor(max_workers=1) \
        if (cfg.prefetch_windows and n_windows > 0) else None
    fut = (prefetcher.submit(ds.load_window, 0, False)
           if prefetcher else None)
    try:
        return _fit_windows_sequential(
            cfg, assets, rec, ds, jw, mapper, weights, result_folder,
            n_windows, verbose, logger, results, warm_world_markers,
            prefetcher, fut, save_extras)
    finally:
        if prefetcher:
            prefetcher.shutdown(wait=False, cancel_futures=True)


def _fit_windows_sequential(cfg, assets, rec, ds, jw, mapper, weights,
                            result_folder, n_windows, verbose, logger,
                            results, warm_world_markers, prefetcher, fut,
                            save_extras=None):
    model = assets.model
    n_stages = cfg.n_stages
    priors = build_priors(cfg)
    stage_fitters: dict = {}  # built from the first window, reused for all
    for widx in range(n_windows):
        t0 = time.time()
        if prefetcher:
            wd = fut.result()
            if widx + 1 < n_windows:
                fut = prefetcher.submit(ds.load_window, widx + 1, False)
            wd["warm_start"] = ds.load_window_warm_start(widx)
        else:
            wd = ds.load_window(widx)
        warm = {k: jnp.asarray(v) for k, v in wd["warm_start"].items()}

        infill_result = None
        if cfg.use_motion_infill_prior and assets.infill_ae_params:
            mv67, mj = warm_world_markers(warm)
            infill_result = run_infill_prepass(
                assets.infill_ae_params, mv67, mj,
                jnp.asarray(wd["marker_mask"]), assets.infill_stats,
                finetune_steps=int(getattr(cfg, "infill_finetune_steps",
                                           60)))

        # one full maxiters run per weight stage, the optimizer re-created
        # each stage and the next stage warm-started from the previous
        # stage's solution (fit_temp_loadprox_slide.py:507-528)
        result = None
        wd_stage = wd
        for stage in range(n_stages):
            if stage > 0 and getattr(cfg, "candidates_refresh_stages",
                                     True):
                # candidate sets (sdf/coll/depth) rebuilt from THIS
                # stage's warm start instead of the original window one
                wd_stage = dict(wd)
                wd_stage["warm_start"] = {k: np.asarray(v)
                                          for k, v in warm.items()}
            static = build_window_static(cfg, assets, rec, wd_stage, jw,
                                         infill_result, stage=stage)
            if stage not in stage_fitters:
                from lemo_tpu.fitting.prox.window import make_window_fitter

                stage_fitters[stage] = make_window_fitter(
                    model, assets.vposer_params, mapper, static,
                    weights_from_config(cfg, stage),
                    maxiters=cfg.maxiters, lr=cfg.lr,
                    optim_type=cfg.optim_type,
                    steps_per_dispatch=cfg.steps_per_dispatch,
                    priors=priors, use_vposer=cfg.use_vposer)
            result_s = fit_window(
                model, assets.vposer_params, mapper, static,
                weights_from_config(cfg, stage),
                warm, first_window=(widx == 0),
                maxiters=cfg.maxiters, lr=cfg.lr,
                fitter=stage_fitters[stage], use_vposer=cfg.use_vposer)
            if result is None:
                result = result_s
            else:
                result = dataclasses.replace(
                    result_s,
                    loss_history=np.concatenate(
                        [result.loss_history, result_s.loss_history]),
                    term_history=({
                        k: np.concatenate([result.term_history[k], v])
                        for k, v in result_s.term_history.items()}
                        if result_s.term_history and result.term_history
                        else result_s.term_history))
            if stage + 1 < n_stages:
                warm = {k: jnp.asarray(v)
                        for k, v in result_s.params.items()}
                warm["pose_embedding"] = jnp.asarray(
                    result_s.pose_embedding)
        save_window_pkls(result, wd["fns"], result_folder,
                         camera_params=_CAMERA_PKL_PARAMS)
        if save_extras is not None:
            save_extras(wd["fns"], result)
        results.append(result)
        # per-term optimizer scalars, as the reference logs each closure
        # call to tensorboard (fitting_temp_slide.py:293-307)
        if logger is not None and result.term_history:
            start_step = widx * cfg.maxiters
            stride = max(cfg.maxiters // 50, 1)
            for s in range(0, cfg.maxiters, stride):
                logger.log_scalars("optimize", {
                    k: float(v[s]) for k, v in result.term_history.items()
                }, start_step + s)
        if verbose:
            print(f"[window {widx + 1}/{n_windows}] frames "
                  f"{ds.windows[widx]}: loss {result.final_loss:.4f} "
                  f"({time.time() - t0:.1f}s)")
    return results
