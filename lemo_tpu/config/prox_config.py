"""PROX pipeline configuration: YAML file + CLI overrides.

Capability parity with temp_prox/cmd_parser.py:28-434 (configargparse with
YAMLConfigFileParser): every flag LEMO's shipped configs set is a field
here with the same name and default; ``--config file.yaml`` loads the
file, explicit CLI flags override it. The shipped
cfg_files/PROXD_temp_S{2,3}.yaml parse unchanged (list-valued stage
weights included).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any

import yaml


@dataclasses.dataclass
class ProxConfig:
    # paths
    recording_dir: str = ""
    output_folder: str = "fit_results"
    model_folder: str = ""
    vposer_ckpt: str = ""
    part_segm_fn: str = ""
    # run
    batch_size: int = 100
    gender: str = "male"
    gpu_id: int = 0
    interactive: bool = False
    render_results: bool = False
    save_meshes: bool = False
    use_cuda: bool = True
    float_dtype: str = "float32"
    # model
    model_type: str = "smplx"
    use_pca: bool = True
    num_pca_comps: int = 12
    flat_hand_mean: bool = False
    use_hands: bool = True
    use_face: bool = True
    use_face_contour: bool = False
    use_vposer: bool = True
    # data
    dataset: str = "openpose"
    img_folder: str = "Color"
    depth_folder: str = "Depth"
    mask_folder: str = "BodyIndex"
    mask_color_folder: str = "BodyIndexColor"
    read_depth: bool = True
    read_mask: bool = True
    mask_on_color: bool = True
    flip: bool = True
    init_mode: str = "scan"
    joints_to_ign: list = dataclasses.field(default_factory=lambda: [1, 9, 12])
    use_joints_conf: bool = True
    # camera
    camera_mode: str = "fixed"
    focal_length_x: float = 1060.53
    focal_length_y: float = 1060.38
    camera_center_x: float = 951.30
    camera_center_y: float = 536.77
    # priors
    body_prior_type: str = "l2"
    left_hand_prior_type: str = "l2"
    right_hand_prior_type: str = "l2"
    jaw_prior_type: str = "l2"
    expr_prior_type: str = "l2"
    num_gaussians: int = 8
    prior_folder: str = "priors"
    # optimizer
    optim_type: str = "adam"
    lr: float = 0.005
    maxiters: int = 900
    ftol: float = 1e-9
    gtol: float = 1e-9
    rho: float = 100.0
    trans_opt_stages: list = dataclasses.field(default_factory=lambda: [0])
    # staged loss weights (lists = one entry per stage)
    data_weights: list = dataclasses.field(default_factory=lambda: [1.0])
    body_pose_prior_weights: list = dataclasses.field(
        default_factory=lambda: [4.78e-5])
    hand_pose_prior_weights: list = dataclasses.field(
        default_factory=lambda: [4.78e-5])
    jaw_pose_prior_weights: list = dataclasses.field(
        default_factory=lambda: [0.03])
    shape_weights: list = dataclasses.field(default_factory=lambda: [0.0])
    expr_weights: list = dataclasses.field(default_factory=lambda: [0.03])
    hand_joints_weights: list = dataclasses.field(
        default_factory=lambda: [2.0])
    face_joints_weights: list = dataclasses.field(
        default_factory=lambda: [2.0])
    # depth term
    s2m: bool = False
    m2s: bool = False
    s2m_weights: list = dataclasses.field(default_factory=lambda: [5e2])
    m2s_weights: list = dataclasses.field(default_factory=lambda: [1.0])
    rho_s2m: float = 0.2
    rho_m2s: float = 0.5
    # temporal-coherence candidates for the depth Chamfer terms (opt-in):
    # evaluate s2m/m2s only on the K scan points / K body vertices whose
    # WARM-START counterpart is within `depth_candidates_margin` (one
    # exact bidirectional Chamfer pass per window picks them; non-
    # candidates contribute their frozen warm-start robustified distance,
    # so the energy is exact at refresh time). Cuts the Chamfer pair
    # count from S*V to K^2 per frame. 0 = off (full clouds, exact).
    depth_candidates: int = 0
    depth_candidates_margin: float = 0.1
    # with depth_candidates on, also freeze the z-buffer visibility of
    # the candidate vertices at refresh time: the per-step full-body
    # splat is the dominant depth-term cost once the NN pairs are
    # subset-sized (same amortization contract; visibility is a
    # stop-gradient heuristic the reference recomputes per iteration).
    # False restores per-step live visibility.
    depth_frozen_visibility: bool = True
    # optimizer steps per device dispatch (tunneled-TPU watchdog guard;
    # lower it when slow terms like interpenetration are enabled)
    steps_per_dispatch: int = 100
    # interpenetration
    interpenetration: bool = False
    coll_loss_weights: list = dataclasses.field(default_factory=lambda: [1e-5])
    df_cone_height: float = 0.0001
    penalize_outside: bool = True
    max_collisions: int = 128
    ign_part_pairs: list = dataclasses.field(default_factory=lambda: [
        "9,16", "9,17", "6,16", "6,17", "1,2", "12,22"])
    # scene terms
    sdf_penetration: bool = True
    # bf16-packed SDF sampling: 2x faster penetration term at bf16 grid
    # precision; set False for bit-exact fp32 trilinear parity
    sdf_packed: bool = True
    # fp8-quad SDF sampling (opt-in): 3.8x faster, ~2 mm SDF resolution
    sdf_fp8: bool = False
    # candidate-vertex SDF sampling (opt-in): sample the penetration term
    # only at the K vertices whose warm-start body comes within
    # `sdf_candidates_margin` of the scene (computed once per window, like
    # the infill pre-pass). 0 = off (sample all vertices, exact parity).
    sdf_candidates: int = 0
    sdf_candidates_margin: float = 0.15
    sdf_penetration_weights: list = dataclasses.field(
        default_factory=lambda: [0.003])
    contact: bool = False
    load_scene: bool = True
    contact_loss_weights: list = dataclasses.field(
        default_factory=lambda: [1.0])
    contact_body_parts: list = dataclasses.field(default_factory=lambda: [
        "L_Leg", "R_Leg", "L_Hand", "R_Hand", "gluteus", "back", "thighs"])
    # frames per chunk of the self-intersection term's dense fallback
    # (memory/latency trade; ops.intersection.batched_self_intersection)
    coll_frame_chunk: int = 2
    # temporal-coherence broad phase for the self-intersection term
    # (opt-in): evaluate the cone energy only on the K faces whose
    # warm-start body has a valid collision partner within
    # `coll_candidates_margin` of bounding-sphere overlap (per frame,
    # computed once per window like sdf_candidates). O(K^2) per step
    # instead of O(F^2) — the amortized analog of the reference's
    # per-step CUDA BVH rebuild. 0 = off (full sweep, exact).
    coll_candidates: int = 0
    coll_candidates_margin: float = 0.05
    # smoothness terms
    smooth_acc: bool = False
    smooth_acc_weights: list = dataclasses.field(default_factory=lambda: [1e6])
    smooth_vel: bool = False
    smooth_vel_weights: list = dataclasses.field(default_factory=lambda: [1e3])
    use_motion_smooth_prior: bool = True
    AE_Enc_path: str = ""
    # normalization stats for the smoothness prior; empty = derived from
    # AE_Enc_path per the reference's directory layout (driver.load_assets)
    smooth_stats_path: str = ""
    motion_prior_smooth_weights: list = dataclasses.field(
        default_factory=lambda: [1e8])
    # friction
    use_friction: bool = True
    friction_normal_weights: list = dataclasses.field(
        default_factory=lambda: [10.0])
    friction_tangent_weights: list = dataclasses.field(
        default_factory=lambda: [20.0])
    # motion infill
    use_motion_infill_prior: bool = False
    use_motion_infill: bool = False
    # per-window self-supervised AE finetune steps of the infill
    # pre-pass (the reference hardcodes 60, fitting_temp_slide.py:861);
    # ~0.5 TFLOP of conv fwd+bwd per window-step, so CPU smoke runs and
    # the multichip dryrun turn it down
    infill_finetune_steps: int = 60
    AE_infill_path: str = ""
    # 4-channel local-marker stats for the infill prior; empty = the
    # stats npz shipped next to the AE asset (driver.load_assets)
    infill_stats_path: str = ""
    conv_kernel: int = 3
    motion_infill_rec_weights: list = dataclasses.field(
        default_factory=lambda: [2.0])
    motion_infill_contact_weights: list = dataclasses.field(
        default_factory=lambda: [0.1])
    # frame selection (data_parser_slide.py:188-191; frame_ids are
    # 1-based and win over start/step)
    start: int = 0
    step: int = 1
    frame_ids: list | None = None
    # camera init (fitting_temp_slide.py guess_init /
    # SMPLifyCameraInitLoss; cmd_parser defaults)
    init_joints_idxs: list = dataclasses.field(
        default_factory=lambda: [9, 12, 2, 5])
    body_tri_idxs: list = dataclasses.field(
        default_factory=lambda: [[5, 12], [2, 9]])
    camera_type: str = "persp"     # create_camera: 'persp' only
    loss_type: str = "smplify"     # create_loss: 'smplify' only
    # accepted for reference-CLI compatibility; inherited from SMPLify-X
    # and never consumed by LEMO's temp_prox pipeline (cmd_parser.py
    # declares them, fit_temp_loadprox_slide never reads them)
    point2plane: bool = False
    contact_angle: float = 45.0
    rho_contact: float = 1.0
    optim_shape: bool = True
    optim_hands: bool = True
    optim_expression: bool = True
    optim_jaw: bool = True
    gender_lbl_type: str = "none"
    max_persons: int = 3
    side_view_thsh: float = 25.0
    degrees: list = dataclasses.field(
        default_factory=lambda: [0, 90, 180, 270])
    depth_loss_weight: float = 1e2
    visualize: bool = False
    viz_mode: str = "o3d"
    mesh_folder: str = "meshes"
    summary_folder: str = "summaries"
    # misc
    result_folder: str = "results"
    num_stages: int | None = None
    # multi-chip: fit all windows concurrently, window axis sharded over
    # the device mesh (new capability — the reference is single-GPU
    # sequential; see window.make_batched_window_fitter for semantics)
    window_parallel: bool = False
    # after the parallel fit, re-fit windows for this many extra
    # iterations with each window's overlap head re-warm-started from the
    # PREVIOUS window's fresh solution — restores the reference's
    # sequential stitching semantics (fitting_temp_slide.py:283-289).
    # 0 disables the polish pass.
    window_polish_iters: int = 100
    # polish scheduling: 'jacobi' (default) runs window_polish_rounds
    # Jacobi rounds of the BATCHED fitter (all windows concurrently,
    # heads re-injected between rounds) — the whole polish stays one
    # device program that shards over the mesh; 'sequential' is the
    # Gauss-Seidel chain (window w re-fit after w-1, exactly the
    # reference's window order) — unshardable, kept for parity checks.
    window_polish_mode: str = "jacobi"
    # jacobi rounds; every round runs at least one compiled optimizer
    # chunk (min(steps_per_dispatch, maxiters) steps), so the driver
    # clamps the count to keep TOTAL polish at window_polish_iters
    window_polish_rounds: int = 3
    # grow coll_candidates automatically when the warm-start pre-pass
    # finds more FIRING faces than K (rounded up to a tile multiple), so
    # the subset energy is exact at refresh time at shipped settings
    coll_candidates_auto: bool = True
    # rebuild the sdf/coll/depth candidate sets from each stage's warm
    # start in multi-stage fits (stage>0 would otherwise reuse stage-0
    # candidates computed from a now-stale warm start)
    candidates_refresh_stages: bool = True
    # overlap host-side loading of window i+1 (cv2 depth reads + scan
    # unprojection) with the device fit of window i; warm-start pkls are
    # still read only after the previous window saved (resume semantics)
    prefetch_windows: bool = True

    @property
    def n_stages(self) -> int:
        """Number of optimization stages: the longest per-stage weight
        list (the reference zips the lists and runs the optimizer once
        per entry, fit_temp_loadprox_slide.py:377-417,507-528).
        `num_stages` overrides when set."""
        if self.num_stages:
            return int(self.num_stages)
        lists = [
            self.data_weights, self.body_pose_prior_weights,
            self.hand_pose_prior_weights, self.jaw_pose_prior_weights,
            self.shape_weights, self.expr_weights,
            self.hand_joints_weights, self.face_joints_weights,
            self.s2m_weights, self.m2s_weights, self.coll_loss_weights,
            self.sdf_penetration_weights, self.contact_loss_weights,
            self.smooth_acc_weights, self.smooth_vel_weights,
            self.motion_prior_smooth_weights,
            self.friction_normal_weights, self.friction_tangent_weights,
            self.motion_infill_rec_weights,
            self.motion_infill_contact_weights,
        ]
        return max(len(x) for x in lists if isinstance(x, list))

    def stage_weights(self, stage: int = 0) -> dict[str, float]:
        """Flatten the per-stage weight lists into a single-stage dict
        (LEMO's shipped configs use one stage)."""
        def at(lst):
            v = lst[min(stage, len(lst) - 1)]
            return float(v)

        return {
            "data": at(self.data_weights),
            "body_pose": at(self.body_pose_prior_weights),
            "hand_prior": at(self.hand_pose_prior_weights),
            "jaw": at(self.jaw_pose_prior_weights),
            "shape": at(self.shape_weights),
            "expr": at(self.expr_weights),
            "s2m": at(self.s2m_weights) if self.s2m else 0.0,
            "m2s": at(self.m2s_weights) if self.m2s else 0.0,
            "coll": (at(self.coll_loss_weights)
                     if self.interpenetration else 0.0),
            "sdf_penetration": (at(self.sdf_penetration_weights)
                                if self.sdf_penetration else 0.0),
            "contact": at(self.contact_loss_weights) if self.contact else 0.0,
            "smooth_acc": (at(self.smooth_acc_weights)
                           if self.smooth_acc else 0.0),
            "smooth_vel": (at(self.smooth_vel_weights)
                           if self.smooth_vel else 0.0),
            "motion_smooth": (at(self.motion_prior_smooth_weights)
                              if self.use_motion_smooth_prior else 0.0),
            "friction_normal": (at(self.friction_normal_weights)
                                if self.use_friction else 0.0),
            "friction_tangent": (at(self.friction_tangent_weights)
                                 if self.use_friction else 0.0),
            "motion_infill_rec": (at(self.motion_infill_rec_weights)
                                  if self.use_motion_infill_prior else 0.0),
            "motion_infill_contact": (
                at(self.motion_infill_contact_weights)
                if self.use_motion_infill_prior else 0.0),
            "rho_s2m": float(self.rho_s2m),
            "rho_m2s": float(self.rho_m2s),
        }


def _coerce(value: str, field_type: Any):
    if field_type is bool or isinstance(field_type, bool):
        return str(value).lower() in ("1", "true", "yes", "on")
    return value


def parse_config(argv: list[str] | None = None) -> ProxConfig:
    """--config file.yaml + `--key value` overrides -> ProxConfig."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", type=str, default=None)
    known, rest = pre.parse_known_args(argv)

    cfg = ProxConfig()
    fields = {f.name: f for f in dataclasses.fields(ProxConfig)}

    if known.config:
        with open(known.config) as fh:
            loaded = yaml.safe_load(fh) or {}
        for k, v in loaded.items():
            if k in fields:
                cur = getattr(cfg, k)
                if isinstance(cur, bool):
                    v = v if isinstance(v, bool) else _coerce(v, bool)
                elif isinstance(cur, list) and not isinstance(v, list):
                    v = [v]
                elif isinstance(cur, (int, float)) and isinstance(v, str):
                    v = type(cur)(float(v))
                elif isinstance(cur, list) and isinstance(v, list):
                    v = [float(x) if isinstance(x, str) and
                         _is_number(x) else x for x in v]
                setattr(cfg, k, v)

    # CLI overrides: --key value (repeated values build lists)
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok.startswith("--"):
            key = tok[2:].replace("-", "_")
            vals = []
            j = i + 1
            while j < len(rest) and not rest[j].startswith("--"):
                vals.append(rest[j])
                j += 1
            if key in fields:
                cur = getattr(cfg, key)
                if key == "frame_ids":
                    # None-default list field: --frame_ids 1 2 3
                    setattr(cfg, key, [int(float(v)) for v in vals])
                elif isinstance(cur, bool):
                    setattr(cfg, key, _coerce(vals[0] if vals else "true", bool))
                elif isinstance(cur, list):
                    setattr(cfg, key, [float(v) if _is_number(v) else v
                                       for v in vals])
                elif isinstance(cur, int):
                    setattr(cfg, key, int(float(vals[0])))
                elif isinstance(cur, float):
                    setattr(cfg, key, float(vals[0]))
                else:
                    setattr(cfg, key, vals[0])
            i = j
        else:
            i += 1
    return cfg


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False
