"""AMASS mocap plumbing: sequence scan, fps resampling, clip chunking, and
batched on-device body-representation building.

Capability parity with the three reference loaders
(loader/train_loader_smooth.py, train_loader_infill.py,
optimize_loader_amass_new.py), redesigned TPU-first:

- the file scan / resample / chunk stage is host-side numpy (IO bound);
- the SMPL-X forward that turns each clip's parameters into markers — the
  preprocessing hot loop the reference runs clip-by-clip on GPU
  (train_loader_smooth.py:100-176) — is a single jitted, batched forward
  over [B*T] frames here, optionally sharded across devices;
- the representation transforms are the jittable functions in
  :mod:`lemo_tpu.data.repr`.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.data import markers as mk
from lemo_tpu.data import repr as rep
from lemo_tpu.data.stats import GlobalStats, Local4ChanStats, LocalFlatStats

AMASS_TRAIN_DATASETS = [
    "HumanEva", "MPI_HDM05", "MPI_mosh", "Transitions_mocap", "ACCAD",
    "BMLhandball", "BMLmovi", "BioMotionLab_NTroje", "CMU", "DFaust_67",
    "Eyes_Japan_Dataset", "MPI_Limits",
]
AMASS_TEST_DATASETS = ["TCD_handMocap", "TotalCapture", "SFU"]

_SAMPLE_RATE = {150: 5, 120: 4, 60: 2}  # -> 30 fps (train_loader_smooth.py:39-46)


@dataclasses.dataclass
class Clip:
    """One fixed-length mocap clip at 30 fps."""

    trans: np.ndarray   # [T, 3]
    poses: np.ndarray   # [T, 156]
    betas: np.ndarray   # [16]
    gender: str
    src_fps: int


def scan_amass(datasets: Iterable[str], amass_dir: str,
               clip_seconds: int = 4) -> list[Clip]:
    """Scan ``<amass_dir>/<dataset>/*/*_poses.npz`` and cut non-overlapping
    clips resampled to 30 fps (divide_clip, train_loader_smooth.py:27-74)."""
    clips: list[Clip] = []
    for ds in datasets:
        for fn in sorted(glob.glob(os.path.join(amass_dir, ds, "*", "*_poses.npz"))):
            cdata = np.load(fn)
            fps = int(cdata["mocap_framerate"])
            if fps not in _SAMPLE_RATE:
                continue
            rate = _SAMPLE_RATE[fps]
            clip_len = clip_seconds * fps
            N = len(cdata["poses"])
            if N < clip_len:
                continue
            trans, poses = cdata["trans"], cdata["poses"]
            betas, gender = cdata["betas"], str(cdata["gender"])
            for i in range(N // clip_len):
                sl = slice(clip_len * i, clip_len * (i + 1), rate)
                clips.append(Clip(
                    trans=np.asarray(trans[sl], np.float32),
                    poses=np.asarray(poses[sl], np.float32),
                    betas=np.asarray(betas, np.float32),
                    gender=gender,
                    src_fps=fps,
                ))
    return clips


def _clip_params(clip: Clip, T: int) -> dict[str, np.ndarray]:
    return {
        "transl": clip.trans[:T],
        "global_orient": clip.poses[:T, 0:3],
        "body_pose": clip.poses[:T, 3:66],
        "left_hand_pose": clip.poses[:T, 66:111],
        "right_hand_pose": clip.poses[:T, 111:156],
        "betas": np.tile(clip.betas[:10], (T, 1)).astype(np.float32),
    }


class AmassRepresentationBuilder:
    """Batched marker/joint extraction + representation building.

    Uses a gendered pair of SMPL-X models with ``use_pca=False,
    flat_hand_mean=True`` — the exact configuration of the reference's
    preprocessing models (train_loader_smooth.py:86-97).
    """

    def __init__(self, smplx_model_path_or_dicts, with_hand: bool = False,
                 markerset_json: str | None = None):
        if isinstance(smplx_model_path_or_dicts, dict):
            # {'male': dict, 'female': dict} raw model dicts (tests)
            self.models = {
                g: load_model(d, gender=g, use_pca=False, flat_hand_mean=True)
                for g, d in smplx_model_path_or_dicts.items()
            }
        else:
            from lemo_tpu.body_model.smplx import find_smplx_npz

            self.models = {
                g: load_model(
                    find_smplx_npz(smplx_model_path_or_dicts, g),
                    gender=g, use_pca=False, flat_hand_mean=True)
                for g in ("male", "female")
            }
        any_model = next(iter(self.models.values()))
        self._fwd = jax.jit(make_forward_fn(any_model))
        self.marker_ids = jnp.asarray(mk.marker_indices(
            with_hand=with_hand, markerset_json=markerset_json,
            num_verts=any_model.num_verts))
        self.with_hand = with_hand
        # per-mode jitted representation transforms: the Holden pipeline
        # is dozens of tiny ops — eager per-clip execution costs one
        # device round-trip EACH (minutes per corpus through a tunneled
        # TPU); jitted it is one dispatch per clip
        self._jit_cache: dict = {}

    def _jitted(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def markers_and_joints(self, clip: Clip, T: int):
        """Run the body model over one clip; returns (markers [T, M, 3],
        joints [T, K, 3]) on device."""
        model = self.models.get(clip.gender, next(iter(self.models.values())))
        params = {k: jnp.asarray(v) for k, v in _clip_params(clip, T).items()}
        # zero-fill remaining smplx params
        zeros = model.zero_params(T)
        for k in zeros:
            params.setdefault(k, zeros[k])
        out = self._fwd(params, model.consts)
        markers = out["vertices"][:, self.marker_ids, :]
        return markers, out["joints"]

    # ------------------------------------------------------------------
    # representation modes (train_smooth / train_infill / fit loaders)
    # ------------------------------------------------------------------

    def global_markers(self, clip: Clip, T: int) -> jnp.ndarray:
        """[T, M*3] frame-0-normalized global marker image
        (mode='global_markers', train_loader_smooth.py:164-167)."""
        markers, joints = self.markers_and_joints(clip, T)
        return self._jitted("gm", lambda m, j: rep.global_marker_image(
            m, j[0, :25]))(markers, joints)

    def local_markers_4chan(self, clip: Clip, T: int,
                            smooth_forward: bool = True):
        """([4, T-1, d], rot_0_pivot) infill representation
        (mode='local_markers_4chan', train_loader_infill.py:125-275)."""
        markers, joints = self.markers_and_joints(clip, T)

        def xform(m, j):
            joints_n = rep.normalize_to_frame0(j[:, :25], j[0, :25])
            markers_n = rep.normalize_to_frame0(m, j[0, :25])
            contact = rep.contact_labels_from_markers(markers_n)
            pm = jnp.concatenate([joints_n[:, 0:1], markers_n], axis=1)
            return rep.local_markers_4chan(pm, contact,
                                           smooth_forward=smooth_forward)

        return self._jitted(("lm4", smooth_forward), xform)(markers, joints)

    def local_markers(self, clip: Clip, T: int, smooth_forward: bool = True):
        """([T-1, 3+(1+67)*3+4], pivot) single-channel infill mode
        (mode='local_markers', train_loader_infill.py:261-264)."""
        markers, joints = self.markers_and_joints(clip, T)

        def xform(m, j):
            joints_n = rep.normalize_to_frame0(j[:, :25], j[0, :25])
            markers_n = rep.normalize_to_frame0(m, j[0, :25])
            contact = rep.contact_labels_from_markers(markers_n)
            pm = jnp.concatenate([joints_n[:, 0:1], markers_n], axis=1)
            return rep.local_markers_flat(pm, contact,
                                          smooth_forward=smooth_forward)

        return self._jitted(("lmf", smooth_forward), xform)(markers, joints)

    def local_joints_4chan(self, clip: Clip, T: int,
                           smooth_forward: bool = True):
        """Joint-based 4-channel variant (mode='local_joints_4chan',
        train_loader_infill.py:149-173 contact labels from foot joints).

        Exact parity with the reference's joint path: the joint-slot
        layout (sdr/hip at joints 16/17/1/2, final row = joint_id + 1
        after the reference row, train_loader_infill.py:234-235), foot
        joints 7/8/10/11 for contact, and the shared Holden transform —
        pinned against the numpy oracle in
        tests/test_parity_oracle.py::test_joint_mode_matches_oracle."""
        _, joints = self.markers_and_joints(clip, T)

        def xform(j):
            joints_n = rep.normalize_to_frame0(j[:, :25], j[0, :25])
            # foot joints 7/8 (ankles), 10/11 (feet): velocity + height
            feet = joints_n[:, jnp.asarray([7, 8, 10, 11]), :]
            vel = jnp.linalg.norm((feet[1:] - feet[:-1]) * 30.0, axis=-1)
            vel_c = jnp.concatenate(
                [(jnp.abs(vel) < 0.22).astype(jnp.float32),
                 jnp.zeros((1, 4))], axis=0)
            z_thr = joints_n[:, :, -1].min() + 0.10
            h_c = (feet[:, :, 2] < z_thr).astype(jnp.float32)
            contact = (vel_c * h_c).at[-1].set(h_c[-1])
            # joints already carry the pelvis at row 0; shoulder/hip
            # direction rows are the joint indices themselves
            return rep.local_markers_4chan(
                joints_n, contact, smooth_forward=smooth_forward,
                direction_slots=(16, 17, 1, 2))

        return self._jitted(("lj4", smooth_forward), xform)(joints)

    def global_joints(self, clip: Clip, T: int, with_hand: bool = False):
        """[T, 25*3 or 55*3] (mode='global_joints',
        train_loader_smooth.py:148-156)."""
        _, joints = self.markers_and_joints(clip, T)
        k = 55 if with_hand else 25
        return self._jitted(("gj", k), lambda jj: rep.normalize_to_frame0(
            jj[:, :k], jj[0, :25]).reshape(jj.shape[0], -1))(joints)

    def local_joints(self, clip: Clip, T: int, with_hand: bool = False):
        """[T, 25*3 or 55*3] pelvis-relative (mode='local_joints',
        train_loader_smooth.py:158-162)."""
        _, joints = self.markers_and_joints(clip, T)
        k = 55 if with_hand else 25
        return self._jitted(("lj", k), lambda jj: rep.local_joint_image(
            jj[:, :k], jj[0, :25]))(joints)

    def gt_eval_data(self, clip: Clip, T: int):
        """Ground-truth hooks for 3D-accuracy evaluation.

        Returns (smplx_params_gt [T, 169], transf_matrix_smplx [4, 4]):
        the GT parameter rows ``[transl(3) | global_orient(3) | betas(10)
        | body_pose(63) | lhand(45) | rhand(45)]`` and the homogeneous
        transform taking AMASS-world points into the canonical fitted
        frame (frame-0 normalized + put-on-floor) — the reference
        fitting loader's evaluation extras
        (optimize_loader_amass_new.py:283-308, layout :300-302)."""
        markers, joints = self.markers_and_joints(clip, T)

        def xform(m, j):
            R, origin = rep.frame0_normalizer(j[0, :25])
            pm = jnp.concatenate([j[:, 0:1], m], axis=1)
            pm_n = jnp.matmul(pm - origin, R)
            # 'put on floor' shift, measured over pelvis+markers exactly
            # like the Holden transform (optimize_loader_amass_new.py:219)
            z_transl = pm_n[:, :, 2].min()
            t1 = jnp.eye(4).at[0:3, 3].set(-origin)
            t2 = jnp.eye(4).at[0:3, 0:3].set(R.T)
            t3 = jnp.eye(4).at[2, 3].set(-z_transl)
            return t3 @ t2 @ t1

        transf = self._jitted("gt_transf", xform)(markers, joints)
        p = _clip_params(clip, T)
        params_gt = np.concatenate(
            [p["transl"], p["global_orient"], p["betas"], p["body_pose"],
             p["left_hand_pose"], p["right_hand_pose"]],
            axis=-1).astype(np.float32)                       # [T, 169]
        return params_gt, np.asarray(transf)


def build_dataset(
    builder: AmassRepresentationBuilder,
    clips: list[Clip],
    mode: str,
    clip_seconds: int = 4,
    smooth_forward: bool = True,
    with_gt: bool = False,
):
    """Materialize the full clip-image tensor for a clip list.

    Returns (images, aux) where images is [N, T, d] for 'global_markers'
    or [N, 4, T-1, d] for 'local_markers_4chan'; aux carries rot_0_pivot,
    betas, gender per clip (the fitting loader's extras,
    optimize_loader_amass_new.py:371-388). With ``with_gt``, aux also
    carries the 3D-accuracy hooks smplx_params_gt [N, T, 169] and
    transf_matrix_smplx [N, 4, 4] (optimize_loader_amass_new.py:283-308).
    """
    T = clip_seconds * 30
    images, pivots, betas, genders = [], [], [], []
    gt_params, gt_transf = [], []
    for clip in clips:
        if mode == "global_markers":
            img = builder.global_markers(clip, T)
            pivot = jnp.zeros(())
        elif mode == "local_markers_4chan":
            img, pivot = builder.local_markers_4chan(
                clip, T, smooth_forward=smooth_forward)
        elif mode == "local_markers":
            img, pivot = builder.local_markers(
                clip, T, smooth_forward=smooth_forward)
        elif mode == "global_joints":
            img = builder.global_joints(clip, T)
            pivot = jnp.zeros(())
        elif mode == "local_joints":
            img = builder.local_joints(clip, T)
            pivot = jnp.zeros(())
        else:
            raise ValueError(mode)
        images.append(np.asarray(img))
        pivots.append(float(pivot))
        betas.append(clip.betas[:10])
        genders.append(1 if clip.gender == "male" else 0)
        if with_gt:
            pg, tf = builder.gt_eval_data(clip, T)
            gt_params.append(pg)
            gt_transf.append(tf)
    images = np.stack(images)
    aux = {
        "rot_0_pivot": np.asarray(pivots, np.float32),
        "betas": np.stack(betas).astype(np.float32),
        "gender": np.asarray(genders, np.int32),
    }
    if with_gt:
        aux["smplx_params_gt"] = np.stack(gt_params)
        aux["transf_matrix_smplx"] = np.stack(gt_transf)
    return images, aux


def compute_or_load_stats(images: np.ndarray, mode: str, path: str,
                          split: str = "train"):
    """Train split: compute + persist; test split: load
    (train_loader_smooth.py:188-204)."""
    cls = {"global_markers": GlobalStats, "global_joints": GlobalStats,
           "local_joints": GlobalStats,  # (train_loader_smooth.py:196-204)
           "local_markers": LocalFlatStats,
           "local_markers_4chan": Local4ChanStats,
           "local_joints_4chan": Local4ChanStats}[mode]
    if split == "train":
        stats = cls.compute(images)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        stats.save(path)
        return stats
    return cls.load(path)
