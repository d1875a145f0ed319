"""Normalization statistics for motion-image representations.

Writes/reads the exact npz schemas the reference persists in
``preprocess_stats/`` so the shipped statistics files drop in directly:

- smooth / global_markers: keys ``Xmean`` [1, 1, d], ``Xstd`` [d]
  (train_loader_smooth.py:180-194)
- infill / local_markers_4chan: keys ``Xmean_local`` [d], ``Xstd_local``
  [d], ``Xmean_global_xy``/``Xstd_global_xy`` scalar,
  ``Xmean_global_r``/``Xstd_global_r`` scalar
  (train_loader_infill.py:304-330)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GlobalStats:
    """Smoothness-prior (global markers) statistics."""

    Xmean: np.ndarray  # [1, 1, d]
    Xstd: np.ndarray   # [d]

    @classmethod
    def compute(cls, clips: np.ndarray) -> "GlobalStats":
        """clips: [N, T, d]. Per-dim mean; single global std (the reference
        normalizes all dims by one scalar std, train_loader_smooth.py:184-185)."""
        Xmean = clips.mean(axis=1).mean(axis=0)[None, None, :]
        Xstd = np.ones(clips.shape[-1]) * clips.std()
        return cls(Xmean=Xmean, Xstd=Xstd)

    def normalize(self, x):
        return (x - jnp.asarray(self.Xmean, x.dtype)) / jnp.asarray(self.Xstd, x.dtype)

    def denormalize(self, x):
        return x * jnp.asarray(self.Xstd, x.dtype) + jnp.asarray(self.Xmean, x.dtype)

    def save(self, path: str) -> None:
        np.savez_compressed(path, Xmean=self.Xmean, Xstd=self.Xstd)

    @classmethod
    def load(cls, path: str) -> "GlobalStats":
        z = np.load(path)
        return cls(Xmean=np.asarray(z["Xmean"]), Xstd=np.asarray(z["Xstd"]))


@dataclasses.dataclass
class LocalFlatStats:
    """Single-channel local_markers/local_joints statistics
    (train_loader_infill.py:287-302): per-dim mean with contact dims
    pinned, blockwise stds (global vel xy / rot vel / local pose)."""

    Xmean: np.ndarray  # [d]
    Xstd: np.ndarray   # [d]

    @classmethod
    def compute(cls, clips: np.ndarray) -> "LocalFlatStats":
        """clips: [N, T, d] with layout [gvel(3) | local | contact(4)]."""
        Xmean = clips.mean(axis=1).mean(axis=0)
        Xmean[-4:] = 0.0
        Xstd = np.ones(clips.shape[-1])
        Xstd[0:2] = clips[:, :, 0:2].std()
        Xstd[2] = clips[:, :, 2].std()
        Xstd[3:-4] = clips[:, :, 3:-4].std()
        Xstd[-4:] = 1.0
        return cls(Xmean=Xmean, Xstd=Xstd)

    def normalize(self, x):
        return (x - jnp.asarray(self.Xmean, x.dtype)) / \
            jnp.asarray(self.Xstd, x.dtype)

    def denormalize(self, x):
        return x * jnp.asarray(self.Xstd, x.dtype) + \
            jnp.asarray(self.Xmean, x.dtype)

    def save(self, path: str) -> None:
        np.savez_compressed(path, Xmean=self.Xmean, Xstd=self.Xstd)

    @classmethod
    def load(cls, path: str) -> "LocalFlatStats":
        z = np.load(path)
        return cls(Xmean=np.asarray(z["Xmean"]), Xstd=np.asarray(z["Xstd"]))


@dataclasses.dataclass
class Local4ChanStats:
    """Infill-prior (local_markers_4chan) statistics."""

    Xmean_local: np.ndarray      # [d]
    Xstd_local: np.ndarray       # [d]
    Xmean_global_xy: float
    Xstd_global_xy: float
    Xmean_global_r: float
    Xstd_global_r: float

    @classmethod
    def compute(cls, clips: np.ndarray) -> "Local4ChanStats":
        """clips: [N, 4, T, d]. Channel 0 gets per-dim mean / scalar std
        with the 4 contact-label dims pinned to (0, 1); channels 1-2 and 3
        get scalar stats (train_loader_infill.py:304-316)."""
        d = clips.shape[-1]
        Xmean_local = clips[:, 0].mean(axis=1).mean(axis=0)
        Xmean_local[-4:] = 0.0
        Xstd_local = np.ones(d) * clips[:, 0].std()
        Xstd_local[-4:] = 1.0
        return cls(
            Xmean_local=Xmean_local,
            Xstd_local=Xstd_local,
            Xmean_global_xy=float(clips[:, 1:3].mean()),
            Xstd_global_xy=float(clips[:, 1:3].std()),
            Xmean_global_r=float(clips[:, 3].mean()),
            Xstd_global_r=float(clips[:, 3].std()),
        )

    def normalize(self, img):
        """img: [..., 4, T, d] -> normalized, channelwise."""
        c0 = (img[..., 0, :, :] - jnp.asarray(self.Xmean_local, img.dtype)) / \
            jnp.asarray(self.Xstd_local, img.dtype)
        cxy = (img[..., 1:3, :, :] - self.Xmean_global_xy) / self.Xstd_global_xy
        cr = (img[..., 3, :, :] - self.Xmean_global_r) / self.Xstd_global_r
        return jnp.concatenate(
            [c0[..., None, :, :], cxy, cr[..., None, :, :]], axis=-3)

    def denormalize_flat(self, flat):
        """flat: [..., T, 3 + d_local] rows assembled as
        [global_xy(2), global_r(1), local(d)] — the fitters' layout after
        concatenating the trajectory channels in front
        (opt_amass_perframe.py:263-274)."""
        gxy = flat[..., 0:2] * self.Xstd_global_xy + self.Xmean_global_xy
        gr = flat[..., 2:3] * self.Xstd_global_r + self.Xmean_global_r
        loc = flat[..., 3:] * jnp.asarray(self.Xstd_local[:-4], flat.dtype) + \
            jnp.asarray(self.Xmean_local[:-4], flat.dtype)
        return jnp.concatenate([gxy, gr, loc], axis=-1)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            Xmean_local=self.Xmean_local, Xstd_local=self.Xstd_local,
            Xmean_global_xy=self.Xmean_global_xy,
            Xstd_global_xy=self.Xstd_global_xy,
            Xmean_global_r=self.Xmean_global_r,
            Xstd_global_r=self.Xstd_global_r,
        )

    @classmethod
    def load(cls, path: str) -> "Local4ChanStats":
        z = np.load(path)
        return cls(
            Xmean_local=np.asarray(z["Xmean_local"]),
            Xstd_local=np.asarray(z["Xstd_local"]),
            Xmean_global_xy=float(z["Xmean_global_xy"]),
            Xstd_global_xy=float(z["Xstd_global_xy"]),
            Xmean_global_r=float(z["Xmean_global_r"]),
            Xstd_global_r=float(z["Xstd_global_r"]),
        )
