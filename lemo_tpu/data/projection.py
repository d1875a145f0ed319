"""Kinect depth-camera unprojection and registration (host-side numpy).

Capability parity with temp_prox/projection_utils.py:23-129: undistorted
depth-pixel unprojection to 3-D, projection into the color camera, and
masked scan-cloud creation. cv2 is used for the lens-distortion solve
exactly as the reference does; everything else is vectorized numpy.
"""

from __future__ import annotations

import json
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this image
    cv2 = None


class KinectProjection:
    def __init__(self, calib_dir: str):
        with open(osp.join(calib_dir, "IR.json")) as fh:
            self.depth_cam = json.load(fh)
        with open(osp.join(calib_dir, "Color.json")) as fh:
            self.color_cam = json.load(fh)

    def unproject_depth_image(self, depth_image: np.ndarray,
                              cam: dict) -> np.ndarray:
        """depth [H, W] -> world xyz [H, W, 3] (projection_utils.py:35-48)."""
        H, W = depth_image.shape
        us = np.arange(depth_image.size) % W
        vs = np.arange(depth_image.size) // W
        ds = depth_image.ravel()
        uv = np.stack([us, vs], axis=1).astype(np.float64)
        xy_undist = cv2.undistortPoints(
            uv.reshape((1, -1, 2)).copy(),
            np.asarray(cam["camera_mtx"]), np.asarray(cam["k"]))
        xyz = np.concatenate([xy_undist.reshape(-1, 2), ds[:, None]], axis=1)
        xyz[:, :2] *= xyz[:, 2:3]
        view = np.asarray(cam["view_mtx"])  # [3, 4]
        xyz = (xyz - view[:, 3][None]) @ view[:, :3]
        return xyz.reshape(H, W, 3)

    def project_points(self, v: np.ndarray, cam: dict) -> np.ndarray:
        v = v.reshape(-1, 3).copy()
        out, _ = cv2.projectPoints(
            v, np.asarray(cam["R"]), np.asarray(cam["T"]),
            np.asarray(cam["camera_mtx"]), np.asarray(cam["k"]))
        return out.squeeze()

    def create_scan(self, mask: np.ndarray, depth_im: np.ndarray,
                    mask_on_color: bool = True, coord: str = "color",
                    thresh: float = 1e-2) -> dict:
        """Masked depth -> point cloud in color-camera coordinates
        (projection_utils.py:54-90)."""
        depth = depth_im.copy()
        if not mask_on_color:
            depth[mask != 0] = 0
        points = self.unproject_depth_image(depth, self.depth_cam)
        points = points.reshape(-1, 3)
        uvs = np.round(self.project_points(points, self.color_cam)).astype(int)
        valid = (uvs[:, 1] >= 0) & (uvs[:, 1] < 1080) & \
                (uvs[:, 0] >= 0) & (uvs[:, 0] < 1920)
        if mask_on_color:
            vm = valid.copy()
            sel = uvs[valid]
            vm[valid] = mask[sel[:, 1], sel[:, 0]] == 0
            points = points[vm]
        else:
            points = points[valid]
        if coord == "color":
            view = np.asarray(self.color_cam["view_mtx"])
            points = points @ view[:, :3].T + view[:, 3][None]
        keep = points[:, 2] > thresh
        return {"points": np.ascontiguousarray(points[keep])}
