"""Numerical parity of the Holden transform + global reconstruction against
an independent numpy oracle, at the golden `res_opt_amass_temp` production
shapes ([119, 72] params, [119, 4] contact labels, 67 markers).

The oracle (lemo_tpu.testing.oracle_holden) re-derives the reference
`utils/utils.py:184-265` semantics with explicit quaternion formulas; these
tests pin the JAX implementations to it, using the reference's committed
golden contact-label arrays as inputs where available.
"""

import glob
import os

import numpy as np
import jax.numpy as jnp
import pytest

from lemo_tpu.data.repr import local_markers_4chan, reconstruct_global_body
from lemo_tpu.testing.oracle_holden import (get_local_markers_4chan_np,
                                            reconstruct_global_body_np)

GOLDEN_T = "/root/reference/res_opt_amass_temp/TotalCapture"
RNG = np.random.RandomState(3)


def _smooth_trajectory(T=119, N=68, seed=5):
    """A smooth synthetic walking-scale trajectory [T, N, 3] z-up: random
    body offsets around a drifting, turning pelvis."""
    rng = np.random.RandomState(seed)
    heading = np.cumsum(rng.randn(T) * 0.03)
    step = np.stack([np.cos(heading), np.sin(heading),
                     np.zeros(T)], 1) * 0.02
    pelvis = np.cumsum(step, axis=0) + np.array([0, 0, 0.9])
    offsets = rng.randn(1, N, 3) * 0.25
    wobble = 0.01 * np.sin(np.linspace(0, 8, T))[:, None, None] \
        * rng.randn(1, N, 3)
    body = pelvis[:, None, :] + offsets + wobble
    body[:, 0] = pelvis  # row 0 is the pelvis
    return body.astype(np.float32)


def _contact_lbls(T=119):
    files = sorted(glob.glob(
        os.path.join(GOLDEN_T, "contact_lbl_rec_clip_*.npy")))
    if files:
        lbl = np.load(files[0]).astype(np.float32)
        if lbl.shape[0] >= T:
            return lbl[:T]
    return (RNG.rand(T, 4) > 0.5).astype(np.float32)


class TestHoldenTransformParity:
    @pytest.mark.parametrize("smooth", [False, True])
    def test_4chan_image_matches_oracle(self, smooth):
        body = _smooth_trajectory()
        lbl = _contact_lbls()
        img_j, rot0_j = local_markers_4chan(
            jnp.asarray(body), jnp.asarray(lbl), smooth_forward=smooth)
        img_n, rot0_n = get_local_markers_4chan_np(body, lbl,
                                                   smooth_forward=smooth)
        assert img_j.shape == (4, 118, 68 * 3 + 4)
        np.testing.assert_allclose(np.asarray(img_j), img_n,
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(float(rot0_j), rot0_n, atol=1e-5)

    def test_reconstruct_matches_oracle(self):
        """Decompose -> reconstruct, JAX vs oracle, at [119, ...] scale:
        the sequential scan must integrate identically."""
        body = _smooth_trajectory(seed=9)
        lbl = _contact_lbls()
        img_n, rot0 = get_local_markers_4chan_np(body, lbl)

        T1 = img_n.shape[1]
        local = img_n[0][:, : 68 * 3].reshape(T1, 68, 3)
        traj = np.stack([img_n[1][:, 0], img_n[2][:, 0], img_n[3][:, 0]],
                        axis=1)[:, None, :]
        zero = np.zeros((T1, 1, 3))
        stacked = np.concatenate([zero, local, traj], axis=1)

        out_j = np.asarray(reconstruct_global_body(
            jnp.asarray(stacked, jnp.float32), jnp.asarray(rot0,
                                                           jnp.float32)))
        out_n = reconstruct_global_body_np(stacked, rot0)
        np.testing.assert_allclose(out_j, out_n, atol=2e-4)

    def test_joint_mode_matches_oracle(self):
        """local_joints_4chan variant: [T, 25, 3] joints (pelvis row 0),
        shoulder/hip direction at joint rows 16/17/1/2 — the reference's
        joint-slot layout (train_loader_infill.py:234-235: final index =
        joint_id + 1 after the reference row). Same transform, exact."""
        body = _smooth_trajectory(N=25, seed=21)
        lbl = _contact_lbls()
        img_j, rot0_j = local_markers_4chan(
            jnp.asarray(body), jnp.asarray(lbl), smooth_forward=True,
            direction_slots=(16, 17, 1, 2))
        # oracle applies slots+2 (ref + pelvis rows); joints carry their
        # own pelvis, so compensate: slots-1 -> final row joint_id + 1
        img_n, rot0_n = get_local_markers_4chan_np(
            body, lbl, smooth_forward=True, slots=(15, 16, 0, 1))
        assert img_j.shape == (4, 118, 25 * 3 + 4)
        np.testing.assert_allclose(np.asarray(img_j), img_n,
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(float(rot0_j), rot0_n, atol=1e-5)

    def test_roundtrip_recovers_world_shape(self):
        """Oracle decompose -> oracle reconstruct returns the body up to
        the (unobservable) initial planar offset: xy-velocities integrate
        from 0 while the input starts wherever it starts."""
        body = _smooth_trajectory(seed=13)
        lbl = _contact_lbls()
        img_n, rot0 = get_local_markers_4chan_np(body, lbl)
        T1 = img_n.shape[1]
        local = img_n[0][:, : 68 * 3].reshape(T1, 68, 3)
        traj = np.stack([img_n[1][:, 0], img_n[2][:, 0], img_n[3][:, 0]],
                        axis=1)[:, None, :]
        zero = np.zeros((T1, 1, 3))
        rec = reconstruct_global_body_np(
            np.concatenate([zero, local, traj], axis=1), rot0)

        # compare pairwise frame-0-relative shapes (z is absolute after
        # put-on-floor, xy up to the initial offset)
        target = body[:T1] - body[:T1, :1, :] * np.array([1, 1, 0])
        got = rec - rec[:, :1, :] * np.array([1, 1, 0])
        # floor shift: z was put on floor during decomposition
        target = target - np.array([0, 0, body[..., 2].min()])
        np.testing.assert_allclose(got, target, atol=5e-3)
