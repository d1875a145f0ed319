"""Utility-tier tests: occlusion masks, viz rendering, tools."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from lemo_tpu.utils import tools
from lemo_tpu.utils.occlusion_mask import marker_occlusion_mask
from lemo_tpu.utils.viz import save_marker_animation


class TestOcclusionMask:
    def test_scene_occludes_markers_behind_it(self):
        # a wall of scene points at z=2; markers at z=1 (front) and z=3.
        # point density must cover the z-buffer buckets (real scene clouds
        # have >=100k points; the splat has no footprint)
        xs, ys = np.meshgrid(np.linspace(-1, 1, 300), np.linspace(-1, 1, 300))
        wall = np.stack([xs.ravel(), ys.ravel(),
                         np.full(xs.size, 2.0)], axis=1).astype(np.float32)
        markers = np.zeros((2, 67, 3), np.float32)
        markers[0, :, 2] = 1.0   # frame 0: in front of the wall
        markers[1, :, 2] = 3.0   # frame 1: behind the wall
        markers[:, :, 0] = np.linspace(-0.3, 0.3, 67)
        mask = np.asarray(marker_occlusion_mask(
            jnp.asarray(markers), jnp.asarray(wall),
            fx=1000.0, fy=1000.0, cx=960.0, cy=540.0))
        assert mask.shape == (2, 67)
        assert mask[0].mean() > 0.9       # front frame visible
        assert mask[1].mean() < 0.1       # behind the wall -> occluded

    def test_no_scene_all_visible(self):
        markers = np.zeros((1, 67, 3), np.float32)
        markers[..., 2] = 1.5
        far = np.full((10, 3), 100.0, np.float32)
        mask = np.asarray(marker_occlusion_mask(
            jnp.asarray(markers), jnp.asarray(far),
            fx=1000.0, fy=1000.0, cx=960.0, cy=540.0))
        assert (mask == 1).all()


class TestViz:
    def test_marker_animation_png(self):
        seq = np.random.RandomState(0).randn(8, 67, 3).astype(np.float32)
        contact = np.ones((8, 4), np.float32)
        out = os.path.join(tempfile.mkdtemp(), "anim.png")
        path = save_marker_animation(seq, out, contact, stride=2)
        assert os.path.exists(path) and os.path.getsize(path) > 1000


class TestTools:
    def test_helpers(self):
        assert tools.rel_change(10.0, 5.0) == 0.5
        assert tools.max_grad_change(np.array([-3.0, 2.0])) == 3.0
        assert len(tools.id_generator(8)) == 8
        d = tempfile.mkdtemp()
        p = tools.makepath(os.path.join(d, "a", "b.txt"), isfile=True)
        assert os.path.isdir(os.path.join(d, "a"))
        log = tools.log2file(os.path.join(d, "run.log"))
        log("hello")
        assert "hello" in open(os.path.join(d, "run.log")).read()
