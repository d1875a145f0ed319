"""Software rasterizer (body-over-image overlay rendering) tests —
the pyrender replacement behind cli/render_fitting.py
(reference temp_prox/renderer.py:60-140)."""

import os

import numpy as np

from lemo_tpu.utils.raster import rasterize_mesh, render_body_overlay
from tests.test_visibility_oracle import uv_sphere

FX = FY = 1060.0
CX, CY = 320.0, 240.0
W, H = 640, 480


class TestRasterizer:
    def test_sphere_renders_disc(self):
        verts, faces = uv_sphere([0.0, 0.0, 3.0], 0.5, n_theta=24,
                                 n_phi=24)
        zbuf, shade, mask = rasterize_mesh(verts, faces, W, H,
                                           FX, FY, CX, CY)
        assert mask.any()
        # projected disc: radius ~ r/z * f = 177 px around the center
        ys, xs = np.nonzero(mask)
        rr = np.sqrt((xs - CX) ** 2 + (ys - CY) ** 2)
        assert rr.max() < 0.5 / np.sqrt(3.0 ** 2 - 0.5 ** 2) * FX + 3
        # depth inside the silhouette is the FRONT surface
        zc = zbuf[int(CY), int(CX)]
        assert 2.45 < zc < 2.6, zc
        # shading in [0.3, 1.0]
        s = shade[mask]
        assert (s >= 0.3 - 1e-6).all() and (s <= 1.0 + 1e-6).all()
        # center faces the camera head-on -> bright
        assert shade[int(CY), int(CX)] > 0.9

    def test_zbuffer_orders_two_spheres(self):
        v1, f1 = uv_sphere([0.0, 0.0, 2.0], 0.3, n_theta=16, n_phi=16)
        v2, f2 = uv_sphere([0.0, 0.0, 5.0], 0.3, n_theta=16, n_phi=16)
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + len(v1)])
        zbuf, _, mask = rasterize_mesh(verts, faces, W, H, FX, FY, CX, CY)
        # center pixel shows the NEAR sphere's front surface
        assert 1.65 < zbuf[int(CY), int(CX)] < 1.8

    def test_overlay_blends_only_body_pixels(self):
        verts, faces = uv_sphere([0.0, 0.0, 3.0], 0.3, n_theta=16,
                                 n_phi=16)
        img = np.full((H, W, 3), 17, np.uint8)
        out = render_body_overlay(verts, faces, img, FX, FY, CX, CY)
        assert out.shape == (H, W, 3) and out.dtype == np.uint8
        _, _, mask = rasterize_mesh(verts, faces, W, H, FX, FY, CX, CY)
        # background untouched, body pixels pink-ish (R > G = B)
        np.testing.assert_array_equal(out[~mask], 17)
        body = out[mask]
        assert (body[:, 0] >= body[:, 1]).all()
        assert (body[:, 0] > 40).all()

    def test_offscreen_mesh_is_noop(self):
        verts, faces = uv_sphere([50.0, 0.0, 3.0], 0.3, n_theta=8,
                                 n_phi=8)
        img = np.zeros((H, W, 3), np.uint8)
        out = render_body_overlay(verts, faces, img, FX, FY, CX, CY)
        np.testing.assert_array_equal(out, 0)


class TestRenderFittingCli:
    def test_overlay_renders_from_results(self, tmp_path):
        """cli/render_fitting.py end-to-end on a synthetic recording:
        per-frame result pkls + Color frames -> `<frame>_output.png`
        overlays (the reference renderer.py:110-133 output files)."""
        import jax

        from lemo_tpu.body_model import load_model
        from lemo_tpu.config import ProxConfig
        from lemo_tpu.cli.render_fitting import main as render_main
        from lemo_tpu.fitting.prox.driver import (ProxAssets,
                                                  run_prox_fitting)
        from lemo_tpu.testing.synthetic import write_smplx_model_dir
        from lemo_tpu.testing.synthetic_prox import \
            write_synthetic_prox_recording

        base = str(tmp_path / "prox")
        info = write_synthetic_prox_recording(base, num_frames=10, seed=7,
                                              write_depth=False)
        model = load_model(info["model_dict"], use_pca=True,
                           num_pca_comps=12)
        out_dir = str(tmp_path / "out")
        cfg = ProxConfig(
            recording_dir=info["recording_dir"], output_folder=out_dir,
            batch_size=8, maxiters=2, lr=0.005, flip=False,
            s2m=False, m2s=False, read_depth=False, read_mask=False,
            sdf_penetration=False, use_friction=False,
            use_motion_smooth_prior=False, interpenetration=False,
            contact=False, use_motion_infill_prior=False,
        )
        run_prox_fitting(cfg, ProxAssets(
            model=model, vposer_params=info["vposer_params"]),
            max_windows=1, verbose=False)

        # the CLI loads the fitted pkls with a model from disk; give it
        # the same synthetic model
        model_dir = write_smplx_model_dir(str(tmp_path / "models"))
        import numpy as _np

        _np.savez(os.path.join(model_dir, "SMPLX_MALE.npz"),
                  **info["model_dict"])
        fitting_dir = os.path.join(out_dir, info["recording_name"])
        render_main([
            "--fitting_dir", fitting_dir,
            "--model_folder", model_dir,
            "--recording_dir", info["recording_dir"],
            "--flip", "false", "--start", "0", "--step", "2",
            "--count", "3",
        ])
        rend = os.path.join(fitting_dir, "renderings")
        outputs = [f for f in os.listdir(rend) if f.endswith("_output.png")]
        assert len(outputs) == 3, os.listdir(rend)
        import cv2

        img = cv2.imread(os.path.join(rend, outputs[0]))
        assert img is not None and img.shape[2] == 3

        # body-in-scene renders (reference rendering_mode='3d'): small
        # virtual camera keeps the software raster fast
        render_main([
            "--fitting_dir", fitting_dir,
            "--model_folder", model_dir,
            "--recording_dir", info["recording_dir"],
            "--flip", "false", "--start", "0", "--step", "2",
            "--count", "2", "--rendering_mode", "3d",
            "--fx", "200", "--fy", "200", "--cx", "160", "--cy", "120",
        ])
        scenes = [f for f in os.listdir(rend) if f.endswith("_scene.png")]
        assert len(scenes) == 2, os.listdir(rend)
        img3 = cv2.imread(os.path.join(rend, scenes[0]))
        assert img3.shape == (240, 320, 3)
        # both gray scene pixels and colored body pixels are present
        gray = (img3[:, :, 0] == img3[:, :, 2]) & (img3[:, :, 0] < 250)
        colored = img3[:, :, 2].astype(int) > img3[:, :, 0].astype(int) + 10
        assert gray.any() and colored.any()


class TestBodyInScene:
    def test_two_mesh_depth_compositing(self):
        """render_body_in_scene: the nearer mesh wins each pixel (the
        reference renderer.py rendering_mode='3d' semantics)."""
        from lemo_tpu.utils.raster import render_body_in_scene

        H, W, F = 120, 160, 200.0
        body_v, body_f = uv_sphere([0.0, 0.0, 2.0], 0.4, n_theta=10,
                                   n_phi=10)
        # scene: a big quad BEHIND the body
        scene_v = np.array([[-2, -2, 4.0], [2, -2, 4.0],
                            [2, 2, 4.0], [-2, 2, 4.0]], np.float64)
        scene_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        img = render_body_in_scene(body_v, body_f, scene_v, scene_f,
                                   W, H, F, F, W / 2, H / 2)
        c = img[H // 2, W // 2].astype(float) / 255.0
        # center pixel: pink body, not gray scene
        assert c[0] > c[2] * 1.1, c
        # corner pixel: gray scene (r == g == b, not background white 255)
        corner = img[2, 2]
        assert corner[0] == corner[1] == corner[2]
        assert 0 < corner[0] < 250
        # scene in FRONT of the body hides it
        scene_near = scene_v.copy()
        scene_near[:, 2] = 1.0
        img2 = render_body_in_scene(body_v, body_f, scene_near, scene_f,
                                    W, H, F, F, W / 2, H / 2)
        c2 = img2[H // 2, W // 2]
        assert c2[0] == c2[1] == c2[2]  # gray scene, body occluded


class TestPlyMesh:
    def test_ascii_roundtrip_with_faces(self, tmp_path):
        from lemo_tpu.data.prox import read_ply_mesh, write_ply_vertices

        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        p = str(tmp_path / "m.ply")
        write_ply_vertices(p, v, faces=f)
        rv, rf = read_ply_mesh(p)
        np.testing.assert_allclose(rv, v)
        np.testing.assert_array_equal(rf, f)

    def test_ascii_quad_fan_triangulated(self, tmp_path):
        from lemo_tpu.data.prox import read_ply_mesh

        p = str(tmp_path / "quad.ply")
        with open(p, "w") as fh:
            fh.write("ply\nformat ascii 1.0\n"
                     "element vertex 4\n"
                     "property float x\nproperty float y\nproperty float z\n"
                     "element face 1\n"
                     "property list uchar int vertex_indices\n"
                     "end_header\n"
                     "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
                     "4 0 1 2 3\n")
        rv, rf = read_ply_mesh(p)
        assert rv.shape == (4, 3)
        np.testing.assert_array_equal(rf, [[0, 1, 2], [0, 2, 3]])

    def test_binary_faces(self, tmp_path):
        from lemo_tpu.data.prox import read_ply_mesh, read_ply_vertices

        import struct
        p = str(tmp_path / "b.ply")
        header = ("ply\nformat binary_little_endian 1.0\n"
                  "element vertex 3\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  "element face 1\n"
                  "property list uchar int vertex_indices\n"
                  "end_header\n")
        with open(p, "wb") as fh:
            fh.write(header.encode())
            for xyz in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
                fh.write(struct.pack("<3f", *xyz))
            fh.write(struct.pack("<B3i", 3, 0, 1, 2))
        rv, rf = read_ply_mesh(p)
        assert rv.shape == (3, 3)
        np.testing.assert_array_equal(rf, [[0, 1, 2]])
        # vertices-only reader still works on the same file
        np.testing.assert_allclose(read_ply_vertices(p), rv)

    def test_synthetic_scene_has_faces(self, tmp_path):
        from lemo_tpu.data.prox import ProxRecording
        from lemo_tpu.testing.synthetic_prox import \
            write_synthetic_prox_recording

        info = write_synthetic_prox_recording(str(tmp_path / "p"),
                                              num_frames=3, seed=0,
                                              write_depth=False)
        rec = ProxRecording.from_recording_dir(info["recording_dir"])
        sv, sf = rec.load_scene_mesh_full()
        assert sv.shape == (576, 3)
        assert sf.shape == (23 * 23 * 2, 3)
        assert sf.min() >= 0 and sf.max() < len(sv)
        # vertices-only path (contact term) unchanged
        np.testing.assert_allclose(rec.load_scene_mesh(), sv)
