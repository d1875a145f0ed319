"""Scene-interaction kernels: Chamfer vs brute force, SDF sampling vs
torch.grid_sample, z-buffer visibility, self-intersection semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from lemo_tpu.ops import chamfer as ch
from lemo_tpu.ops import sdf as sdf_ops
from lemo_tpu.ops import robust
from lemo_tpu.ops import visibility as vis
from lemo_tpu.ops import intersection as isect

RNG = np.random.RandomState(21)


class TestChamfer:
    def test_matches_bruteforce(self):
        a = RNG.randn(500, 3).astype(np.float32)
        b = RNG.randn(700, 3).astype(np.float32)
        da, db, ia, ib = ch.chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                             chunk=256)
        D = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(da), D.min(1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ia), D.argmin(1))
        np.testing.assert_allclose(np.asarray(db), D.min(0), rtol=1e-4, atol=1e-5)

    def test_mask_excludes_padding(self):
        a = RNG.randn(50, 3).astype(np.float32)
        b = np.concatenate([RNG.randn(60, 3), np.zeros((40, 3))]).astype(np.float32)
        mask = np.arange(100) < 60
        da, _, ia, _ = ch.chamfer_distance(
            jnp.asarray(a), jnp.asarray(b), None, jnp.asarray(mask), chunk=32)
        assert np.asarray(ia).max() < 60
        D = ((a[:, None] - b[None, :60]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(da), D.min(1), rtol=1e-4, atol=1e-5)

    def test_gradients_flow_to_both(self):
        a = jnp.asarray(RNG.randn(20, 3), jnp.float32)
        b = jnp.asarray(RNG.randn(30, 3), jnp.float32)

        def loss(a, b):
            da, db, _, _ = ch.chamfer_distance(a, b, chunk=16)
            return da.mean() + db.mean()

        ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
        assert float(jnp.abs(ga).sum()) > 0
        assert float(jnp.abs(gb).sum()) > 0


class TestSdf:
    def test_matches_torch_grid_sample(self):
        grid = RNG.randn(16, 16, 16).astype(np.float32)
        pts = RNG.uniform(-1.2, 1.2, (200, 3)).astype(np.float32)  # incl. border
        ours = np.asarray(sdf_ops.sample_grid_trilinear(
            jnp.asarray(grid), jnp.asarray(pts)))
        # torch: input [1,1,D,H,W]; grid last dim (x,y,z) indexes (W,H,D).
        # To sample grid[i,j,k] at pts[:, (0,1,2)], feed grid coords
        # reversed (z,y,x) like the reference does (fitting_temp_slide:688).
        tgrid = torch.from_numpy(grid)[None, None]
        tpts = torch.from_numpy(pts[:, [2, 1, 0]])[None, :, None, None, :]
        ref = F.grid_sample(tgrid, tpts, padding_mode="border",
                            align_corners=False)[0, 0, :, 0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_world_sampling_floor_plane(self):
        from lemo_tpu.testing.synthetic import synthetic_sdf_grid
        s = synthetic_sdf_grid(dim=32)
        pts = np.array([[0, 0, 0.5], [0, 0, -0.5], [1, 1, 0.05]], np.float32)
        vals = np.asarray(sdf_ops.sample_sdf_world(
            jnp.asarray(s["sdf"]), jnp.asarray(pts),
            jnp.asarray(s["min"], jnp.float32), jnp.asarray(s["max"], jnp.float32)))
        assert vals[0] > 0 and vals[1] < 0 and abs(vals[2]) < 0.15

    def test_penetration_loss(self):
        vals = jnp.asarray([-0.1, 0.2, -0.3, 0.0])
        assert np.isclose(float(sdf_ops.sdf_penetration_loss(vals)), 0.4)


class TestRobust:
    def test_gmof_matches_reference_formula(self):
        r = jnp.asarray(RNG.randn(100), jnp.float32)
        rho = 0.5
        expected = rho**2 * (np.asarray(r)**2 / (np.asarray(r)**2 + rho**2))
        np.testing.assert_allclose(np.asarray(robust.gmof(r, rho)), expected,
                                   rtol=1e-5)

    def test_masked_mean_empty(self):
        v = jnp.ones(5)
        assert float(robust.masked_mean(v, jnp.zeros(5))) == 0.0
        assert float(robust.masked_mean(v, jnp.ones(5))) == 1.0

    def test_hinge_above(self):
        v = jnp.asarray([0.05, 0.2, 0.3])
        assert np.isclose(float(robust.hinge_above(v, 0.1)), 0.25)


class TestVisibility:
    def test_near_point_occludes_far(self):
        # two vertices on the same ray: near visible, far hidden
        verts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 3.0],
                             [0.5, 0.2, 2.0]], jnp.float32)
        v = np.asarray(vis.visibility_zbuffer(
            verts, fx=1000.0, fy=1000.0, cx=960.0, cy=540.0))
        assert v[0] and not v[1] and v[2]

    def test_behind_camera_invisible(self):
        verts = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        v = np.asarray(vis.visibility_zbuffer(
            verts, fx=1000.0, fy=1000.0, cx=960.0, cy=540.0))
        assert not v[0]

    def test_vertex_normals_unit(self):
        verts = jnp.asarray(RNG.randn(10, 3), jnp.float32)
        faces = jnp.asarray(RNG.randint(0, 10, (12, 3)), jnp.int32)
        n = np.asarray(vis.vertex_normals(verts, faces))
        lens = np.linalg.norm(n, axis=1)
        assert ((lens < 1e-6) | (np.abs(lens - 1) < 1e-4)).all()


class TestSelfIntersection:
    def _two_tris(self, gap):
        # tri A in the z = 0 plane; tri B with its first vertex at z = gap
        # and the others at z = |gap|: gap < 0 makes B pierce A's plane
        # inside A's cone (a genuinely CROSSING pair — the energy's
        # two-way plane-straddle gate, like the reference's BVH tri-tri
        # test, ignores parallel face-to-face pairs that never intersect),
        # gap > 0 lifts B entirely above (separated, zero energy)
        v = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0],          # tri A, normal +z
            [0.1, 0.1, gap], [1.1, 0.1, abs(gap)], [0.1, 1.1, abs(gap)],
        ], np.float32)
        f = np.array([[0, 1, 2], [3, 5, 4]], np.int32)
        return jnp.asarray(v), jnp.asarray(f)

    def test_separated_faces_no_energy(self):
        v, f = self._two_tris(gap=2.0)
        e = float(isect.self_intersection_loss(v, f, max_candidates=1))
        assert e == 0.0

    def test_penetrating_faces_positive(self):
        v, f = self._two_tris(gap=-0.05)
        e = float(isect.self_intersection_loss(v, f, max_candidates=1))
        assert e > 0.0

    def test_differentiable(self):
        v, f = self._two_tris(gap=-0.05)
        g = jax.grad(lambda vv: isect.self_intersection_loss(
            vv, f, max_candidates=1))(v)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_ignored_part_pair_zero_energy(self):
        """FilterFaces semantics: a penetrating pair whose parts are in
        ign_part_pairs contributes NOTHING
        (fit_temp_loadprox_slide.py:335-344)."""
        v, f = self._two_tris(gap=-0.05)
        filt = isect.build_face_filter(np.asarray(f),
                                       faces_segm=np.array([0, 1]),
                                       ign_part_pairs=["0,1"])
        e = float(isect.self_intersection_loss(
            v, f, segm=jnp.asarray(filt["segm"]),
            ign_table=jnp.asarray(filt["ign_table"])))
        assert e == 0.0
        # same geometry without the filter has positive energy
        assert float(isect.self_intersection_loss(v, f)) > 0.0

    def test_parent_part_pair_ignored(self):
        """Collisions between a part and its parent part are filtered
        (torch-mesh-isect FilterFaces faces_parents behavior)."""
        v, f = self._two_tris(gap=-0.05)
        # part 1's parent is part 0 -> pair (0, 1) ignored
        filt = isect.build_face_filter(
            np.asarray(f), faces_segm=np.array([0, 1]),
            ign_part_pairs=[], faces_parents=np.array([0, 0]))
        e = float(isect.self_intersection_loss(
            v, f, segm=jnp.asarray(filt["segm"]),
            ign_table=jnp.asarray(filt["ign_table"])))
        assert e == 0.0

    def test_unrelated_part_pair_kept(self):
        """A filter that ignores OTHER pairs leaves the energy unchanged."""
        v, f = self._two_tris(gap=-0.05)
        filt = isect.build_face_filter(np.asarray(f),
                                       faces_segm=np.array([0, 1]),
                                       ign_part_pairs=["2,3"])
        # pad the table so part ids 2,3 exist
        tab = np.zeros((4, 4), bool)
        tab[2, 3] = tab[3, 2] = True
        e_filt = float(isect.self_intersection_loss(
            v, f, segm=jnp.asarray(filt["segm"]),
            ign_table=jnp.asarray(tab)))
        e_plain = float(isect.self_intersection_loss(v, f))
        np.testing.assert_allclose(e_filt, e_plain, rtol=1e-6)


class TestSdfCrop:
    def test_cropped_matches_full(self):
        grid = RNG.randn(200, 200, 200).astype(np.float32)
        lo = jnp.asarray([-3.0, -3.0, -1.0])
        hi = jnp.asarray([3.0, 3.0, 3.0])
        # a body-sized cluster of points well inside the scene
        pts = jnp.asarray((RNG.randn(500, 3) * 0.3
                           + np.array([0.5, -0.4, 1.0])).astype(np.float32))
        full = sdf_ops.sample_sdf_world(jnp.asarray(grid), pts, lo, hi,
                                        crop=None)
        cropped = sdf_ops.sample_sdf_world(jnp.asarray(grid), pts, lo, hi,
                                           crop=128)
        # fp32 rounding differs slightly (sub-window renormalization)
        np.testing.assert_allclose(np.asarray(cropped), np.asarray(full),
                                   rtol=1e-2, atol=1e-4)

    def test_crop_gradients_match(self):
        grid = jnp.asarray(RNG.randn(160, 160, 160).astype(np.float32))
        lo = jnp.asarray([-3.0, -3.0, -1.0])
        hi = jnp.asarray([3.0, 3.0, 3.0])
        pts = jnp.asarray((RNG.randn(200, 3) * 0.3).astype(np.float32))
        g_full = jax.grad(lambda p: sdf_ops.sample_sdf_world(
            grid, p, lo, hi, crop=None).sum())(pts)
        g_crop = jax.grad(lambda p: sdf_ops.sample_sdf_world(
            grid, p, lo, hi, crop=96).sum())(pts)
        np.testing.assert_allclose(np.asarray(g_crop), np.asarray(g_full),
                                   rtol=1e-2, atol=1e-3)


class TestSdfPacked:
    def test_packed_matches_exact(self):
        grid = RNG.randn(64, 64, 64).astype(np.float32)
        packed = sdf_ops.pack_grid_bf16(grid)
        assert packed.shape == grid.shape and packed.dtype == np.uint32
        coords = jnp.asarray(RNG.uniform(-0.95, 0.95,
                                         (300, 3)).astype(np.float32))
        exact = sdf_ops.sample_grid_trilinear(jnp.asarray(grid), coords)
        approx = sdf_ops.sample_grid_trilinear_packed(jnp.asarray(packed),
                                                      coords)
        # bf16 grid values: <= 2^-8 relative error per corner
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   rtol=0.0, atol=np.abs(grid).max() * 0.01)

    def test_packed_world_crop_path(self):
        grid = RNG.randn(160, 160, 160).astype(np.float32)
        lo = jnp.asarray([-3.0, -3.0, -1.0])
        hi = jnp.asarray([3.0, 3.0, 3.0])
        pts = jnp.asarray((RNG.randn(400, 3) * 0.3
                           + np.array([0.3, 0.2, 1.0])).astype(np.float32))
        exact = sdf_ops.sample_sdf_world(jnp.asarray(grid), pts, lo, hi)
        packed = sdf_ops.sample_sdf_world(
            jnp.asarray(sdf_ops.pack_grid_bf16(grid)), pts, lo, hi,
            packed=True)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(exact),
                                   atol=np.abs(grid).max() * 0.01)

    def test_packed_gradients_flow(self):
        grid = RNG.randn(48, 48, 48).astype(np.float32)
        packed = jnp.asarray(sdf_ops.pack_grid_bf16(grid))
        lo, hi = jnp.asarray([-1.0] * 3), jnp.asarray([1.0] * 3)
        pts = jnp.asarray((RNG.randn(100, 3) * 0.2).astype(np.float32))
        g_exact = jax.grad(lambda p: sdf_ops.sample_sdf_world(
            jnp.asarray(grid), p, lo, hi, crop=None).sum())(pts)
        g_packed = jax.grad(lambda p: sdf_ops.sample_sdf_world(
            packed, p, lo, hi, crop=None, packed=True).sum())(pts)
        assert np.isfinite(np.asarray(g_packed)).all()
        # directions agree (values quantized => small deviation)
        np.testing.assert_allclose(np.asarray(g_packed),
                                   np.asarray(g_exact), rtol=0.15,
                                   atol=0.3)

    def test_zero_crossing_precision(self):
        # bf16 absolute error shrinks near 0 — exactly where the
        # penetration hinge lives
        grid = (RNG.randn(32, 32, 32) * 0.01).astype(np.float32)
        packed = sdf_ops.pack_grid_bf16(grid)
        coords = jnp.asarray(RNG.uniform(-0.9, 0.9,
                                         (200, 3)).astype(np.float32))
        exact = sdf_ops.sample_grid_trilinear(jnp.asarray(grid), coords)
        approx = sdf_ops.sample_grid_trilinear_packed(jnp.asarray(packed),
                                                      coords)
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   atol=1e-4)


class TestBatchedIntersectionChunking:
    def test_chunked_matches_vmap(self):
        verts = RNG.randn(16, 24, 3).astype(np.float32) * 0.1
        faces = np.stack([np.arange(0, 8), np.arange(8, 16),
                          np.arange(16, 24)], axis=1).astype(np.int32)
        full = jax.vmap(lambda v: isect.self_intersection_loss(
            v, jnp.asarray(faces)))(jnp.asarray(verts))
        chunked = isect.batched_self_intersection(
            jnp.asarray(verts), jnp.asarray(faces), frame_chunk=4)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   rtol=1e-5, atol=1e-6)

    def test_non_divisible_batch(self):
        verts = RNG.randn(7, 24, 3).astype(np.float32) * 0.1
        faces = np.stack([np.arange(0, 8), np.arange(8, 16),
                          np.arange(16, 24)], axis=1).astype(np.int32)
        out = isect.batched_self_intersection(
            jnp.asarray(verts), jnp.asarray(faces), frame_chunk=4)
        assert out.shape == (7,)
        full = jax.vmap(lambda v: isect.self_intersection_loss(
            v, jnp.asarray(faces)))(jnp.asarray(verts))
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-5, atol=1e-6)

    def test_chunked_differentiable(self):
        verts = jnp.asarray(RNG.randn(6, 24, 3).astype(np.float32) * 0.1)
        faces = jnp.asarray(np.stack([np.arange(0, 8), np.arange(8, 16),
                                      np.arange(16, 24)],
                                     axis=1).astype(np.int32))
        g = jax.grad(lambda v: isect.batched_self_intersection(
            v, faces, frame_chunk=2).sum())(verts)
        assert np.isfinite(np.asarray(g)).all()


class TestSdfFp8:
    def test_fp8_quad_matches_exact_coarsely(self):
        grid = RNG.randn(64, 64, 64).astype(np.float32)
        packed = sdf_ops.pack_grid_fp8_quad(grid)
        assert packed.shape == grid.shape and packed.dtype == np.uint32
        coords = jnp.asarray(RNG.uniform(-0.95, 0.95,
                                         (300, 3)).astype(np.float32))
        exact = sdf_ops.sample_grid_trilinear(jnp.asarray(grid), coords)
        approx = sdf_ops.sample_grid_trilinear_fp8(jnp.asarray(packed),
                                                   coords)
        # fp8 e4m3: ~6% relative per corner value
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   atol=np.abs(grid).max() * 0.1)
        err = np.abs(np.asarray(approx) - np.asarray(exact)).mean()
        assert err < np.abs(grid).max() * 0.03

    def test_fp8_world_path_and_gradients(self):
        grid = RNG.randn(160, 160, 160).astype(np.float32)
        packed = jnp.asarray(sdf_ops.pack_grid_fp8_quad(grid))
        lo = jnp.asarray([-3.0, -3.0, -1.0])
        hi = jnp.asarray([3.0, 3.0, 3.0])
        pts = jnp.asarray((RNG.randn(300, 3) * 0.3
                           + np.array([0.3, 0.2, 1.0])).astype(np.float32))
        vals = sdf_ops.sample_sdf_world(packed, pts, lo, hi, packed="fp8")
        exact = sdf_ops.sample_sdf_world(jnp.asarray(grid), pts, lo, hi)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(exact),
                                   atol=np.abs(grid).max() * 0.1)
        g = jax.grad(lambda p: sdf_ops.sample_sdf_world(
            packed, p, lo, hi, packed="fp8").sum())(pts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

