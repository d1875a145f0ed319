"""Fused Pallas self-intersection kernel vs the XLA dense sweep.

Two tiers of checks, because the cone energy is DISCONTINUOUS at its
activation gates (a pair enters with phi = depth > 0 the instant
lat2 < rad2 / spheres overlap): implementations that round the face
geometry differently can legitimately disagree by whole phi^2 jumps on
borderline pairs (measured ~5e-5 relative on a posed body).

  1. Kernel exactness: feed `_cone_energy_call` and a float64 numpy
     oracle the SAME f32 face inputs — gate decisions then match
     bit-for-bit and energy/gradients must agree tightly.
  2. Cross-implementation: pallas vs the XLA dense sweep through the
     public API, at a tolerance that admits borderline-gate flips.

Interpreter mode on the CPU mesh; the TPU path is the same code
(A/B'd by scripts/ab_intersection_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.ops import intersection as xi
from lemo_tpu.ops import intersection_pallas as ip
from lemo_tpu.ops.intersection import face_geometry
from lemo_tpu.ops.intersection_pallas import (
    batched_self_intersection_pallas, self_intersection_loss_pallas)
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(3)
# admits a few borderline-gate flips (phi^2 ~ 1e-2 each on E ~ 1.5e4)
GATE_RTOL = 3e-4


def _posed_body(seed=3, pose_scale=0.7):
    md = synthetic_smplx_npz()
    model = load_model(md, use_pca=True, num_pca_comps=12)
    fwd = jax.jit(make_forward_fn(model))
    p = dict(model.zero_params(1))
    p["body_pose"] = jnp.asarray(
        np.random.RandomState(seed).randn(1, 63) * pose_scale, jnp.float32)
    verts = fwd(p, model.consts)["vertices"][0]
    return verts, jnp.asarray(md["f"].astype(np.int32))


def _oracle(s, n, tri, c, r, rad2, faces, bits=None, seg=None):
    """float64 masked cone energy + gradients on given (f32) face data.

    Same masks as the kernel; because the inputs are identical, every
    gate decision matches the kernel's and the comparison is tight."""
    s = np.asarray(s, np.float64)
    n = np.asarray(n, np.float64)
    tri = np.asarray(tri, np.float64)
    c = np.asarray(c, np.float64)
    r = np.asarray(r, np.float64)
    rad2 = np.asarray(rad2, np.float64)
    f = np.asarray(faces)
    F = f.shape[0]
    d2 = ((c[:, None] - c[None]) ** 2).sum(-1)
    m = d2 < (r[:, None] + r[None]) ** 2
    adj = np.zeros_like(m)
    for p in range(3):
        for q in range(3):
            adj |= f[:, p, None] == f[None, :, q]
    m &= ~adj
    if bits is not None:
        ign = ((np.asarray(bits)[:, None] >> np.asarray(seg)[None, :])
               & 1) == 1
        m &= ~ign
    # two-way plane-straddle gate (tri-tri necessary condition)
    dall = np.stack([s[:, None] - n @ tri[:, a].T for a in range(3)])
    rall = np.stack([s[None, :] - tri[:, a] @ n.T for a in range(3)])
    m &= ((dall.min(0) < 0) & (dall.max(0) > 0)
          & (rall.min(0) < 0) & (rall.max(0) > 0))
    E = 0.0
    ds = np.zeros(F)
    dn = np.zeros((F, 3))
    dtri = np.zeros((F, 3, 3))
    for a in range(3):
        v = tri[:, a]                                    # [F, 3]
        depth = s[:, None] - n @ v.T                     # [F, F]
        lat2 = ((v[None] - c[:, None]) ** 2).sum(-1) - depth ** 2
        act = m & (depth > 0) & (lat2 < rad2[:, None])
        phi = np.where(act, depth, 0.0)
        E += (phi ** 2).sum()
        g = 2.0 * phi
        ds += g.sum(1)
        dn -= g @ v
        dtri[:, a] -= (g.T[..., None] * n[None]).sum(1)
    return E, ds, dn, dtri


class TestKernelExactness:
    """Tier 1: the kernel vs a same-inputs float64 oracle (tight)."""

    def _inputs(self):
        verts, faces = _posed_body()
        verts = verts - verts.mean(axis=0)
        c, n, r = face_geometry(verts, faces)
        s = (c * n).sum(-1)
        rad2 = (0.5 * r) ** 2
        tri = verts[faces]
        F = faces.shape[0]
        return (s, n, tri, c, r, rad2, faces.astype(jnp.int32),
                jnp.zeros((F,), jnp.int32), jnp.zeros((F,), jnp.int32),
                jnp.ones((F,), jnp.float32)), faces

    def test_energy_and_grads_exact(self):
        args, faces = self._inputs()
        e, ds, dn, dtri = ip._cone_energy_call(*args)
        E, ds_o, dn_o, dtri_o = _oracle(*args[:6], faces)
        assert abs(float(e) - E) / E < 1e-6
        for got, want in ((ds, ds_o), (dn, dn_o), (dtri, dtri_o)):
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(np.asarray(got) - want).max() / scale < 1e-6

    def test_part_filter_exact(self):
        (s, n, tri, c, r, rad2, fid, _, _, valid), faces = self._inputs()
        F = faces.shape[0]
        seg = jnp.asarray(RNG.randint(0, 27, size=F), jnp.int32)
        tab = np.zeros((27, 27), bool)
        for a, b in [(3, 7), (7, 3), (1, 1), (20, 25), (25, 20)]:
            tab[a, b] = True
        weights = (tab.astype(np.int64) * (1 << np.arange(27))).sum(1)
        bits = jnp.asarray(weights[np.asarray(seg)], jnp.int32)
        e, ds, _, _ = ip._cone_energy_call(s, n, tri, c, r, rad2, fid,
                                           bits, seg, valid)
        E, ds_o, _, _ = _oracle(s, n, tri, c, r, rad2, faces,
                                bits=bits, seg=seg)
        assert abs(float(e) - E) / E < 1e-6
        e_all, _, _, _ = ip._cone_energy_call(
            s, n, tri, c, r, rad2, fid, jnp.zeros_like(bits),
            jnp.zeros_like(seg), valid)
        assert float(e) < float(e_all)   # filtering removes energy


class TestIntersectionPallas:
    """Tier 2: public API vs the XLA dense sweep (gate-flip tolerance)."""

    def test_energy_matches_dense(self):
        verts, faces = _posed_body()
        e_x = float(xi.self_intersection_loss(verts, faces))
        e_p = float(self_intersection_loss_pallas(verts, faces))
        assert abs(e_x - e_p) / max(abs(e_x), 1e-9) < GATE_RTOL

    def test_gradient_matches_dense(self):
        verts, faces = _posed_body()
        gx = jax.grad(lambda v: xi.self_intersection_loss(v, faces))(verts)
        gp = jax.grad(
            lambda v: self_intersection_loss_pallas(v, faces))(verts)
        scale = max(float(jnp.abs(gx).max()), 1.0)
        assert float(jnp.abs(gx - gp).max()) / scale < GATE_RTOL

    def test_part_filter_matches_dense(self):
        verts, faces = _posed_body()
        F = faces.shape[0]
        segm = jnp.asarray(RNG.randint(0, 27, size=F), jnp.int32)
        tab = np.zeros((27, 27), bool)
        for a, b in [(3, 7), (7, 3), (1, 1), (20, 25), (25, 20)]:
            tab[a, b] = True
        tab = jnp.asarray(tab)
        e_x = float(xi.self_intersection_loss(
            verts, faces, segm=segm, ign_table=tab))
        e_p = float(self_intersection_loss_pallas(
            verts, faces, segm=segm, ign_table=tab))
        assert abs(e_x - e_p) / max(abs(e_x), 1e-9) < GATE_RTOL
        e_all = float(self_intersection_loss_pallas(verts, faces))
        assert e_p < e_all

    def test_separated_bodies_zero_cross_energy(self):
        # two bodies far apart: every cross tile pair is skipped; the
        # pair energy equals twice the single-body energy (recentering
        # moves the shared centroid, so compare against the pair's own
        # halves via part filtering of cross terms being impossible —
        # instead check the simple invariant on an unposed body)
        verts, faces = _posed_body(pose_scale=0.0)
        far = jnp.concatenate([verts, verts + jnp.asarray([50.0, 0, 0])])
        faces2 = jnp.concatenate([faces, faces + verts.shape[0]])
        e_pair = float(self_intersection_loss_pallas(far, faces2))
        e_self = 2.0 * float(self_intersection_loss_pallas(verts, faces))
        # 1e-3 not GATE_RTOL: the pair's recentering puts both copies at
        # |c| ~ 25 m, and a straddle-gate flip (boundary at depth = 0)
        # toggles a whole pair's phi^2 — a finite jump, unlike cone-entry
        # flips where phi ~ 0. The random-soup test mesh is dense with
        # razor-edge pairs, so a handful of flips is expected.
        assert abs(e_pair - e_self) / max(e_self, 1e-9) < 1e-3

    def test_batched_matches_dense(self):
        # reference runs per-frame (NOT vmapped: batched-matmul rounding
        # in the vmapped dense path flips hundreds of borderline gates
        # on this heavily self-intersecting synthetic mesh — measured
        # 1.6e-3 relative, an artifact of the reference, not the kernel)
        verts, faces = _posed_body()
        vb = jnp.stack([verts, verts * 1.02 + 0.01])
        e_p = np.asarray(batched_self_intersection_pallas(vb, faces))
        e_x = np.asarray([float(xi.self_intersection_loss(v, faces))
                          for v in vb])
        np.testing.assert_allclose(e_p, e_x, rtol=GATE_RTOL)

    def test_dispatcher_fallback_large_table(self):
        # > 32 parts: dispatcher must use the dense path (no crash)
        verts, faces = _posed_body()
        F = faces.shape[0]
        segm = jnp.asarray(RNG.randint(0, 40, size=F), jnp.int32)
        tab = jnp.zeros((40, 40), bool)
        old = xi.INTERSECTION_IMPL
        try:
            xi.INTERSECTION_IMPL = "pallas"
            e = xi.batched_self_intersection(
                verts[None], faces, segm=segm, ign_table=tab)
        finally:
            xi.INTERSECTION_IMPL = old
        e_ref = xi.self_intersection_loss(verts, faces, segm=segm,
                                          ign_table=tab)
        np.testing.assert_allclose(np.asarray(e)[0], float(e_ref),
                                   rtol=1e-6)


class TestTemporalCoherenceCandidates:
    """intersection_candidates (the amortized broad phase) + subset
    evaluation via batched_self_intersection(candidate_ids=...)."""

    def test_margin0_candidates_reproduce_full_energy(self):
        """Candidates from the SAME geometry at margin 0 cover every face
        with an overlapping valid partner, so the K^2 subset sweep must
        reproduce the full F^2 energy (the refresh-every-step contract)."""
        verts, faces = _posed_body(seed=5, pose_scale=0.9)
        full = xi.batched_self_intersection(verts[None], faces)
        ids, counts = xi.intersection_candidates(
            verts, faces, K=int(faces.shape[0]), margin=0.0)
        # every face with an overlapping partner sits inside margin 0
        # (counts = [n_active, n_within]; identical at margin 0)
        assert int(counts[0]) == int(counts[1])
        for K in (int(counts[1]), int(counts[1]) + 37):
            sub = xi.batched_self_intersection(
                verts[None], faces, candidate_ids=ids[:K][None])
            np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                                       rtol=1e-6, err_msg=f"K={K}")

    def test_gradients_match_on_subset(self):
        verts, faces = _posed_body(seed=6, pose_scale=0.9)
        ids, counts = xi.intersection_candidates(
            verts, faces, K=int(faces.shape[0]), margin=0.0)
        K = int(counts[1]) + 8

        g_full = jax.grad(
            lambda v: xi.batched_self_intersection(v[None], faces).sum()
        )(verts)
        g_sub = jax.grad(
            lambda v: xi.batched_self_intersection(
                v[None], faces, candidate_ids=ids[:K][None]).sum()
        )(verts)
        # The two sweeps see the exact same pairs; residual differences
        # are (a) f32 reassociation, which scales with the gradient
        # magnitude, and (b) razor-edge hinge/gate decisions inside the
        # cone energy that legitimately flip between XLA compilation
        # modes (JIT vs the persistent cache's AOT feature set — measured
        # flips at |d2-rsum^2| ~ 6e-5 under AOT) — the gradient analog of
        # GATE_RTOL. A systematic bug (wrong gather, dropped pairs) would
        # corrupt many vertices; gate flips touch the one or two faces of
        # the flipped pair. So: tight match outside a handful of outlier
        # vertices, bounded in count.
        gf, gs = np.asarray(g_full), np.asarray(g_sub)
        tol = 1e-4 * np.abs(gf) + 1e-6 * float(np.abs(gf).max())
        bad_verts = (np.abs(gs - gf) > tol).any(axis=1)
        assert bad_verts.sum() <= 6, (
            f"{bad_verts.sum()} / {len(bad_verts)} vertices mismatch — "
            "more than isolated gate flips")
        np.testing.assert_allclose(gs[~bad_verts], gf[~bad_verts],
                                   rtol=1e-4,
                                   atol=1e-6 * float(np.abs(gf).max()))

    def test_margin_buys_motion_tolerance(self):
        """Candidates from geometry A with margin m stay exact for
        geometry B when no surface point moved more than m/2."""
        verts, faces = _posed_body(seed=7, pose_scale=0.9)
        rng = np.random.RandomState(0)
        delta = jnp.asarray(rng.randn(*verts.shape) * 0.002, jnp.float32)
        delta = jnp.clip(delta, -0.005, 0.005)  # |dv| <= 8.7 mm < m/2
        moved = verts + delta
        ids, counts = xi.intersection_candidates(
            verts, faces, K=int(faces.shape[0]), margin=0.05)
        K = int(counts[1])
        full = xi.batched_self_intersection(moved[None], faces)
        sub = xi.batched_self_intersection(
            moved[None], faces, candidate_ids=ids[:K][None])
        np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                                   rtol=1e-6)

    def test_part_filter_respected(self):
        """Pairs killed by the ignore table must not pull faces into the
        candidate set (their gap is +inf unless another partner exists)."""
        verts, faces = _posed_body(seed=5, pose_scale=0.9)
        F = int(faces.shape[0])
        # every face in part 0, all pairs ignored -> nothing is a candidate
        segm = jnp.zeros((F,), jnp.int32)
        tab = jnp.ones((1, 1), bool)
        _, counts = xi.intersection_candidates(
            verts, faces, K=F, margin=1e9, segm=segm, ign_table=tab)
        assert int(counts[1]) == 0

    def test_batched_per_frame_candidates(self):
        verts, faces = _posed_body(seed=8, pose_scale=0.8)
        vb = jnp.stack([verts, verts + 0.001, verts - 0.001])
        # size K to the active set (a real caller gets the same signal
        # from the n_within > K warning in driver._coll_candidate_ids)
        _, c0 = xi.intersection_candidates(verts, faces,
                                           K=int(faces.shape[0]),
                                           margin=0.0)
        K = min(int(c0[1]) + 64, int(faces.shape[0]))
        ids, counts = xi.intersection_candidates_batched(
            vb, faces, K=K, margin=0.0, frame_chunk=2)
        assert ids.shape == (3, K) and counts.shape == (3, 2)
        full = xi.batched_self_intersection(vb, faces)
        # per-frame subsets must cover each frame's active set
        assert int(np.asarray(counts)[:, 1].max()) <= K
        sub = xi.batched_self_intersection(vb, faces, candidate_ids=ids)
        np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                                   rtol=GATE_RTOL)
