"""Self-intersection penalty — TPU-native fixed-shape formulation.

Replaces the reference's external CUDA stack (torch-mesh-isect: BVH
broad-phase + conical DistanceFieldPenetrationLoss + FilterFaces part-pair
filtering, built at fit_temp_loadprox_slide.py:314-344 and evaluated at
fitting_temp_slide.py:618-635).

TPU redesign — dense masked energy, no trees, no top-k:

The BVH in the reference is a *threshold* query (AABB overlap), not a
nearest-neighbour query, and a threshold query needs no candidate lists at
all on TPU: the penetration energy

    E = sum_{i != j} [spheres(i, j) overlap][i, j not adjacent]
                     [part pair not ignored] * sum_{v in tri_j} phi_i(v)^2

is computed directly as a blockwise masked sum over ALL face pairs. Each
column block is a clean batch of MXU matmuls ([F, 3] x [3, B] cross terms
for the sphere test and the cone evaluation) plus VPU elementwise masking,
with a scalar carried through a `lax.scan` — nothing is gathered per pair
and nothing is sorted. phi is the cone distance field of Tzionas et al. in
its point-sampled form:

    phi_i(p) = max(0, -(p - c_i) . n_i)   where |p - c_i|_lateral < sigma r_i

differentiable w.r.t. the vertices. Compared to the earlier kNN broad
phase this covers every overlapping pair (the BVH semantics) instead of
the k nearest, measures 4.6x faster at PROX production scale (6.9 s vs
32 s per value_and_grad step at B=100, F=20946 on v5e), and its peak
memory is O(F * col_block) instead of O(F * k * 9).

The [spheres overlap] gate alone is NOT the BVH semantics: the reference
only evaluates the cone field on triangle pairs that actually INTERSECT
(bvh.cu's tri-tri test), so a thin closed part (a finger) contributes
nothing at rest — whereas each face's cone stares straight at the
part's opposite wall (depth > 0, lateral ~ 0), which for parts thinner
than two face radii also passes the sphere test. The cheap TPU stand-in
for the tri-tri test is the two-way plane-straddle gate: a pair only
counts when each triangle has vertices on BOTH sides of the other's
plane — a necessary condition for triangle intersection that kills the
opposite-wall artifact (all its vertices lie on one side) and all
near-coplanar neighbour pairs, while keeping every genuinely crossing
pair. Like the sphere and part masks it is a hard (non-differentiated)
gate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def face_geometry(verts: jnp.ndarray, faces: jnp.ndarray):
    """centroids [F, 3], unit normals [F, 3], bounding radii [F]."""
    tri = verts[faces]  # [F, 3, 3]
    c = tri.mean(axis=1)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    # sqrt(x+eps) form: d norm/dx is NaN at exactly 0 (degenerate faces),
    # and the NaN survives any downstream masking
    n = n / jnp.sqrt((n ** 2).sum(-1, keepdims=True) + 1e-24)
    r = jnp.sqrt(((tri - c[:, None]) ** 2).sum(-1) + 1e-24).max(axis=1)
    return c, n, r


def build_face_filter(faces: np.ndarray,
                      faces_segm: np.ndarray | None = None,
                      ign_part_pairs: list[str] | None = None,
                      faces_parents: np.ndarray | None = None) -> dict:
    """Static per-face data for candidate pruning (FilterFaces analog).

    faces_segm: [F] part id per face; ign_part_pairs: ["9,16", ...] part-id
    pairs whose collisions are ignored (cfg ign_part_pairs,
    cfg_files/PROXD_temp_S2.yaml:153); faces_parents: [F] parent part id of
    each face's part — collisions between a part and its parent part are
    ignored too (torch-mesh-isect FilterFaces semantics, constructed at
    fit_temp_loadprox_slide.py:335-344). All of it is folded into one
    [P, P] bool ignore table consumed by self_intersection_loss."""
    out = {"faces": np.asarray(faces, np.int32)}
    if faces_segm is not None:
        out["segm"] = np.asarray(faces_segm, np.int32)
        pairs = set()
        for p in ign_part_pairs or []:
            a, b = (int(x) for x in p.split(","))
            pairs.add((a, b)); pairs.add((b, a))
        nseg = int(out["segm"].max()) + 1
        tab = np.zeros((nseg, nseg), bool)
        for a, b in pairs:
            if a < nseg and b < nseg:
                tab[a, b] = True
        if faces_parents is not None:
            parents = np.asarray(faces_parents, np.int32)
            out["parents"] = parents
            # part -> parent part (any face of the part determines it)
            for s, pa in zip(out["segm"], parents):
                if 0 <= pa < nseg:
                    tab[s, pa] = True
                    tab[pa, s] = True
        out["ign_table"] = tab
    elif faces_parents is not None:
        out["parents"] = np.asarray(faces_parents, np.int32)
    return out


@partial(jax.jit, static_argnames=("max_candidates", "col_block"))
def self_intersection_loss(
    verts: jnp.ndarray,          # [V, 3]
    faces: jnp.ndarray,          # [F, 3] int
    max_candidates: int | None = None,   # accepted for API compat; unused
    sigma: float = 0.5,
    segm: jnp.ndarray | None = None,       # [F] part ids
    ign_table: jnp.ndarray | None = None,  # [P, P] bool, True = ignore
    col_block: int = 512,
) -> jnp.ndarray:
    """Scalar self-penetration energy for one body (dense blockwise sum).

    Note: the 9-compare adjacency test below was also prototyped as a
    precomputed bit-packed table (pure topology). Both the bit-major and
    a lane-tile layout measured SLOWER than the compares on v5e (9.9-13 s
    vs 6.7 s per step at PROX scale) — uint unpack/relayout costs more
    than the VPU int compares it saves — so the table was dropped.
    """
    del max_candidates  # dense formulation covers all overlapping pairs
    # Recenter on the body centroid: the energy is translation-invariant,
    # and scene-frame coordinates (|v| ~ meters) would otherwise push the
    # expanded quadratic forms' absolute error past the cone bound
    # rad2 ~ 1e-4 m^2. Combined with Precision.HIGHEST below (the matmuls
    # are K=3 — exact f32 costs nothing), the depth/lat2/d2 tests stay
    # accurate under TPU's default bf16 matmul truncation.
    verts = verts - jax.lax.stop_gradient(verts.mean(axis=0))
    c, n, r = face_geometry(verts, faces)
    F = faces.shape[0]
    tri = verts[faces]                     # [F, 3, 3]
    c2 = (c ** 2).sum(-1)                  # [F]
    s = (c * n).sum(-1)                    # [F]  c_i . n_i
    rad2 = (sigma * r) ** 2                # [F]  cone lateral bound

    irow = None
    if segm is not None and ign_table is not None:
        P = ign_table.shape[0]
        # per-face row of the ignore table, built by one-hot matmul so the
        # per-block lookup is an MXU op instead of F*B scalar gathers
        irow = (jax.nn.one_hot(segm, P, dtype=jnp.float32)
                @ ign_table.astype(jnp.float32))           # [F, P]

    pad = (-F) % col_block
    def padc(x, fill=0):
        if not pad:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    n_blk = (F + pad) // col_block
    col_c = padc(c).reshape(n_blk, col_block, 3)
    col_r = padc(r).reshape(n_blk, col_block)
    col_tri = padc(tri).reshape(n_blk, col_block, 3, 3)
    col_valid = padc(jnp.ones((F,), jnp.float32)).reshape(n_blk, col_block)
    xs = {"cj": col_c, "rj": col_r, "trij": col_tri, "validj": col_valid,
          "nj": padc(n).reshape(n_blk, col_block, 3),
          "sj": padc(s).reshape(n_blk, col_block),
          "fj": padc(faces, fill=-1).reshape(n_blk, col_block, 3)}
    if irow is not None:
        xs["segj"] = padc(segm).reshape(n_blk, col_block)

    def step(acc, inp):
        cj, rj, trij, validj = (inp["cj"], inp["rj"], inp["trij"],
                                inp["validj"])
        # bounding-sphere overlap on the MXU (exact f32: K=3, free)
        hi = jax.lax.Precision.HIGHEST
        d2 = (c2[:, None] + (cj ** 2).sum(-1)[None]
              - 2.0 * jnp.matmul(c, cj.T, precision=hi))
        m = d2 < (r[:, None] + rj[None, :]) ** 2            # [F, B]
        # adjacency prune: faces sharing any vertex (covers i == j)
        fj = inp["fj"]
        adj = jnp.zeros(m.shape, bool)
        for p in range(3):
            for q in range(3):
                adj = adj | (faces[:, p, None] == fj[None, :, q])
        m = m & ~adj & (validj[None, :] > 0)
        if irow is not None:
            onehot = jax.nn.one_hot(inp["segj"], irow.shape[1],
                                    dtype=jnp.float32)
            m = m & ((irow @ onehot.T) < 0.5)
        # depths of face j's vertices in face i's plane field (also the
        # forward half of the straddle gate)
        depths = []
        for a in range(3):
            v = trij[:, a]                                  # [B, 3]
            depths.append(s[:, None]
                          - jnp.matmul(n, v.T, precision=hi))  # [F, B]
        dmin = jnp.minimum(jnp.minimum(depths[0], depths[1]), depths[2])
        dmax = jnp.maximum(jnp.maximum(depths[0], depths[1]), depths[2])
        # reverse straddle: face i's vertices against face j's plane
        nj, sj = inp["nj"], inp["sj"]
        rmin = rmax = None
        for a in range(3):
            dr = sj[None, :] - jnp.matmul(tri[:, a], nj.T, precision=hi)
            rmin = dr if rmin is None else jnp.minimum(rmin, dr)
            rmax = dr if rmax is None else jnp.maximum(rmax, dr)
        # two-way plane-straddle gate (tri-tri necessary condition) —
        # hard gate, like the sphere test
        m = m & (dmin < 0) & (dmax > 0) & (rmin < 0) & (rmax > 0)
        # cone field of face i at the 3 vertices of face j
        e = acc
        for a in range(3):
            v = trij[:, a]                                  # [B, 3]
            depth = depths[a]
            lat2 = ((v ** 2).sum(-1)[None]
                    - 2.0 * jnp.matmul(c, v.T, precision=hi)
                    + c2[:, None] - depth ** 2)
            phi = jnp.where(m & (depth > 0) & (lat2 < rad2[:, None]),
                            depth, 0.0)
            e = e + (phi ** 2).sum()
        return e, None

    # remat the step: its [F, B] residuals x n_blk steps would otherwise be
    # the full F^2 working set in the backward pass
    total, _ = jax.lax.scan(jax.checkpoint(step), jnp.zeros((), verts.dtype),
                            xs)
    return total


@partial(jax.jit, static_argnames=("col_block",))
def intersection_candidate_scores(
    verts: jnp.ndarray,          # [V, 3]
    faces: jnp.ndarray,          # [F, 3] int
    margin: float = 0.05,
    sigma: float = 0.5,
    segm: jnp.ndarray | None = None,
    ign_table: jnp.ndarray | None = None,
    col_block: int = 1024,
):
    """Temporal-coherence broad phase, score form: per-face slack to
    FIRING the penetration energy, from STOP-GRADIENT geometry.

    A directed pair (i cone-owner, j vertex-supplier) contributes energy
    iff ALL of (self_intersection_loss's gates): spheres overlap
    (|c_i - c_j| < r_i + r_j), the triangles straddle each other's
    planes (both ways), some vertex v of tri_j is behind face i's plane
    (depth > 0) AND inside its cone (lat < sigma * r_i), and the pair is
    valid (non-adjacent, not part-filtered). The pair's *slack* is how
    far the loosest-missing gate is from firing:

        slack(i, j) = max(d - (r_i + r_j),
                          max(min_v depth_v, -max_v depth_v),   [straddle]
                          max(min_u rdepth_u, -max_u rdepth_u),
                          min_v max(-depth_v, lat_v - sigma * r_i))

    negative iff the pair fires right now; < margin iff every gate is
    within `margin` of firing, i.e. the pair can only start contributing
    after the relevant surface points move O(margin). A face's score is
    the min slack over all directed pairs it appears in — EITHER role,
    since the subset energy needs both endpoints of a firing pair. A
    sphere-only score is useless here: on a smooth mesh every face
    sphere-overlaps its second-ring neighbours (shared-vertex adjacency
    doesn't reach them), so ~all F faces are "sphere-live" while only a
    handful pass the straddle + cone gates.

    This is the role the reference's per-step CUDA BVH rebuild plays
    (fit_temp_loadprox_slide.py:319-344 — a true tri-tri intersection
    broad phase, equally blind to coplanar neighbours), amortized: one
    O(F^2) forward-only sweep per window/refresh instead of an O(F^2)
    energy+gradient sweep per optimizer step.

    Returns (score [F] f32, counts [2] int32 = (n_active, n_within)):
    a face's score is the min slack over all directed pairs it appears
    in (either role) — negative iff the face is on a pair that fires
    RIGHT NOW, < margin iff within the safety margin. The K-subset form
    (:func:`intersection_candidates`) is top-K of -score; callers that
    need to SIZE K from the live count (the driver's coll_candidates
    auto mode) take the scores and argsort host-side, avoiding a second
    O(F^2) sweep.
    """
    verts = jax.lax.stop_gradient(verts)
    # identical recentering + HIGHEST-precision matmuls to
    # self_intersection_loss so the exact-fire clamp below reproduces the
    # energy's razor-edge gate decisions bit-for-bit
    verts = verts - verts.mean(axis=0)
    c, n, r = face_geometry(verts, faces)
    F = faces.shape[0]
    tri = verts[faces]                     # [F, 3, 3]
    c2 = (c ** 2).sum(-1)
    s = (c * n).sum(-1)                    # c_i . n_i
    rad = sigma * r
    rad2 = rad ** 2

    irow = None
    if segm is not None and ign_table is not None:
        P = ign_table.shape[0]
        irow = (jax.nn.one_hot(segm, P, dtype=jnp.float32)
                @ ign_table.astype(jnp.float32))             # [F, P]

    pad = (-F) % col_block

    def padc(x, fill=0):
        if not pad:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    n_blk = (F + pad) // col_block
    xs = {"cj": padc(c).reshape(n_blk, col_block, 3),
          "rj": padc(r).reshape(n_blk, col_block),
          "trij": padc(tri).reshape(n_blk, col_block, 3, 3),
          "nj": padc(n).reshape(n_blk, col_block, 3),
          "sj": padc(s).reshape(n_blk, col_block),
          "validj": padc(jnp.ones((F,), jnp.float32)).reshape(n_blk,
                                                              col_block),
          "fj": padc(faces, fill=-1).reshape(n_blk, col_block, 3),
          "off": jnp.arange(n_blk, dtype=jnp.int32) * col_block}
    if irow is not None:
        xs["segj"] = padc(segm).reshape(n_blk, col_block)

    BIG = jnp.asarray(1e9, jnp.float32)

    def step(carry, inp):
        row_min, col_min = carry
        cj, rj, validj, fj = inp["cj"], inp["rj"], inp["validj"], inp["fj"]
        hi = jax.lax.Precision.HIGHEST
        d2 = (c2[:, None] + (cj ** 2).sum(-1)[None]
              - 2.0 * jnp.matmul(c, cj.T, precision=hi))
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        rsum = r[:, None] + rj[None, :]
        sgap = d - rsum                                      # [F, B]
        # cone slack of face i's field at the 3 vertices of face j —
        # same expanded quadratic forms as the energy
        cone = BIG
        fire_cone = jnp.zeros(sgap.shape, bool)
        dmin = dmax = None
        for a in range(3):
            v = inp["trij"][:, a]                            # [B, 3]
            depth = s[:, None] - jnp.matmul(n, v.T, precision=hi)
            dmin = depth if dmin is None else jnp.minimum(dmin, depth)
            dmax = depth if dmax is None else jnp.maximum(dmax, depth)
            lat2 = ((v ** 2).sum(-1)[None]
                    - 2.0 * jnp.matmul(c, v.T, precision=hi)
                    + c2[:, None] - depth ** 2)
            lat = jnp.sqrt(jnp.maximum(lat2, 0.0))
            cone = jnp.minimum(
                cone, jnp.maximum(-depth, lat - rad[:, None]))
            fire_cone = fire_cone | ((depth > 0) & (lat2 < rad2[:, None]))
        # reverse straddle: face i's vertices against face j's plane
        nj, sj = inp["nj"], inp["sj"]
        rmin = rmax = None
        for a in range(3):
            dr = sj[None, :] - jnp.matmul(tri[:, a], nj.T, precision=hi)
            rmin = dr if rmin is None else jnp.minimum(rmin, dr)
            rmax = dr if rmax is None else jnp.maximum(rmax, dr)
        strad = jnp.maximum(jnp.maximum(dmin, -dmax),
                            jnp.maximum(rmin, -rmax))
        slack = jnp.maximum(jnp.maximum(sgap, cone), strad)
        # the energy gates on the SQUARED tests; the sqrt forms above can
        # round a razor-edge pair the other way, so force any pair the
        # energy fires on to a strictly negative slack — margin >= 0 then
        # covers the active set exactly
        fire = ((d2 < rsum * rsum) & fire_cone
                & (dmin < 0) & (dmax > 0) & (rmin < 0) & (rmax > 0))
        slack = jnp.where(fire, jnp.minimum(slack, -1e-9), slack)
        invalid = validj[None, :] <= 0
        adj = jnp.zeros(slack.shape, bool)
        for p in range(3):
            for q in range(3):
                adj = adj | (faces[:, p, None] == fj[None, :, q])
        invalid = invalid | adj
        if irow is not None:
            onehot = jax.nn.one_hot(inp["segj"], irow.shape[1],
                                    dtype=jnp.float32)
            invalid = invalid | ((irow @ onehot.T) > 0.5)
        slack = jnp.where(invalid, BIG, slack)
        row_min = jnp.minimum(row_min, slack.min(axis=1))
        # a firing pair needs BOTH endpoints in the subset: fold the
        # block's column-side minima into the j faces' scores too
        seg = jax.lax.dynamic_slice(col_min, (inp["off"],), (col_block,))
        col_min = jax.lax.dynamic_update_slice(
            col_min, jnp.minimum(seg, slack.min(axis=0)), (inp["off"],))
        return (row_min, col_min), None

    init = (jnp.full((F,), BIG), jnp.full((F + pad,), BIG))
    (row_min, col_min), _ = jax.lax.scan(step, init, xs)
    score = jnp.minimum(row_min, col_min[:F])
    # n_active: faces the energy draws on RIGHT NOW — a candidate set
    # smaller than this is wrong at refresh time. n_within: faces within
    # the safety margin — a set smaller than this only truncates headroom
    # for surface motion between refreshes.
    n_active = (score < 0.0).sum()
    n_within = (score < margin).sum()
    return score, jnp.stack([n_active, n_within])


@partial(jax.jit, static_argnames=("K", "col_block"))
def intersection_candidates(
    verts: jnp.ndarray,          # [V, 3]
    faces: jnp.ndarray,          # [F, 3] int
    K: int = 4096,
    margin: float = 0.05,
    sigma: float = 0.5,
    segm: jnp.ndarray | None = None,
    ign_table: jnp.ndarray | None = None,
    col_block: int = 1024,
):
    """K-subset form of :func:`intersection_candidate_scores`: the K
    faces nearest to firing (top-K of -score). Returns (ids [K] int32,
    counts [2] int32 = (n_active, n_within))."""
    score, counts = intersection_candidate_scores(
        verts, faces, margin=margin, sigma=sigma, segm=segm,
        ign_table=ign_table, col_block=col_block)
    Keff = min(K, faces.shape[0])
    _, ids = jax.lax.top_k(-score, Keff)
    return ids.astype(jnp.int32), counts


def intersection_candidate_scores_batched(verts_batch, faces,
                                          margin: float = 0.05,
                                          frame_chunk: int = 4, **kw):
    """[B, V, 3] -> (scores [B, F], counts [B, 2]): per-frame face slack
    scores (see :func:`intersection_candidate_scores`)."""
    one = lambda v: intersection_candidate_scores(  # noqa: E731
        v, faces, margin=margin, **kw)
    B = verts_batch.shape[0]
    if B <= frame_chunk:
        return jax.vmap(one)(verts_batch)
    pad = (-B) % frame_chunk
    vb = jnp.concatenate(
        [verts_batch, jnp.broadcast_to(verts_batch[:1],
                                       (pad,) + verts_batch.shape[1:])]) \
        if pad else verts_batch
    chunks = vb.reshape(-1, frame_chunk, *verts_batch.shape[1:])
    scores, counts = jax.lax.map(jax.vmap(one), chunks)
    F = scores.shape[-1]
    return scores.reshape(-1, F)[:B], counts.reshape(-1, 2)[:B]


def intersection_candidates_batched(verts_batch, faces, K: int = 4096,
                                    margin: float = 0.05,
                                    frame_chunk: int = 4, **kw):
    """[B, V, 3] -> (ids [B, K], counts [B, 2]): per-frame candidate
    faces (each frame's fit stays within `margin` of ITS warm start)."""
    one = lambda v: intersection_candidates(v, faces, K=K, margin=margin,
                                            **kw)  # noqa: E731
    B = verts_batch.shape[0]
    if B <= frame_chunk:
        return jax.vmap(one)(verts_batch)
    pad = (-B) % frame_chunk
    vb = jnp.concatenate(
        [verts_batch, jnp.broadcast_to(verts_batch[:1],
                                       (pad,) + verts_batch.shape[1:])]) \
        if pad else verts_batch
    chunks = vb.reshape(-1, frame_chunk, *verts_batch.shape[1:])
    ids, counts = jax.lax.map(jax.vmap(one), chunks)
    Keff = ids.shape[-1]
    return ids.reshape(-1, Keff)[:B], counts.reshape(-1, 2)[:B]


# Narrow-phase implementation:
#   'auto'   - 'pallas' on TPU, 'dense' elsewhere
#   'pallas' - fused VMEM-resident kernel (ops/intersection_pallas.py):
#              energy AND gradients in one O(F^2) sweep with exact
#              tile-sphere block skipping (interpreter-mode on CPU)
#   'dense'  - the XLA blockwise sweep above
# Both compute identical masks/energy; the dispatcher falls back to
# dense when part filtering needs > 32 parts (the Pallas filter is a
# uint32 bitmask).
# Measured on the real chip (scripts/ab_intersection_tpu.py, v5e,
# F=20946, value_and_grad): B=4 dense 138.7 ms/frame vs pallas
# 25.7 ms/frame (5.4x); energy rel diff 3.5e-7, grad max rel 2.6e-5 —
# numbers in PERF.md. Hence 'auto' (pallas on TPU, dense elsewhere).
INTERSECTION_IMPL = "auto"


def batched_self_intersection(verts_batch, faces, frame_chunk: int = 4,
                              candidate_ids=None, **kw):
    """[B, V, 3] -> [B] energies.

    Frames are processed in chunks of `frame_chunk` via lax.map (vmap
    inside the chunk): the per-frame row-side arrays (tri [F, 3, 3] etc.)
    are small, but the vmapped [chunk, F, col_block] mask/energy blocks
    set the transient peak — chunking keeps it a few hundred MB at PROX
    production scale (B=100, F=20946). Differentiability is preserved
    (lax.map is a scan; the inner step is already rematerialized).

    candidate_ids ([B, K] or [K] int32, from
    :func:`intersection_candidates`): evaluate the energy only on these
    faces — an O(K^2) sweep per frame instead of O(F^2). Exact whenever
    every face with an overlapping valid partner is in the set (the
    subset sweep re-applies all masks, so extra faces change nothing);
    the candidate routine's `margin` buys tolerance to motion between
    refreshes.
    """
    impl = INTERSECTION_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "dense"
    tab = kw.get("ign_table")
    use_pallas = impl == "pallas" and (tab is None or tab.shape[0] <= 32)

    if candidate_ids is not None:
        segm = kw.get("segm")
        if candidate_ids.ndim == 1:
            candidate_ids = jnp.broadcast_to(
                candidate_ids, (verts_batch.shape[0],) + candidate_ids.shape)

        def one_sub(v, cand):
            f_sub = faces[cand]
            s_sub = None if segm is None else segm[cand]
            if use_pallas:
                from lemo_tpu.ops.intersection_pallas import \
                    self_intersection_loss_pallas
                return self_intersection_loss_pallas(
                    v, f_sub, sigma=kw.get("sigma", 0.5), segm=s_sub,
                    ign_table=tab)
            return self_intersection_loss(
                v, f_sub, sigma=kw.get("sigma", 0.5), segm=s_sub,
                ign_table=tab,
                col_block=min(kw.get("col_block", 512), cand.shape[-1]))

        # subset sweeps are K^2 — small; map frames sequentially
        return jax.lax.map(lambda a: one_sub(*a),
                           (verts_batch, candidate_ids))

    if use_pallas:
        from lemo_tpu.ops.intersection_pallas import \
            batched_self_intersection_pallas
        pkw = {k: v for k, v in kw.items()
               if k in ("sigma", "segm", "ign_table")}
        return batched_self_intersection_pallas(verts_batch, faces, **pkw)

    B = verts_batch.shape[0]
    one = lambda v: self_intersection_loss(v, faces, **kw)  # noqa: E731
    if B <= frame_chunk:
        return jax.vmap(one)(verts_batch)
    pad = (-B) % frame_chunk
    vb = jnp.concatenate(
        [verts_batch, jnp.zeros((pad,) + verts_batch.shape[1:],
                                verts_batch.dtype)]) if pad else verts_batch
    chunks = vb.reshape(-1, frame_chunk, *verts_batch.shape[1:])
    out = jax.lax.map(jax.vmap(one), chunks).reshape(-1)
    return out[:B]
