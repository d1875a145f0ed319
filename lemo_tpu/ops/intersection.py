"""Self-intersection penalty — TPU-native fixed-shape formulation.

Replaces the reference's external CUDA stack (torch-mesh-isect: BVH
broad-phase + conical DistanceFieldPenetrationLoss + FilterFaces part-pair
filtering, built at fit_temp_loadprox_slide.py:314-344 and evaluated at
fitting_temp_slide.py:618-635).

TPU redesign (fixed shapes, no trees):
- broad phase: each face keeps its K nearest other-face centroids
  (blockwise MXU distance scan, like Chamfer), pruned by bounding-sphere
  overlap, face adjacency (shared vertices), and an optional part-pair
  ignore table — a dense analog of BVH + FilterFaces with a static
  candidate count;
- narrow phase / energy: for each surviving pair (i, j), the vertices of
  face j are scored against face i's *cone* distance field
  phi(p) = max(0, -(p - c_i) . n_i) clipped to the face's bounding radius
  — the penetration energy of Tzionas et al. in its point-sampled form.
  Differentiable w.r.t. the vertices.
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


def _knn_centroids(c: jnp.ndarray, k: int, chunk: int = 1024):
    """Indices [F, k] of each centroid's k nearest other centroids."""
    F = c.shape[0]
    c2 = (c ** 2).sum(-1)
    pad = (-F) % chunk
    cp = jnp.pad(c, ((0, pad), (0, 0)))
    n_chunks = cp.shape[0] // chunk

    def step(carry, inp):
        best_d, best_i = carry  # [F, k]
        pc, base = inp
        d = c2[:, None] + (pc ** 2).sum(-1)[None] - 2.0 * (c @ pc.T)
        col = base + jnp.arange(chunk)
        d = jnp.where(col[None, :] < F, d, jnp.inf)
        d = jnp.where(col[None, :] == jnp.arange(F)[:, None], jnp.inf, d)
        # merge with running top-k (small k: concatenate + top_k)
        dall = jnp.concatenate([best_d, d], axis=1)
        iall = jnp.concatenate([best_i, jnp.broadcast_to(col, d.shape)], axis=1)
        neg_d, sel = jax.lax.top_k(-dall, k)
        return (-neg_d, jnp.take_along_axis(iall, sel, axis=1)), None

    init = (jnp.full((F, k), jnp.inf), jnp.zeros((F, k), jnp.int32))
    chunks = cp.reshape(n_chunks, chunk, 3)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (dk, ik), _ = jax.lax.scan(step, init, (chunks, bases))
    return dk, ik


def build_face_filter(faces: np.ndarray,
                      faces_segm: np.ndarray | None = None,
                      ign_part_pairs: list[str] | None = None,
                      faces_parents: np.ndarray | None = None) -> dict:
    """Static per-face data for candidate pruning (FilterFaces analog).

    faces_segm: [F] part id per face; ign_part_pairs: ["9,16", ...] part-id
    pairs whose collisions are ignored (cfg ign_part_pairs,
    cfg_files/PROXD_temp_S2.yaml:153)."""
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
        out["ign_table"] = tab
    if faces_parents is not None:
        out["parents"] = np.asarray(faces_parents, np.int32)
    return out


@partial(jax.jit, static_argnames=("max_candidates",))
def self_intersection_loss(
    verts: jnp.ndarray,          # [V, 3]
    faces: jnp.ndarray,          # [F, 3] int
    max_candidates: int = 8,
    sigma: float = 0.5,
    segm: jnp.ndarray | None = None,       # [F] part ids
    ign_table: jnp.ndarray | None = None,  # [P, P] bool, True = ignore
) -> jnp.ndarray:
    """Scalar self-penetration energy for one body."""
    c, n, r = face_geometry(verts, faces)
    dk, ik = _knn_centroids(c, max_candidates)

    # bounding-sphere prune
    rj = r[ik]
    overlap = dk < (r[:, None] + rj) ** 2

    # adjacency prune: faces sharing any vertex
    fi = faces[:, None, :, None]                     # [F, 1, 3, 1]
    fj = faces[ik][:, :, None, :]                    # [F, k, 1, 3]
    shares = (fi == fj).any(axis=(2, 3))             # [F, k]
    cand = jnp.logical_and(overlap, ~shares)

    if segm is not None and ign_table is not None:
        ignored = ign_table[segm[:, None], segm[ik]]
        cand = jnp.logical_and(cand, ~ignored)

    # cone distance field of face i evaluated at the vertices of face j
    tri_j = verts[faces[ik]]                          # [F, k, 3, 3]
    rel = tri_j - c[:, None, None, :]                 # [F, k, 3, 3]
    depth = -(rel * n[:, None, None, :]).sum(-1)      # [F, k, 3] behind plane
    lateral2 = (rel ** 2).sum(-1) - depth ** 2
    inside = lateral2 < (sigma * r[:, None, None]) ** 2
    phi = jnp.where(jnp.logical_and(depth > 0, inside), depth, 0.0)
    phi = jnp.where(cand[:, :, None], phi, 0.0)
    return (phi ** 2).sum()


def batched_self_intersection(verts_batch, faces, frame_chunk: int = 4,
                              **kw):
    """[B, V, 3] -> [B] energies.

    Frames are processed in chunks of `frame_chunk` via lax.map (vmap
    inside the chunk): a plain vmap over the whole window materializes
    the [B, F, k, 3, 3] candidate-triangle tensor — 26 GB at the PROX
    production scale (B=100, F=20946, k=8), which OOMs a 16 GB chip.
    Chunking bounds the peak at frame_chunk/B of that while keeping the
    MXU busy; differentiability is preserved (lax.map is a scan).

    Known limitation: on the tunneled single-chip dev setup, combining
    this term with the full SMPL-X forward at production scale trips a
    TPU-runtime kernel fault (the term alone, and chained through plain
    matmuls, runs fine at the same scale — grad finite, ~32 s/step at
    B=100/F=20946). All shipped LEMO configs run with coll weight 0, so
    the default pipeline is unaffected; on CPU the combined pipeline
    runs correctly (verified end-to-end via the main_slide CLI).
    """
    B = verts_batch.shape[0]
    one = lambda v: self_intersection_loss(v, faces, **kw)  # noqa: E731
    if B <= frame_chunk:
        return jax.vmap(one)(verts_batch)
    pad = (-B) % frame_chunk
    vb = jnp.concatenate(
        [verts_batch, jnp.zeros((pad,) + verts_batch.shape[1:],
                                verts_batch.dtype)]) if pad else verts_batch
    chunks = vb.reshape(-1, frame_chunk, *verts_batch.shape[1:])
    # remat: without it the scan's backward stores every chunk's
    # candidate-triangle tensor — the full 26 GB again
    out = jax.lax.map(jax.checkpoint(jax.vmap(one)), chunks).reshape(-1)
    return out[:B]
