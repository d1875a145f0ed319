"""Per-vertex camera visibility — a TPU-native z-buffer formulation.

Replaces ``psbody.mesh.visibility.visibility_compute`` (C++ ray casting,
called per frame per optimizer iteration from the depth term,
fitting_temp_slide.py:642-655 — a major CPU<->GPU round-trip in the
reference). Here: project vertices into a coarse pixel grid, scatter-min
their depths into a z-buffer, and mark a vertex visible when its depth is
within `eps` of the buffer minimum at its pixel. Runs entirely on device,
batched over frames, differentiability not required (the reference also
detaches it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("res",))
def visibility_zbuffer(
    verts: jnp.ndarray,   # [V, 3] in CAMERA coordinates (+z forward)
    fx: float, fy: float, cx: float, cy: float,
    width: int = 1920, height: int = 1080,
    res: int = 256,
    eps: float = 0.02,
) -> jnp.ndarray:
    """Boolean [V] visibility from the camera at the origin."""
    z = verts[:, 2]
    valid = z > 1e-4
    zs = jnp.where(valid, z, 1.0)
    u = verts[:, 0] / zs * fx + cx
    v = verts[:, 1] / zs * fy + cy
    px = jnp.clip((u / width * res).astype(jnp.int32), 0, res - 1)
    py = jnp.clip((v / height * res).astype(jnp.int32), 0, res - 1)
    in_img = (u >= 0) & (u < width) & (v >= 0) & (v < height) & valid

    idx = py * res + px
    big = jnp.full((res * res,), jnp.inf, verts.dtype)
    zbuf = big.at[jnp.where(in_img, idx, 0)].min(
        jnp.where(in_img, z, jnp.inf))
    front = z <= zbuf[idx] + eps
    return jnp.logical_and(in_img, front)


def backface_mask(verts: jnp.ndarray, normals: jnp.ndarray,
                  cam_origin=None) -> jnp.ndarray:
    """Vertices whose normal faces the camera (cheap additional cull)."""
    if cam_origin is None:
        view = -verts
    else:
        view = cam_origin[None] - verts
    return (normals * view).sum(-1) > 0.0


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals from a triangle mesh ([V,3], [F,3])."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    norm = jnp.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)
