"""Offline marker-occlusion mask generation.

Capability parity with utils/get_occlusion_mask.py: for each frame of a
fitted recording, mark body markers whose projected position is occluded
by the scene (their depth lies behind the scene's depth at that pixel by
more than `margin`). The reference renders scene depth with pyrender;
here the scene's points are splatted into the same coarse z-buffer used
by :mod:`lemo_tpu.ops.visibility` — all on device, batched over frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("res", "width", "height"))
def marker_occlusion_mask(
    markers_cam: jnp.ndarray,      # [T, M, 3] markers in camera coords
    scene_points_cam: jnp.ndarray,  # [S, 3] scene points in camera coords
    fx: float, fy: float, cx: float, cy: float,
    width: int = 1920, height: int = 1080,
    res: int = 256,
    margin: float = 0.1,
) -> jnp.ndarray:
    """[T, M] mask, 1 = visible, 0 = occluded by scene depth
    (utils/get_occlusion_mask.py:39-241 semantics: occluded when marker
    depth > scene depth + 0.1 m at its pixel)."""
    z = scene_points_cam[:, 2]
    valid = z > 1e-4
    zs = jnp.where(valid, z, 1.0)
    u = scene_points_cam[:, 0] / zs * fx + cx
    v = scene_points_cam[:, 1] / zs * fy + cy
    px = jnp.clip((u / width * res).astype(jnp.int32), 0, res - 1)
    py = jnp.clip((v / height * res).astype(jnp.int32), 0, res - 1)
    in_img = (u >= 0) & (u < width) & (v >= 0) & (v < height) & valid
    idx = py * res + px
    zbuf = jnp.full((res * res,), jnp.inf).at[
        jnp.where(in_img, idx, 0)].min(jnp.where(in_img, z, jnp.inf))

    def per_frame(m):
        mz = m[:, 2]
        ok = mz > 1e-4
        mzs = jnp.where(ok, mz, 1.0)
        mu = m[:, 0] / mzs * fx + cx
        mv = m[:, 1] / mzs * fy + cy
        mpx = jnp.clip((mu / width * res).astype(jnp.int32), 0, res - 1)
        mpy = jnp.clip((mv / height * res).astype(jnp.int32), 0, res - 1)
        inside = (mu >= 0) & (mu < width) & (mv >= 0) & (mv < height) & ok
        scene_z = zbuf[mpy * res + mpx]
        occluded = jnp.logical_and(inside, mz > scene_z + margin)
        return jnp.where(occluded, 0.0, 1.0)

    return jax.vmap(per_frame)(markers_cam)
