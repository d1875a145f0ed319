"""Trilinear sampling of scene signed-distance grids.

Replaces the reference's ``F.grid_sample`` 3-D lookups over the 256^3
scene SDFs (fitting_temp_slide.py:686-694 penetration, :702-705 friction).
Semantics match torch grid_sample with ``padding_mode='border'`` and
``align_corners=False`` (the torch-1.4 default the reference runs with),
with the axis-permutation the reference applies (its ``[2, 1, 0]`` grid
flip cancels grid_sample's (W, H, D) ordering, so effectively
``sdf[x, y, z]`` is sampled at the vertex's (x, y, z)) folded in.

Implementation: 8-corner gather + trilinear blend. The gathers flatten to
1-D takes, which XLA lowers to efficient dynamic-gathers on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_points(points: jnp.ndarray, grid_min: jnp.ndarray,
                     grid_max: jnp.ndarray) -> jnp.ndarray:
    """World points -> [-1, 1]^3 grid coordinates
    (fitting_temp_slide.py:686)."""
    return (points - grid_min) / (grid_max - grid_min) * 2.0 - 1.0


def sample_grid_trilinear(grid: jnp.ndarray, coords: jnp.ndarray,
                          align_corners: bool = False) -> jnp.ndarray:
    """grid: [D0, D1, D2] (or [D0, D1, D2, C]); coords: [..., 3] in
    [-1, 1], coords[..., i] indexes grid axis i. Border padding.
    """
    has_channels = grid.ndim == 4
    if not has_channels:
        grid = grid[..., None]
    dims = jnp.asarray(grid.shape[:3], coords.dtype)

    if align_corners:
        pix = (coords + 1.0) / 2.0 * (dims - 1.0)
    else:
        pix = ((coords + 1.0) * dims - 1.0) / 2.0

    lo = jnp.floor(pix)
    frac = pix - lo

    def clamp(ix):
        return jnp.clip(ix, 0, jnp.asarray(grid.shape[:3]) - 1).astype(jnp.int32)

    c000 = clamp(lo)
    c111 = clamp(lo + 1.0)

    D0, D1, D2 = grid.shape[:3]
    C = grid.shape[-1]

    if C == 1:
        # gather from a flat 1-D buffer: a [N, 1] operand would be laid
        # out in (8, 128) tiles with 127/128 padding waste, making the
        # gather ~100x slower on TPU
        flat1 = grid.reshape(-1)

        def take(i0, i1, i2):
            idx = (i0 * D1 + i1) * D2 + i2
            return flat1[idx][..., None]
    else:
        flat = grid.reshape(-1, C)

        def take(i0, i1, i2):
            idx = (i0 * D1 + i1) * D2 + i2
            return flat[idx.reshape(-1)].reshape(*idx.shape, C)

    x0, y0, z0 = c000[..., 0], c000[..., 1], c000[..., 2]
    x1, y1, z1 = c111[..., 0], c111[..., 1], c111[..., 2]
    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]

    v000 = take(x0, y0, z0)
    v001 = take(x0, y0, z1)
    v010 = take(x0, y1, z0)
    v011 = take(x0, y1, z1)
    v100 = take(x1, y0, z0)
    v101 = take(x1, y0, z1)
    v110 = take(x1, y1, z0)
    v111 = take(x1, y1, z1)

    v00 = v000 * (1 - fz) + v001 * fz
    v01 = v010 * (1 - fz) + v011 * fz
    v10 = v100 * (1 - fz) + v101 * fz
    v11 = v110 * (1 - fz) + v111 * fz
    v0 = v00 * (1 - fy) + v01 * fy
    v1 = v10 * (1 - fy) + v11 * fy
    out = v0 * (1 - fx) + v1 * fx
    return out[..., 0] if not has_channels else out


def pack_grid_bf16(grid: np.ndarray) -> np.ndarray:
    """Pack adjacent-in-k bf16 value pairs into one uint32 per cell.

    ``packed[i, j, k]`` holds ``bf16(grid[i, j, k])`` in the low half-word
    and ``bf16(grid[i, j, min(k+1, D-1)])`` in the high half-word, so ONE
    gather fetches both k-corners of a trilinear cell. TPU gathers are
    per-element bound (~8.5 ns/element regardless of element width up to
    4 B), so this halves the cost of trilinear sampling: 4 uint32 gathers
    instead of 8 fp32 gathers (measured 73 ms -> 37 ms for the PROX
    penetration term's 1.05 M samples on v5e).

    Precompute once per scene on the host (numpy). Same [D0, D1, D2]
    shape as the input, so the body-AABB crop applies unchanged.
    """
    g = np.asarray(grid, np.float32)
    lo = g.astype(jnp.bfloat16).view(np.uint16).astype(np.uint32)
    hi_src = np.concatenate([g[:, :, 1:], g[:, :, -1:]], axis=2)
    hi = hi_src.astype(jnp.bfloat16).view(np.uint16).astype(np.uint32)
    return lo | (hi << 16)


def pack_grid_fp8_quad(grid: np.ndarray) -> np.ndarray:
    """Pack each cell's (j, k) 2x2 corner quad as 4 fp8(e4m3) values in
    one uint32: byte 0 = v[i,j,k], 1 = v[i,j,k+1], 2 = v[i,j+1,k],
    3 = v[i,j+1,k+1] (edge-clamped). TWO gathers then fetch all 8
    trilinear corners — 3.8x faster than the fp32 path and 1.9x faster
    than :func:`pack_grid_bf16` (measured 73.5 -> 19.3 ms for the PROX
    penetration term's 1.05 M samples on v5e).

    fp8 e4m3 precision: ~6% relative per value, i.e. sub-2 mm absolute
    near the SDF zero crossing (values are metres) — penetration depths
    resolve to ~2 mm. Opt-in via ProxConfig.sdf_fp8.
    """
    g = np.asarray(grid, np.float32)

    def sh(a, dj, dk):
        b = a
        if dj:
            b = np.concatenate([b[:, 1:], b[:, -1:]], axis=1)
        if dk:
            b = np.concatenate([b[:, :, 1:], b[:, :, -1:]], axis=2)
        return b

    def fp8(x):
        return x.astype(jnp.float8_e4m3fn).view(np.uint8).astype(np.uint32)

    return (fp8(sh(g, 0, 0)) | (fp8(sh(g, 0, 1)) << 8)
            | (fp8(sh(g, 1, 0)) << 16) | (fp8(sh(g, 1, 1)) << 24))


def _unpack_fp8(w: jnp.ndarray, shift: int):
    b = ((w >> shift) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(
        b, jnp.float8_e4m3fn).astype(jnp.float32)


def sample_grid_trilinear_fp8(packed: jnp.ndarray, coords: jnp.ndarray,
                              align_corners: bool = False) -> jnp.ndarray:
    """Trilinear sampling from a :func:`pack_grid_fp8_quad` grid (two
    gathers). Same border semantics as the packed-bf16 sampler."""
    dims = jnp.asarray(packed.shape[:3], coords.dtype)
    if align_corners:
        pix = (coords + 1.0) / 2.0 * (dims - 1.0)
    else:
        pix = ((coords + 1.0) * dims - 1.0) / 2.0

    lo = jnp.floor(pix)
    frac = pix - lo
    maxi = jnp.asarray(packed.shape[:3]) - 1
    c000 = jnp.clip(lo, 0, maxi).astype(jnp.int32)
    c11_ = jnp.clip(lo + 1.0, 0, maxi).astype(jnp.int32)

    D0, D1, D2 = packed.shape[:3]
    flat1 = packed.reshape(-1)
    x0, y0, z0 = c000[..., 0], c000[..., 1], c000[..., 2]
    x1 = c11_[..., 0]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    def take_quad(i0):
        w = flat1[(i0 * D1 + y0) * D2 + z0]
        v00, v01 = _unpack_fp8(w, 0), _unpack_fp8(w, 8)
        v10, v11 = _unpack_fp8(w, 16), _unpack_fp8(w, 24)
        vk0 = v00 * (1 - fz) + v01 * fz
        vk1 = v10 * (1 - fz) + v11 * fz
        return vk0 * (1 - fy) + vk1 * fy

    return take_quad(x0) * (1 - fx) + take_quad(x1) * fx


def _unpack_bf16_pair(w: jnp.ndarray):
    lo = jax.lax.bitcast_convert_type(
        (w & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def sample_grid_trilinear_packed(packed: jnp.ndarray, coords: jnp.ndarray,
                                 align_corners: bool = False) -> jnp.ndarray:
    """Trilinear sampling from a :func:`pack_grid_bf16` grid.

    Matches :func:`sample_grid_trilinear` up to bf16 quantization of the
    grid values (<=0.4% relative; exact zero-crossings preserved). The
    one semantic difference is below the grid's k=0 border, where the
    exact path clamps both k-corners to plane 0 while the packed pair
    always spans (k0, k0+1) — irrelevant for in-grid query points (body
    vertices are always inside the scene SDF volume).
    """
    dims = jnp.asarray(packed.shape[:3], coords.dtype)
    if align_corners:
        pix = (coords + 1.0) / 2.0 * (dims - 1.0)
    else:
        pix = ((coords + 1.0) * dims - 1.0) / 2.0

    lo = jnp.floor(pix)
    frac = pix - lo
    maxi = jnp.asarray(packed.shape[:3]) - 1
    c000 = jnp.clip(lo, 0, maxi).astype(jnp.int32)
    c11_ = jnp.clip(lo + 1.0, 0, maxi).astype(jnp.int32)

    D0, D1, D2 = packed.shape[:3]
    flat1 = packed.reshape(-1)
    x0, y0, z0 = c000[..., 0], c000[..., 1], c000[..., 2]
    x1, y1 = c11_[..., 0], c11_[..., 1]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    def take_pair(i0, i1):
        v0, v1 = _unpack_bf16_pair(flat1[(i0 * D1 + i1) * D2 + z0])
        return v0 * (1 - fz) + v1 * fz

    v00 = take_pair(x0, y0)
    v01 = take_pair(x0, y1)
    v10 = take_pair(x1, y0)
    v11 = take_pair(x1, y1)
    v0 = v00 * (1 - fy) + v01 * fy
    v1 = v10 * (1 - fy) + v11 * fy
    return v0 * (1 - fx) + v1 * fx


def sample_sdf_world(sdf_grid: jnp.ndarray, points_world: jnp.ndarray,
                     grid_min: jnp.ndarray, grid_max: jnp.ndarray,
                     crop: int | None = 128,
                     packed: bool | str = False):
    """SDF values at world-space points (border padding, align_corners
    False).

    With `crop`, the grid is first dynamic-sliced to a crop^3 window
    around the query points' bounding box (the body occupies a small
    fraction of the scene): gathers from the smaller buffer are ~40%
    cheaper on TPU, and results are identical whenever the points fit the
    window (guaranteed for body vertices; points outside clamp to the
    window border). Set crop=None for exact full-grid sampling.

    With `packed=True`, `sdf_grid` must be a :func:`pack_grid_bf16` uint32
    grid; sampling uses half as many gathers (2x faster) at bf16 grid
    precision. With `packed="fp8"`, it must be a
    :func:`pack_grid_fp8_quad` grid (2 gathers, 3.8x, fp8 precision).
    """
    if packed == "fp8":
        sampler = sample_grid_trilinear_fp8
    elif packed:
        sampler = sample_grid_trilinear_packed
    else:
        sampler = sample_grid_trilinear
    if crop is not None and sdf_grid.ndim == 3 and \
            min(sdf_grid.shape) > crop:
        D = jnp.asarray(sdf_grid.shape, points_world.dtype)
        cell = (grid_max - grid_min) / D
        pts = jax.lax.stop_gradient(points_world).reshape(-1, 3)
        lo_cell = jnp.floor((pts.min(axis=0) - grid_min) / cell) - 1
        starts = jnp.clip(lo_cell, 0,
                          D - crop).astype(jnp.int32)
        sub = jax.lax.dynamic_slice(sdf_grid, tuple(starts[i]
                                                    for i in range(3)),
                                    (crop, crop, crop))
        sub_min = grid_min + starts.astype(points_world.dtype) * cell
        sub_max = sub_min + crop * cell
        coords = normalize_points(points_world, sub_min, sub_max)
        return sampler(sub, coords)
    coords = normalize_points(points_world, grid_min, grid_max)
    return sampler(sdf_grid, coords)


def sdf_penetration_loss(sdf_vals: jnp.ndarray, weight: float = 1.0):
    """sum(|negative sdf|) with the reference's pow(2).sum(-1).sqrt()
    per-element form (fitting_temp_slide.py:690-694) — elementwise that
    reduces to the absolute value of each penetrating sample."""
    pen = jnp.where(sdf_vals < 0, -sdf_vals, 0.0)
    return weight * pen.sum()
