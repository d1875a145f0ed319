"""Differentiable pinhole camera projection (temp_prox/camera.py:42-116).

In the PROX pipeline the camera is 'fixed': rotation frozen at identity,
translation at zero, only intrinsics matter (main_slide.py:186-193 creates
the camera and freezes rotation; the fitters never optimize its params).
The general rotated/translated form is kept for the camera-init stage.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    focal_length_x: float = 5000.0
    focal_length_y: float = 5000.0
    center: tuple[float, float] = (0.0, 0.0)

    def project(self, points: jnp.ndarray,
                rotation: jnp.ndarray | None = None,
                translation: jnp.ndarray | None = None) -> jnp.ndarray:
        """points [..., N, 3] in camera coords -> pixel coords [..., N, 2].

        Optional rotation [3, 3] / translation [3] transform the points
        first (camera extrinsics as parameters, camera.py:102-108).
        """
        if rotation is not None:
            points = points @ rotation.T
        if translation is not None:
            points = points + translation
        xy = points[..., :2] / points[..., 2:3]
        f = jnp.asarray([self.focal_length_x, self.focal_length_y],
                        points.dtype)
        c = jnp.asarray(self.center, points.dtype)
        return xy * f + c
