"""Robustifiers and small loss helpers (temp_prox/misc_utils.py:61-85)."""

from __future__ import annotations

import jax.numpy as jnp


def gmof(residual: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Geman-McClure robustifier: rho^2 * r^2 / (r^2 + rho^2)."""
    sq = residual ** 2
    return (rho ** 2) * sq / (sq + rho ** 2)


def gmof_unscaled(residual: jnp.ndarray, rho: float) -> jnp.ndarray:
    sq = residual ** 2
    return sq / (sq + rho ** 2)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray,
                empty_value: float = 0.0) -> jnp.ndarray:
    """mean(values[mask]) with fixed shapes; `empty_value` if no entries
    are selected — the JAX form of the reference's `if (...).sum() >= 1`
    guards around boolean-indexed means."""
    mask = mask.astype(values.dtype)
    total = mask.sum()
    return jnp.where(total > 0, (values * mask).sum() / jnp.maximum(total, 1.0),
                     empty_value)


def hinge_above(values: jnp.ndarray, threshold: float,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """mean of |values| over entries where values > threshold (optionally
    pre-masked) — the contact-velocity hinge pattern
    (opt_amass_temp.py:429-447)."""
    over = values > threshold
    if mask is not None:
        over = jnp.logical_and(over, mask.astype(bool))
    return masked_mean(jnp.abs(values), over)
