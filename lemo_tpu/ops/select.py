"""Static row selection as MXU matmuls.

TPU gathers cost ~8.5 ns per element and their backward is a scatter-add
(worse); selecting a few dozen marker rows out of [B, 10475, 3] vertices
inside a fitting step measured ~0.8 ms of a 3.7 ms Stage-2 step (v5e,
fwd+bwd). For a STATIC index set, the same selection is a one-hot
[M, V] @ [V, B*K] matmul: forward and backward are both matmuls, and at
Precision.HIGHEST the result is bit-exact f32 (each output row is
1.0 * x + 0.0 * rest). Measured: the matmul form is ~10x cheaper inside
value_and_grad (profiled via scripts/profile_s2_parts.py `onehot`).

Use for hot per-step selections with static ids (SSM2 markers, foot
vertex sets). Plain indexing stays the right tool for one-off selections
and dynamic ids (e.g. per-window SDF candidates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def onehot_rows(ids, n: int) -> jnp.ndarray:
    """[M, n] f32 selection matrix for static ids (host-built constant)."""
    ids = np.asarray(ids)
    m = np.zeros((ids.shape[0], n), np.float32)
    m[np.arange(ids.shape[0]), ids] = 1.0
    return jnp.asarray(m)


def take_rows(x: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """x [..., V, K] selected to [..., M, K] via the one-hot matmul.

    Exact: HIGHEST-precision one-hot selection reproduces x's rows
    bit-for-bit (tested against x[..., ids, :]).
    """
    return jnp.einsum("mv,...vk->...mk", onehot, x,
                      precision=jax.lax.Precision.HIGHEST)
