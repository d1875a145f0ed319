"""Jitted optimization loops: the fitting engine.

The reference runs Python-side ``optimizer.step(closure)`` loops (e.g.
opt_amass_perframe.py:324-355, fitting_temp_slide.py:196-217). Here the
entire fit — optimizer state, learning-rate schedule, gradient masking,
NaN guard — is a single ``lax.scan`` under one ``jit``: one device
dispatch per fit instead of one per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def piecewise_lr(boundaries_values: list[tuple[int, float]], num_steps: int):
    """Dense per-step LR table from [(start_step, lr), ...] segments.

    Matches the reference's in-loop reassignments (e.g. lr 0.1 then 0.01
    after step 60 then 0.003 after step 80, opt_amass_perframe.py:324-330).
    """
    lrs = jnp.zeros(num_steps)
    for start, lr in boundaries_values:
        lrs = jnp.where(jnp.arange(num_steps) >= start, lr, lrs)
    return lrs


def run_adam(
    loss_fn: Callable,
    init_params,
    num_steps: int,
    lr_table: jnp.ndarray,
    grad_mask: Callable | None = None,
    has_aux: bool = False,
):
    """Run `num_steps` of Adam on an arbitrary pytree of parameters.

    - `loss_fn(params) -> loss` (or `(loss, aux)` with has_aux)
    - `lr_table`: [num_steps] per-step learning rates
    - `grad_mask(grads) -> grads`: optional gradient transform (e.g. the
      sliding-window overlap freeze, fitting_temp_slide.py:283-289)

    Returns (final_params, per-step losses [num_steps], final aux).
    NaN/Inf losses freeze the parameters from that step on (the
    reference's early-stop, fitting_temp_slide.py:198-204).
    """
    opt = optax.adam(learning_rate=lambda count: lr_table[count],
                     b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(init_params)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def step(carry, _):
        params, opt_state, dead = carry
        if has_aux:
            (loss, aux), grads = grad_fn(params)
        else:
            loss, grads = grad_fn(params)
            aux = None
        if grad_mask is not None:
            grads = grad_mask(grads)
        updates, new_opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        bad = jnp.logical_or(jnp.isnan(loss), jnp.isinf(loss))
        dead = jnp.logical_or(dead, bad)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(dead, o, n), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, opt_state)
        return (params, opt_state, dead), (loss, aux)

    (params, _, _), (losses, auxes) = jax.lax.scan(
        step, (init_params, opt_state, jnp.asarray(False)), None,
        length=num_steps)
    return params, losses, auxes
