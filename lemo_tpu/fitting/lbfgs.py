"""L-BFGS with strong-Wolfe line search, and the optimizer factory.

Capability parity with temp_prox/optimizers/{optim_factory.py, lbfgs_ls.py}
(adam / lbfgs / lbfgsls / rmsprop / sgd selection; L-BFGS with cubic-
interpolation strong-Wolfe line search). Implemented functionally on
pytrees: history is a fixed-size ring buffer, the line search a bounded
`lax.while_loop` — the whole `minimize` jit-compiles.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def create_optimizer(optim_type: str = "adam", lr: float = 1e-3, **kw):
    """The reference's optimizer factory (optim_factory.py:27-65) for the
    gradient-descent family; 'lbfgs'/'lbfgsls' use :func:`lbfgs_minimize`
    (signaled by returning None here)."""
    if optim_type == "adam":
        return optax.adam(lr, b1=kw.get("beta1", 0.9),
                          b2=kw.get("beta2", 0.999))
    if optim_type == "sgd":
        return optax.sgd(lr, momentum=kw.get("momentum", 0.9),
                         nesterov=kw.get("nesterov", True))
    if optim_type == "rmsprop":
        return optax.rmsprop(lr, decay=kw.get("alpha", 0.99),
                             momentum=kw.get("momentum", 0.0))
    if optim_type in ("lbfgs", "lbfgsls"):
        return None
    raise ValueError(f"Optimizer {optim_type} not supported!")


def _tree_dot(a, b):
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def _tree_scale(alpha, x):
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


class _LSState(NamedTuple):
    step: jnp.ndarray
    lo: jnp.ndarray
    hi: jnp.ndarray
    t: jnp.ndarray
    f_t: jnp.ndarray
    g_t: jnp.ndarray  # directional derivative at t
    done: jnp.ndarray


def strong_wolfe(f_and_dirderiv: Callable, f0, g0, t0=1.0,
                 c1: float = 1e-4, c2: float = 0.9, max_iter: int = 20):
    """Strong-Wolfe step length by bisection with Armijo bracketing.

    `f_and_dirderiv(t) -> (f, f')` evaluates along the search ray.
    A bounded, branch-free variant of the reference `_strong_Wolfe`
    (lbfgs_ls.py:39+; the cubic interpolation is replaced by bisection,
    which keeps the loop jittable — convergence-rate parity within the
    same max_iter budget on these smooth objectives).
    """

    def cond(s: _LSState):
        return jnp.logical_and(s.step < max_iter, ~s.done)

    def body(s: _LSState):
        f_t, g_t = f_and_dirderiv(s.t)
        armijo = f_t <= f0 + c1 * s.t * g0
        curv = jnp.abs(g_t) <= -c2 * g0
        done = jnp.logical_and(armijo, curv)
        # bracket update
        hi = jnp.where(~armijo, s.t, s.hi)
        lo = jnp.where(jnp.logical_and(armijo, g_t < 0), s.t, s.lo)
        lo = jnp.where(jnp.logical_and(armijo, g_t >= 0), s.lo, lo)
        hi = jnp.where(jnp.logical_and(armijo, g_t >= 0), s.t, hi)
        new_t = jnp.where(jnp.isinf(hi), s.t * 2.0, 0.5 * (lo + hi))
        return _LSState(s.step + 1, lo, hi,
                        jnp.where(done, s.t, new_t), f_t, g_t, done)

    init = _LSState(jnp.asarray(0), jnp.asarray(0.0), jnp.asarray(jnp.inf),
                    jnp.asarray(t0), f0, g0, jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, init)
    return out.t, out.f_t


def make_lbfgs_stepper(loss_fn: Callable, example_params,
                       history_size: int = 10, lr: float = 1.0,
                       use_line_search: bool = True,
                       tol_grad: float = 1e-7, has_aux: bool = False):
    """Stateful chunked L-BFGS: returns ``(init_state, run_chunk,
    unravel)``.

    ``init_state(params)`` builds the optimizer state;
    ``run_chunk(state, num_steps)`` (jitted, num_steps static) advances it
    and returns ``(state, losses [num_steps], aux_history)`` — so a long
    fit can be dispatched in bounded chunks exactly like the Adam window
    path (L-BFGS state, including the curvature ring buffer, is carried
    across chunks: the result is identical to one long scan).

    NaN guard: when a step produces a non-finite loss or iterate, the
    iterate FREEZES (reference FittingMonitor semantics,
    fitting_temp_slide.py:198-217 — abort-on-NaN, keep last good params)
    and subsequent steps are no-ops.

    With ``has_aux=True``, loss_fn returns (total, aux_dict) and
    run_chunk's third output stacks the aux per iteration (honest per-step
    term history instead of a repeated final snapshot).

    ``loss_fn(params, *extra)``: any extra pytrees given to
    ``run_chunk(state, num_steps, *extra)`` are forwarded — traced inputs,
    so ONE compilation serves every (e.g.) window of a recording.
    """
    vg = jax.value_and_grad(loss_fn, has_aux=has_aux)
    _, unravel = jax.flatten_util.ravel_pytree(example_params)
    m = history_size

    def make_flat_vg(extra):
        def flat_vg(x):
            out, g = vg(unravel(x), *extra)
            v, aux = out if has_aux else (out, None)
            gflat, _ = jax.flatten_util.ravel_pytree(g)
            return v, aux, gflat
        return flat_vg

    def two_loop(g, S, Y, rho, k):
        # standard two-loop recursion over the valid ring entries
        def bwd(i, carry):
            q, alphas = carry
            idx = (k - 1 - i) % m
            valid = i < jnp.minimum(k, m)
            a = jnp.where(valid, rho[idx] * jnp.dot(S[idx], q), 0.0)
            q = q - jnp.where(valid, a, 0.0) * Y[idx]
            return q, alphas.at[idx].set(a)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (g, jnp.zeros(m)))
        # initial Hessian scaling gamma = s.y / y.y of the newest pair
        newest = (k - 1) % m
        have = k > 0
        gamma = jnp.where(
            have,
            jnp.dot(S[newest], Y[newest]) /
            jnp.maximum(jnp.dot(Y[newest], Y[newest]), 1e-10),
            1.0)
        r = gamma * q

        def fwd(i, r):
            idx = (i + jnp.maximum(k - m, 0)) % m
            valid = i < jnp.minimum(k, m)
            beta = jnp.where(valid, rho[idx] * jnp.dot(Y[idx], r), 0.0)
            return r + jnp.where(valid, alphas[idx] - beta, 0.0) * S[idx]

        return jax.lax.fori_loop(0, m, fwd, r)

    def make_step(extra):
      flat_vg = make_flat_vg(extra)

      def step(carry, _):
        x, S, Y, rho, k, dead = carry
        f, aux, g = flat_vg(x)
        d = -two_loop(g, S, Y, rho, k)
        gd = jnp.dot(g, d)
        # fall back to steepest descent if not a descent direction
        bad = gd >= 0
        d = jnp.where(bad, -g, d)
        gd = jnp.where(bad, -jnp.dot(g, g), gd)

        if use_line_search:
            def f_dir(t):
                v, _, gt = flat_vg(x + t * d)
                return v, jnp.dot(gt, d)

            t, f_new = strong_wolfe(f_dir, f, gd, t0=lr)
        else:
            t = jnp.asarray(lr)
        x_new = x + t * d
        _, _, g_new = flat_vg(x_new)
        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        # only store curvature pairs with sy > 0
        store = sy > 1e-10
        idx = k % m
        S_n = jnp.where(store, S.at[idx].set(s), S)
        Y_n = jnp.where(store, Y.at[idx].set(y), Y)
        rho_n = jnp.where(store,
                          rho.at[idx].set(1.0 / jnp.maximum(sy, 1e-10)),
                          rho)
        k_n = k + jnp.where(store, 1, 0)
        converged = jnp.max(jnp.abs(g_new)) < tol_grad
        x_n = jnp.where(converged, x_new, x_new)
        # NaN guard: freeze on non-finite loss or iterate
        bad_step = jnp.logical_or(~jnp.isfinite(f),
                                  ~jnp.isfinite(x_new).all())
        dead = jnp.logical_or(dead, bad_step)
        keep = lambda new, old: jnp.where(dead, old, new)  # noqa: E731
        carry_out = (keep(x_n, x), keep(S_n, S), keep(Y_n, Y),
                     keep(rho_n, rho), jnp.where(dead, k, k_n), dead)
        return carry_out, (f, aux)

      return step

    def init_state(params):
        flat0, _ = jax.flatten_util.ravel_pytree(params)
        n = flat0.shape[0]
        return (flat0, jnp.zeros((m, n)), jnp.zeros((m, n)), jnp.zeros(m),
                jnp.asarray(0), jnp.asarray(False))

    @partial(jax.jit, static_argnames=("num_steps",))
    def run_chunk(state, num_steps: int, *extra):
        state, (losses, aux) = jax.lax.scan(make_step(extra), state, None,
                                            length=num_steps)
        return state, losses, aux

    return init_state, run_chunk, unravel


def lbfgs_minimize(loss_fn: Callable, init_params, max_iter: int = 100,
                   history_size: int = 10, lr: float = 1.0,
                   use_line_search: bool = True, tol_grad: float = 1e-7):
    """Minimize loss_fn over a pytree. Returns (params, per-iter losses)."""
    init_state, run_chunk, unravel = make_lbfgs_stepper(
        loss_fn, init_params, history_size=history_size, lr=lr,
        use_line_search=use_line_search, tol_grad=tol_grad)
    state, losses, _ = run_chunk(init_state(init_params), max_iter)
    return unravel(state[0]), losses
