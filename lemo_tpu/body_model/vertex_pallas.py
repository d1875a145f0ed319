"""The whole SMPL-X vertex path as ONE Pallas TPU kernel (+ custom VJP).

Motivation (PERF.md round-2 step anatomy): the Stage-2 optimizer step is
a long chain of small XLA ops running ~10x below both the compute and
HBM rooflines — per-op dispatch and HBM round-trips dominate, not FLOPs.
The vertex path is the bulk of it: shape blend, pose blend, skinning
blend and the per-vertex affine apply are four separate matmul ops with
[B, V, 3]-sized intermediates (12.6 MB each at B=100) materialized
between them, twice more in the backward pass.

This kernel computes, per V-tile, entirely in VMEM:

    vs[n]  = dirs[n] @ cat        # shape+pose blend and template add,
                                  # one [TV, D] @ [D, B] matmul
    T      = W_tile @ A2          # skinning blend [TV, J] @ [J, 12B]
    out[m] = sum_n T[3m+n] * vs[n] + T[9+m]

where `cat` stacks [shape_comp | pose_feature | 1] (D = S + 9(J-1) + 1)
so one matmul covers both blend families plus the template, and A2 holds
the per-frame bone affines plane-major ([J, 12*Bp], lane-aligned
slices). No [B, V, 3] intermediate ever touches HBM; the only outputs
are the final vertex planes [3, V, Bp].

The custom VJP runs the mirrored kernel (recomputing T and vs from the
saved inputs rather than storing 50 MB of per-vertex affines):

    dT[3m+n] = dout[m] * vs[n];  dT[9+m] = dout[m]
    dA2     += W_tile^T @ dT
    dvs[n]   = sum_m T[3m+n] * dout[m]
    dcat    += sum_n dirs[n]^T @ dvs[n]

Model constants (dirs, W) are treated as NON-differentiable: their
returned cotangent is zero (the fitters never optimize the template /
blend dirs; reference parity needs only param gradients).

Reference semantics: human_body_prior/body_model/lbs.py:34-119 (blend
shapes + pose offsets + LBS skinning), reformulated plane-major.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_V = 256   # V-tile rows; VMEM high-water ~5 MB in the backward
# frame-batch (lane-axis) tile: the folded window-parallel fitter runs
# W*T frames through ONE forward (window.py impl='fold'), so Bp can be
# thousands — unblocked, the backward's scoped-VMEM footprint scales
# with Bp and overflows the 16 MB limit at Bp≈640 (measured on v5e).
# Blocking the batch keeps VMEM flat; the extra cost is re-reading the
# dirs blocks once per B-tile (~64 MB * Bp/TILE_B per call, ~1 ms/GB).
TILE_B = 256


def _tile_b(Bp: int) -> int:
    return TILE_B if Bp % TILE_B == 0 else LANE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pad_to(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, precision=_HI):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _dotT(a, b, precision=_HI):
    """a [K, M], b [K, N] -> a^T @ b [M, N] (contract leading dims)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(cat_ref, a2_ref, dirs_ref, w_ref, out_ref):
    """cat [D, Bp]; a2 planes [12, Jp, Bp] (k = 3m+n rotations, 9+m
    translations); dirs block [3, TV, D]; w block [TV, Jp]; out block
    [3, TV, Bp]."""
    w = w_ref[:]
    cat = cat_ref[:]
    vs = [_dot(dirs_ref[n], cat) for n in range(3)]     # [TV, B] x3
    for m in range(3):
        acc = _dot(w, a2_ref[9 + m])                    # translation
        for n in range(3):
            acc = acc + _dot(w, a2_ref[3 * m + n]) * vs[n]
        out_ref[m] = acc


def _bwd_kernel(cat_ref, a2_ref, dirs_ref, w_ref, dout_ref,
                dcat_ref, da2_ref):
    """Mirror of the forward; dcat/da2 blocks are shared across the
    V-tile grid axis (index_map ignores it) and accumulated tile by
    tile — the TPU grid is sequential with the LAST axis fastest, so for
    each B-tile all V-tiles run consecutively and += revisits are
    well-defined."""
    i = pl.program_id(1)           # V-tile index (fastest axis)
    w = w_ref[:]
    cat = cat_ref[:]
    vs = [_dot(dirs_ref[n], cat) for n in range(3)]
    dout = [dout_ref[m] for m in range(3)]

    dcat = jnp.zeros_like(cat)
    for k in range(12):
        if k < 9:
            m, n = k // 3, k % 3
            dTk = dout[m] * vs[n]                       # [TV, B]
        else:
            dTk = dout[k - 9]
        da2_k = _dotT(w, dTk)                           # [Jp, B]

        @pl.when(i == 0)
        def _(k=k, da2_k=da2_k):
            da2_ref[k] = da2_k

        @pl.when(i > 0)
        def _(k=k, da2_k=da2_k):
            da2_ref[k] = da2_ref[k] + da2_k

    for n in range(3):
        dvs = (_dot(w, a2_ref[n]) * dout[0]
               + _dot(w, a2_ref[3 + n]) * dout[1]
               + _dot(w, a2_ref[6 + n]) * dout[2])
        dcat = dcat + _dotT(dirs_ref[n], dvs)           # [D, B]

    @pl.when(i == 0)
    def _():
        dcat_ref[:] = dcat

    @pl.when(i > 0)
    def _():
        dcat_ref[:] = dcat_ref[:] + dcat


def _fwd_call(catT, A2, dirs, w):
    D, Bp = catT.shape
    Jp = A2.shape[1]
    Vp = dirs.shape[1]
    n_tiles = Vp // TILE_V
    tb = _tile_b(Bp)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(Bp // tb, n_tiles),
        out_shape=jax.ShapeDtypeStruct((3, Vp, Bp), catT.dtype),
        in_specs=[
            pl.BlockSpec((D, tb), lambda b, i: (0, b)),
            pl.BlockSpec((12, Jp, tb), lambda b, i: (0, 0, b)),
            pl.BlockSpec((3, TILE_V, D), lambda b, i: (0, i, 0)),
            pl.BlockSpec((TILE_V, Jp), lambda b, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((3, TILE_V, tb), lambda b, i: (0, i, b)),
        interpret=_interpret(),
    )(catT, A2, dirs, w)


def _bwd_call(catT, A2, dirs, w, dout):
    D, Bp = catT.shape
    Jp = A2.shape[1]
    Vp = dirs.shape[1]
    n_tiles = Vp // TILE_V
    tb = _tile_b(Bp)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(Bp // tb, n_tiles),
        out_shape=(jax.ShapeDtypeStruct((D, Bp), catT.dtype),
                   jax.ShapeDtypeStruct((12, Jp, Bp), A2.dtype)),
        in_specs=[
            pl.BlockSpec((D, tb), lambda b, i: (0, b)),
            pl.BlockSpec((12, Jp, tb), lambda b, i: (0, 0, b)),
            pl.BlockSpec((3, TILE_V, D), lambda b, i: (0, i, 0)),
            pl.BlockSpec((TILE_V, Jp), lambda b, i: (i, 0)),
            pl.BlockSpec((3, TILE_V, tb), lambda b, i: (0, i, b)),
        ],
        out_specs=(pl.BlockSpec((D, tb), lambda b, i: (0, b)),
                   pl.BlockSpec((12, Jp, tb), lambda b, i: (0, 0, b))),
        interpret=_interpret(),
    )(catT, A2, dirs, w, dout)


@jax.custom_vjp
def _vertex_core(catT, A2, dirs, w):
    return _fwd_call(catT, A2, dirs, w)


def _vertex_core_fwd(catT, A2, dirs, w):
    return _fwd_call(catT, A2, dirs, w), (catT, A2, dirs, w)


def _vertex_core_bwd(res, dout):
    catT, A2, dirs, w = res
    dcat, da2 = _bwd_call(catT, A2, dirs, w, dout)
    # dirs/w are frozen model constants — zero cotangent by contract
    # (module docstring); XLA folds/DCEs the zeros.
    return dcat, da2, jnp.zeros_like(dirs), jnp.zeros_like(w)


_vertex_core.defvjp(_vertex_core_fwd, _vertex_core_bwd)


def build_fused_consts(shape_expr_f64: np.ndarray,
                       posedirs_f64: np.ndarray,
                       v_template_f64: np.ndarray,
                       lbs_weights: np.ndarray,
                       J_regressor_f64: np.ndarray) -> dict[str, np.ndarray]:
    """Precompute the kernel's constant operands at model-load time.

    shape_expr [V, 3, S] (betas [+expression] dirs), posedirs [V, 3, P]
    (P = 9(J-1)), v_template [V, 3], lbs_weights [V, J], J_regressor
    [J, V] -> dict with:

    - `fused_dirs` [3, Vp, D] (D = S + P + 1); the pose-dir block is
      PERMUTED to plane order r = k*(J-1) + (j-1) (k = 3m+n) so the
      pose-feature rows of `cat` come straight from the rotation planes
      with a reshape, no transpose (lbs._lbs_fused);
    - `lbs_w_pad` [Vp, Jp];
    - `j_ext` [3*J, S+1]: J_regressor pre-applied (at f64) to the shape
      dirs plus a template column, so rest-pose joint PLANES are one
      [3J, S+1] @ [S+1, B] matmul from the shape components.
    """
    V, _, S = shape_expr_f64.shape
    P = posedirs_f64.shape[2]
    J = lbs_weights.shape[1]
    D = S + P + 1
    Vp = pad_to(V, TILE_V)
    Jp = pad_to(J, 8)
    dirs = np.zeros((3, Vp, D), np.float32)
    # plane-order permutation of the pose-feature index:
    # original p = (j-1)*9 + k  ->  row r = k*(J-1) + (j-1)
    r = np.arange(P)
    perm = (r % (J - 1)) * 9 + (r // (J - 1))
    for n in range(3):
        dirs[n, :V, :S] = shape_expr_f64[:, n, :]
        dirs[n, :V, S:S + P] = posedirs_f64[:, n, perm]
        dirs[n, :V, D - 1] = v_template_f64[:, n]
    w_pad = np.zeros((Vp, Jp), np.float32)
    w_pad[:V, :J] = lbs_weights
    # j_ext[n*J + j, :] -> joint j, coordinate n
    jd = np.einsum("jv,vns->njs", J_regressor_f64, shape_expr_f64)
    jt = (J_regressor_f64 @ v_template_f64).T[..., None]   # [3, J, 1]
    j_ext = np.concatenate([jd, jt], axis=-1).reshape(3 * J, S + 1)
    return {"fused_dirs": dirs, "lbs_w_pad": w_pad,
            "j_ext": j_ext.astype(np.float32)}


def fused_lbs_vertices_planes(catT: jnp.ndarray,
                              A_planes: jnp.ndarray,
                              fused_dirs: jnp.ndarray,
                              lbs_w_pad: jnp.ndarray) -> jnp.ndarray:
    """catT [D, Bp] ([shape | plane-ordered pose feature | 1] columns),
    bone-affine planes A_planes [12, Jp, Bp] -> vertex planes
    [3, Vp, Bp]. The caller (lbs._lbs_fused) builds both operands
    directly in plane layout — no [B, ...] intermediates."""
    assert catT.shape[0] == fused_dirs.shape[2], \
        (catT.shape, fused_dirs.shape)
    return _vertex_core(catT, A_planes, fused_dirs, lbs_w_pad)
