"""Linear blend skinning in pure JAX, engineered for the TPU MXU.

Capability parity with the reference's LBS math
(`human_body_prior/body_model/lbs.py:34-119` and the smplx package's `lbs`),
re-designed TPU-first:

- All heavy ops are batched matmuls that XLA tiles onto the MXU:
  * shape blend:  [B, S] @ [S, V*3]
  * pose blend:   [B, 9(J-1)] @ [9(J-1), V*3]
  * joint regress:[B*3, V] @ [V, J] (via einsum)
  * skinning:     [B, V, J] @ [B, J, 16] — the dominant FLOPs
- The kinematic-chain accumulation (a sequential loop over 22-55 joints in
  the reference, lbs.py:245-251) is a `lax.scan` over the topologically
  ordered joints; its cost is negligible next to skinning.
- Everything is differentiable and vmap/jit friendly; no data-dependent
  shapes.

Precision policy: every matmul in this module runs at Precision.HIGHEST
(f32). TPU's default matmul precision truncates operands to bf16; on
meter-scale geometry that is ~3-8 mm of vertex error (measured on v5e via
a translation-only forward vs the numpy oracle) — far above the ≤1e-4 m
parity target, and the fitters optimize to millimeters. The cost is
negligible: the whole LBS forward is ~1.4 GFLOP at bs=100 against a
latency-bound ~4 ms loss step, so the 6-pass f32 emulation adds ~30 µs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lemo_tpu.ops.rotations import aa_to_matrot

# Precision of the V-sized (heavy) matmuls: shape/pose blend, joint
# regression, skinning, final vertex transform. Module-level so perf
# experiments can A/B it in one process; the kinematic-chain accumulator
# below always stays HIGHEST (it compounds ~12x per joint). Measured on
# v5e (scripts/ab_precision_tpu.py, full-size model, f64 oracle):
#   HIGHEST (exact f32, 6-pass): 4.8e-7 m max vertex err, 4.77 ms S2 step
#   HIGH (3-pass bf16):          9.6e-5 m max vertex err, 4.64 ms S2 step
# HIGHEST is the default: exact forward for ~3% step cost; HIGH stays
# just inside the <=1e-4 m parity target if a deployment wants it.
HEAVY_MATMUL_PRECISION = "highest"


def _heavy():
    return (jax.lax.Precision.HIGHEST
            if HEAVY_MATMUL_PRECISION == "highest"
            else jax.lax.Precision.HIGH)


def blend_shapes(betas: jnp.ndarray, shape_dirs_flat: jnp.ndarray) -> jnp.ndarray:
    """betas [B, S] x shape_dirs_flat [S, V*3] -> [B, V, 3].

    The reference stores shapedirs as [V, 3, S] and einsums
    ('bl,mkl->bmk', lbs.py:162); we pre-flatten to [S, V*3] once at load
    time so this is a single MXU matmul.
    """
    B = betas.shape[0]
    out = jnp.matmul(betas, shape_dirs_flat,
                     precision=_heavy())  # [B, V*3]
    return out.reshape(B, -1, 3)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """J_regressor [J, V] x vertices [B, V, 3] -> joints [B, J, 3]
    (reference lbs.py:122-139)."""
    return jnp.einsum("bvk,jv->bjk", vertices, J_regressor,
                      precision=_heavy())


def _depth_levels(parents) -> list:
    """Group joints 1..J-1 by kinematic-tree depth (static topology).

    Memoized recursion rather than an index-order sweep, so joint
    numbering need not be topologically sorted (SMPL-family models are,
    but the schedule should not silently depend on it)."""
    import numpy as _np

    J = len(parents)
    depth = _np.full(J, -1, _np.int64)
    depth[0] = 0

    def d(i: int) -> int:
        if depth[i] < 0:
            depth[i] = d(int(parents[i])) + 1
        return int(depth[i])

    for i in range(1, J):
        d(i)
    return [_np.nonzero(depth == lvl)[0]
            for lvl in range(1, int(depth.max()) + 1)]


# Kinematic-chain composition strategy:
#   'auto'     - (default) 'pallas' on TPU, 'level' elsewhere
#   'pallas'   - single-kernel serial walk (body_model/chain_pallas.py);
#                fastest on TPU (4.15 vs 4.27 ms full S2 step, and less
#                than half the compile time), interpreter-mode on CPU
#   'level'    - one batched compose per tree depth (~12 XLA rounds)
#   'packed'   - level schedule with (R|t) packed 3x4 (2 einsums/level);
#                measures WITHIN NOISE of level — op count is not the
#                chain's cost driver
#   'doubling' - 4 pointer-doubling rounds; SLOWER (5.2-5.7 ms step):
#                full-width [J+1, J+1] selections outweigh the round
#                reduction at J=55
# All are exact and differ only in f32 association order (~1e-6);
# A/B via scripts/ab_chain_tpu.py.
CHAIN_IMPL = "auto"


def rigid_transform_chain(rot_mats, joints, parents):
    """Dispatch to the configured chain implementation (see CHAIN_IMPL)."""
    impl = CHAIN_IMPL
    if impl == "auto":
        # pallas-interpret on CPU would be slow; the XLA schedule is the
        # right choice everywhere but a real TPU
        impl = "pallas" if jax.default_backend() == "tpu" else "level"
    if impl == "pallas":
        from lemo_tpu.body_model.chain_pallas import \
            rigid_transform_chain_pallas
        return rigid_transform_chain_pallas(rot_mats, joints, parents)
    if impl == "doubling":
        return rigid_transform_chain_doubling(rot_mats, joints, parents)
    if impl == "packed":
        return rigid_transform_chain_packed(rot_mats, joints, parents)
    return rigid_transform_chain_level(rot_mats, joints, parents)


def rigid_transform_chain_packed(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Level-parallel chain with (R, t) packed as one 3x4 affine.

    Same contract and level schedule as
    :func:`rigid_transform_chain_level`, but each level is 2 einsums
    (one packed ancestor selection, one 3x3 x 3x4 compose) instead of 4
    (separate R/t selections and composes): composing affines is
    A_new = R_p @ A_l with t_p added to the last column.
    """
    import numpy as _np

    _hi = jax.lax.Precision.HIGHEST

    B, J = joints.shape[0], joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    levels = _depth_levels(parents)
    perm = [0] + [int(i) for lvl in levels for i in lvl]
    pos = {j: k for k, j in enumerate(perm)}
    A_l_all = jnp.concatenate(
        [rot_mats[:, perm], rel_joints[:, perm][..., None]], axis=-1)
    A_acc = A_l_all[:, 0:1]                       # [B, 1, 3, 4]
    off = 1
    for lvl in levels:
        n = len(lvl)
        S = _np.zeros((n, off), _np.float32)
        for k, i in enumerate(lvl):
            S[k, pos[int(parents[int(i)])]] = 1.0
        S = jnp.asarray(S, rot_mats.dtype)
        Ap = jnp.einsum("lp,bpmk->blmk", S, A_acc, precision=_hi)
        Al = A_l_all[:, off:off + n]
        comp = jnp.einsum("blmn,blnk->blmk", Ap[..., :3], Al,
                          precision=_hi)
        comp = jnp.concatenate(
            [comp[..., :3], comp[..., 3:4] + Ap[..., 3:4]], axis=-1)
        A_acc = jnp.concatenate([A_acc, comp], axis=1)
        off += n
    Pinv = _np.zeros((J, J), _np.float32)
    for j in range(J):
        Pinv[j, pos[j]] = 1.0
    Pinv = jnp.asarray(Pinv, rot_mats.dtype)
    Ag = jnp.einsum("jp,bpmk->bjmk", Pinv, A_acc, precision=_hi)
    Rg, tg = Ag[..., :3], Ag[..., 3]

    posed_joints = tg
    rel_t = tg - jnp.einsum("bjmn,bjn->bjm", Rg, joints, precision=_hi)
    rel = jnp.concatenate([Rg, rel_t[..., None]], axis=-1)  # [B, J, 3, 4]
    return posed_joints, rel


def rigid_transform_chain_doubling(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pointer-doubling form of the kinematic chain.

    Same contract as :func:`rigid_transform_chain_level`. Instead of one
    compose per tree DEPTH (~12 sequential rounds for SMPL-X), round k
    composes every joint's partial transform with that of its 2^k-th
    ancestor, so after ceil(log2(max_depth+1)) = 4 rounds every joint
    holds its full root-path product. Each round is a static one-hot
    ancestor selection ([J+1, J+1] matmul) plus one batched 3x4 affine
    compose over ALL joints — 4x the compose FLOPs of the level schedule
    (trivial at [B, 55, 3, 3]) for 3x fewer sequential rounds, which is
    what matters: the chain is dispatch-latency-bound, not FLOP-bound
    (measured: a structure-of-arrays rewrite changed nothing, and the
    level schedule's win over the serial 54-step walk tracked its round
    count). Index 0 is a virtual identity node that absorbs ancestor
    jumps past the root, so root-path products come out exact.
    """
    import numpy as _np

    _hi = jax.lax.Precision.HIGHEST

    B, J = joints.shape[0], joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    # depth of each joint; rounds needed = ceil(log2(max_depth + 1))
    depth = _np.zeros(J, _np.int64)
    for i in range(1, J):
        depth[i] = depth[int(parents[i])] + 1
    rounds = max(1, int(_np.ceil(_np.log2(depth.max() + 1))))

    # virtual identity node at slot 0; joint j lives at slot j+1
    anc = _np.zeros(J + 1, _np.int64)
    anc[1] = 0                                   # root -> identity
    anc[2:] = _np.asarray(parents[1:], _np.int64) + 1

    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot_mats.dtype), (B, 1, 3, 3))
    R = jnp.concatenate([eye, rot_mats], axis=1)           # [B, J+1, 3, 3]
    t = jnp.concatenate([jnp.zeros((B, 1, 3), rel_joints.dtype),
                         rel_joints], axis=1)              # [B, J+1, 3]

    for _ in range(rounds):
        S = _np.zeros((J + 1, J + 1), _np.float32)
        S[_np.arange(J + 1), anc] = 1.0
        S = jnp.asarray(S, rot_mats.dtype)
        R_anc = jnp.einsum("ap,bpmn->bamn", S, R, precision=_hi)
        t_anc = jnp.einsum("ap,bpm->bam", S, t, precision=_hi)
        R, t = (jnp.einsum("bamn,bank->bamk", R_anc, R, precision=_hi),
                jnp.einsum("bamn,ban->bam", R_anc, t, precision=_hi) + t_anc)
        anc = anc[anc]

    Rg, tg = R[:, 1:], t[:, 1:]
    posed_joints = tg
    rel_t = tg - jnp.einsum("bjmn,bjn->bjm", Rg, joints, precision=_hi)
    rel = jnp.concatenate([Rg, rel_t[..., None]], axis=-1)  # [B, J, 3, 4]
    return posed_joints, rel


def rigid_transform_chain_level(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose per-joint local transforms along the kinematic tree.

    rot_mats [B, J, 3, 3], joints (rest pose) [B, J, 3], parents [J] int
    (parents[0] is the root and ignored). Returns (posed_joints [B, J, 3],
    rel_transforms [B, J, 3, 4] affine) — same math as the reference
    `batch_rigid_transform` (lbs.py:208-263) without the constant
    homogeneous row.

    TPU note: the reference walks joints one at a time — 54 serial 4x4
    matmuls whose latency dominates the whole body-model forward (~70%
    measured at bs=100). Joints at the same tree DEPTH have independent,
    already-finalized parents, so the walk here is level-parallel: one
    batched [B, |level|, 3, 3] compose per depth (~12 levels for SMPL-X
    instead of 54 serial steps, 2x faster forward, measured). Parent
    selection uses static one-hot matmuls and level results are
    CONCATENATED (never scattered): the backward of a matmul is a matmul
    and the backward of a concat is a slice, so value_and_grad through
    the chain stays scatter-free too. `parents` must be static numpy
    topology so the level schedule and selection matrices are built at
    trace time.

    The selection/un-permute einsums are pure permutations, so they run at
    Precision.HIGHEST: at [J, J] scale that is free, and it keeps the
    accumulated rotations/translations exact on TPU (default matmul
    precision would truncate the accumulator to bf16 once per level —
    ~12 extra rounding steps per joint that the reference's gather-based
    chain never incurs).
    """
    import numpy as _np

    _hi = jax.lax.Precision.HIGHEST

    B, J = joints.shape[0], joints.shape[1]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    levels = _depth_levels(parents)
    perm = [0] + [int(i) for lvl in levels for i in lvl]
    pos = {j: k for k, j in enumerate(perm)}
    Rl_all = rot_mats[:, perm]     # static-permutation reorder of inputs
    tl_all = rel_joints[:, perm]
    R_acc = Rl_all[:, 0:1]
    t_acc = tl_all[:, 0:1]
    off = 1
    for lvl in levels:
        n = len(lvl)
        S = _np.zeros((n, off), _np.float32)
        for k, i in enumerate(lvl):
            S[k, pos[int(parents[int(i)])]] = 1.0
        S = jnp.asarray(S, rot_mats.dtype)
        Rp = jnp.einsum("lp,bpmn->blmn", S, R_acc, precision=_hi)
        tp = jnp.einsum("lp,bpm->blm", S, t_acc, precision=_hi)
        Rl = Rl_all[:, off:off + n]
        tl = tl_all[:, off:off + n]
        R_acc = jnp.concatenate(
            [R_acc, jnp.einsum("blmn,blnk->blmk", Rp, Rl, precision=_hi)],
            axis=1)
        t_acc = jnp.concatenate(
            [t_acc, jnp.einsum("blmn,bln->blm", Rp, tl, precision=_hi)
             + tp], axis=1)
        off += n
    Pinv = _np.zeros((J, J), _np.float32)
    for j in range(J):
        Pinv[j, pos[j]] = 1.0
    Pinv = jnp.asarray(Pinv, rot_mats.dtype)
    Rg = jnp.einsum("jp,bpmn->bjmn", Pinv, R_acc, precision=_hi)
    tg = jnp.einsum("jp,bpm->bjm", Pinv, t_acc, precision=_hi)

    posed_joints = tg

    # subtract the rest-pose joint positions rotated into each bone frame
    rel_t = tg - jnp.einsum("bjmn,bjn->bjm", Rg, joints,
                            precision=_hi)
    rel = jnp.concatenate([Rg, rel_t[..., None]], axis=-1)  # [B, J, 3, 4]
    return posed_joints, rel


# Vertex-path implementation:
#   'auto'  - fused Pallas kernel on TPU when the model carries the fused
#             constants (body_model/vertex_pallas.py), XLA elsewhere
#   'fused' - force the fused kernel (interpreter-mode off-TPU: tests)
#   'xla'   - the separate-matmul path below
# The fused kernel computes blend shapes + pose offsets + skinning in one
# VMEM-resident pass per V-tile (custom VJP mirrors it) — no [B, V, 3]
# intermediates in HBM and ~10 fewer dispatches per forward; exact f32.
LBS_IMPL = "auto"


def lbs(
    shape_components: jnp.ndarray,  # [B, S] betas (+expression/dmpls)
    pose: jnp.ndarray,  # [B, (J)*3] axis-angle incl. root
    v_template: jnp.ndarray,  # [V, 3]
    shapedirs_flat: jnp.ndarray,  # [S, V*3]
    posedirs: jnp.ndarray | None,  # [9*(J-1), V*3] or None
    J_regressor: jnp.ndarray,  # [J, V]
    parents,  # [J] static numpy ints
    lbs_weights: jnp.ndarray,  # [V, J]
    *,
    pose2rot: bool = True,
    fused_consts: dict[str, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full LBS forward. Returns (vertices [B, V, 3], joints [B, J, 3]).

    Faithful to reference lbs.py:34-119, with matmuls arranged for the MXU.
    `fused_consts` (load_model attaches them: fused_dirs, lbs_w_pad,
    j_ext) enables the single-kernel vertex path.
    """
    B = shape_components.shape[0]
    V = v_template.shape[0]

    impl = LBS_IMPL
    if impl == "auto":
        impl = "fused" if (fused_consts is not None
                           and jax.default_backend() == "tpu") else "xla"
    if impl == "fused" and fused_consts is not None and posedirs is not None:
        return _lbs_fused(shape_components, pose, parents, fused_consts,
                          V, pose2rot=pose2rot)

    v_shaped = v_template[None] + blend_shapes(shape_components, shapedirs_flat)
    J = vertices2joints(J_regressor, v_shaped)  # [B, J, 3]

    if pose2rot:
        rot_mats = aa_to_matrot(pose.reshape(B, -1, 3))  # [B, J, 3, 3]
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)

    if posedirs is not None:
        ident = jnp.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # [B, 9(J-1)]
        pose_offsets = jnp.matmul(
            pose_feature, posedirs,
            precision=_heavy()).reshape(B, V, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = rigid_transform_chain(rot_mats, J, parents)

    # skinning: T = W @ A — dominant matmul. A is affine [B, J, 3, 4];
    # blending affines is linear, so blending the 12 coefficients and
    # applying once is identical math to the reference's homogeneous 4x4
    # path with 25% less matmul output traffic.
    #
    # Layout: the natural einsum 'vj,bjk->bvk' is a batched GEMM with
    # N=12 — 12/128 MXU lanes busy, and it measured ~1.45 ms of a 3.7 ms
    # Stage-2 step (fwd+bwd, B=100, v5e). Folding the batch into the
    # lane dimension makes it ONE [V, J] @ [J, B*12] matmul (N=1200);
    # the only extra data movement is transposing A ([B, J, 12] -> 264 KB
    # at B=100, free) and v_posed once each way. The whole vertex
    # transform runs V-major and transposes back at the end (12.6 MB,
    # ~0.03 ms) — the [B, V, 12] blend matrix never materializes.
    num_joints = J_regressor.shape[0]
    A_t = A.reshape(B, num_joints, 12).transpose(1, 0, 2)  # [J, B, 12]
    T_vb = jnp.matmul(lbs_weights, A_t.reshape(num_joints, B * 12),
                      precision=_heavy()).reshape(V, B, 3, 4)
    v_posed_t = v_posed.transpose(1, 0, 2)                 # [V, B, 3]
    verts_vb = (jnp.einsum("vbmn,vbn->vbm", T_vb[..., :3], v_posed_t,
                           precision=_heavy())
                + T_vb[..., 3])
    verts = verts_vb.transpose(1, 0, 2)
    return verts, posed_joints


def _lbs_fused(shape_components, pose, parents, fc, num_verts, *,
               pose2rot=True):
    """Fused, PLANE-MAJOR vertex path (body_model/vertex_pallas.py).

    The entire forward runs in plane layout ([comp, J, B] / [comp, V, B]
    with the batch on TPU lanes): rest-pose joints come straight from
    the shape components via the precomputed `j_ext` matmul, Rodrigues
    is elementwise on pose planes (one XLA fusion), the kinematic chain
    composes planes in the Pallas chain kernel, the bone affines feed
    the fused vertex kernel as planes, and the pose-feature rows of the
    blend input are a reshape of the rotation planes (posedirs columns
    were permuted to match at load). The only [B, ...]-layout tensors
    are the tiny joint outputs and the final vertex transpose — no
    [B, V, 3] or [B, J, 3, 3] intermediates, no layout ops between the
    stages, and both autodiff directions inherit the same structure.
    """
    import numpy as _np

    from lemo_tpu.body_model.chain_pallas import _chain_planes, _pad_to
    from lemo_tpu.body_model.vertex_pallas import (
        LANE, fused_lbs_vertices_planes)
    from lemo_tpu.ops.rotations import aa_to_matrot_planes

    _hi = jax.lax.Precision.HIGHEST
    B = shape_components.shape[0]
    S = shape_components.shape[1]
    Jp = fc["lbs_w_pad"].shape[1]
    J = fc["j_ext"].shape[0] // 3
    Bp = B + _pad_to(B, LANE)

    # rest-pose joint planes [3, Jp, Bp] from the shape components
    shape_T = jnp.pad(shape_components.T, ((0, 0), (0, Bp - B)))  # [S, Bp]
    cat_s = jnp.concatenate(
        [shape_T, jnp.ones((1, Bp), shape_T.dtype)])              # [S+1, Bp]
    jr = jnp.matmul(fc["j_ext"], cat_s, precision=_hi).reshape(3, J, Bp)
    jr = jnp.pad(jr, ((0, 0), (0, Jp - J), (0, 0)))

    # local rotation planes [9, Jp, Bp]
    if pose2rot:
        p_pl = pose.reshape(B, J, 3).transpose(2, 1, 0)           # [3, J, B]
        p_pl = jnp.pad(p_pl, ((0, 0), (0, Jp - J), (0, Bp - B)))
        rl = aa_to_matrot_planes(p_pl)
    else:
        rl = pose.reshape(B, J, 9).transpose(2, 1, 0)
        rl = jnp.pad(rl, ((0, 0), (0, Jp - J), (0, Bp - B)))

    # rel-joint translation planes: tl[j] = jr[j] - jr[parent(j)]
    # (root keeps jr[0]) as one static scatter-free matmul
    parents_np = _np.asarray(parents, _np.int64)
    Msub = _np.eye(Jp, dtype=_np.float32)
    for j in range(1, J):
        Msub[j, int(parents_np[j])] -= 1.0
    tl = jnp.einsum("jp,npb->njb", jnp.asarray(Msub), jr, precision=_hi)

    parents_padded = tuple(
        [int(p) for p in parents_np] + [0] * (Jp - J))
    rg, tg = _chain_planes(rl, tl, parents_padded)    # [9/3, Jp, Bp]

    # bone affines: rel_t[m] = tg[m] - sum_n rg[3m+n] * jr[n]
    rel_t = jnp.stack([
        tg[m] - (rg[3 * m] * jr[0] + rg[3 * m + 1] * jr[1]
                 + rg[3 * m + 2] * jr[2])
        for m in range(3)])
    A_pl = jnp.concatenate([rg, rel_t], axis=0)       # [12, Jp, Bp]

    # pose-feature rows r = k*(J-1) + (j-1): a reshape of the rotation
    # planes minus identity (dirs pose block is permuted to this order)
    ident_k = jnp.asarray(
        _np.eye(3, dtype=_np.float32).reshape(9, 1, 1))
    pf = (rl[:, 1:J, :] - ident_k).reshape(9 * (J - 1), Bp)
    catT = jnp.concatenate(
        [shape_T, pf, jnp.ones((1, Bp), shape_T.dtype)])

    out = fused_lbs_vertices_planes(catT, A_pl, fc["fused_dirs"],
                                    fc["lbs_w_pad"])  # [3, Vp, Bp]
    verts = out[:, :num_verts, :B].transpose(2, 1, 0)
    posed_joints = tg[:, :J, :B].transpose(2, 1, 0)
    return verts, posed_joints
