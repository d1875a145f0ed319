"""Stage-2 temporal fitting: smoothness prior + friction on synthetic data,
using the SHIPPED smoothness-prior weights."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lemo_tpu.body_model import load_model, make_forward_fn
from lemo_tpu.body_model import vposer as vp
from lemo_tpu.data.markers import marker_indices
from lemo_tpu.data.segments import foot_vertex_ids
from lemo_tpu.data.stats import GlobalStats
from lemo_tpu.fitting import amass_temp as s2
from lemo_tpu.fitting import params as P
from lemo_tpu.priors.conv_ae import init_smooth_enc, load_torch_state_dict
from lemo_tpu.testing.synthetic import synthetic_smplx_npz

RNG = np.random.RandomState(12)
REF_ENC = "/root/reference/runs/15217/Enc_last_model.pkl"
REF_STATS = ("/root/reference/preprocess_stats/"
             "preprocess_stats_smooth_withHand_global_markers.npz")


@pytest.fixture(scope="module")
def setup():
    md = synthetic_smplx_npz(num_verts=400, seed=4)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    vpp = vp.init_vposer(jax.random.PRNGKey(0))
    ids67 = marker_indices(False, num_verts=400)
    ids81 = marker_indices(True, num_verts=400)
    if os.path.exists(REF_ENC):
        enc = load_torch_state_dict(REF_ENC)
        stats = GlobalStats.load(REF_STATS)
    else:
        enc = init_smooth_enc(jax.random.PRNGKey(1))
        stats = GlobalStats(Xmean=np.zeros((1, 1, 243)), Xstd=np.ones(243))
    feet = foot_vertex_ids(num_verts=400)
    return model, vpp, ids67, ids81, enc, stats, feet


@pytest.mark.slow
def test_temporal_fit_descends(setup):
    model, vpp, ids67, ids81, enc, stats, feet = setup
    T = 12
    init72 = np.zeros((T, 72), np.float32)
    init72[:, 0:3] = [0, 0.4, 1.0]
    init72[:, 3:6] = [0, 1.6, 3.14]
    init72[:, 16:48] = RNG.randn(1, 32) * 0.3  # same pose all frames

    # targets: a smooth marker trajectory near the init body
    sp = P.smplx_params_from_72(jnp.asarray(init72), vpp)
    fwd = make_forward_fn(model)
    base = np.asarray(fwd(sp, model.consts)["vertices"][:, jnp.asarray(ids67), :])
    drift = np.linspace(0, 0.1, T)[:, None, None] * np.array([1.0, 0, 0])
    target = jnp.asarray(base + drift, jnp.float32)
    contact = jnp.asarray(RNG.rand(T, 4) > 0.5, jnp.float32)

    fitted, losses = s2.fit_clip_temporal(
        model, vpp, enc, stats, ids67, ids81, feet, target, contact,
        jnp.asarray(init72), num_steps=30,
        # low smooth weight: synthetic markers aren't body-like, so the
        # real prior's gradient would drown the data term; its semantics
        # are asserted separately in test_smoothness_prior_prefers_smooth
        weights=s2.Stage2Weights(smooth=10.0))
    assert fitted.shape == (T, 72)
    assert np.isfinite(np.asarray(losses)).all()
    # the data term improves: markers move toward the drifting targets
    sp_f = P.smplx_params_from_72(fitted, vpp)
    m_f = fwd(sp_f, model.consts)["vertices"][:, jnp.asarray(ids67), :]
    err_init = float(jnp.abs(jnp.asarray(base) - target).mean())
    err_fit = float(jnp.abs(m_f - target).mean())
    assert err_fit < err_init, (err_fit, err_init)
    # betas stayed frozen
    np.testing.assert_allclose(np.asarray(fitted[:, 6:16]), init72[:, 6:16])


def test_friction_loss_semantics(setup):
    model, vpp, ids67, ids81, enc, stats, feet = setup
    V = 400
    # static body -> zero friction loss
    verts = jnp.ones((5, V, 3))
    lbl = jnp.ones((5, 4))
    assert float(s2.contact_friction_loss(verts, lbl, feet)) == 0.0
    # fast-moving contact feet -> positive
    verts_moving = verts.at[2:].add(0.05)
    assert float(s2.contact_friction_loss(verts_moving, lbl, feet)) > 0.0
    # moving but NOT in contact -> zero
    assert float(s2.contact_friction_loss(
        verts_moving, jnp.zeros((5, 4)), feet)) == 0.0


@pytest.mark.skipif(not os.path.exists(REF_ENC), reason="checkpoint absent")
def test_smoothness_prior_prefers_smooth(setup):
    model, vpp, ids67, ids81, enc, stats, feet = setup
    T = 20
    joints0 = jnp.asarray(np.array([[0, 0, 0.9], [0.1, 0, 0.9],
                                    [-0.1, 0.02, 0.9]] + [[0, 0, 1]] * 22),
                          jnp.float32)
    t = np.linspace(0, 1, T)[:, None, None]
    base = RNG.randn(1, 81, 3) * 0.3
    smooth_m = jnp.asarray(base + t * np.array([0.5, 0, 0]), jnp.float32)
    jerky_m = smooth_m + jnp.asarray(
        (RNG.rand(T, 81, 3) > 0.5) * 0.05, jnp.float32)
    l_smooth = float(s2.smoothness_prior_loss(enc, smooth_m, joints0, stats))
    l_jerky = float(s2.smoothness_prior_loss(enc, jerky_m, joints0, stats))
    assert l_smooth < l_jerky * 0.5, (l_smooth, l_jerky)


@pytest.mark.slow
def test_batched_fitter_matches_per_clip(setup):
    """vmapped clip batching must reproduce the single-clip fits."""
    import jax.numpy as jnp
    import numpy as np

    from lemo_tpu.fitting import amass_temp as s2

    model, vpp, ids67, ids81, enc, stats, feet = setup
    rng = np.random.RandomState(3)
    C, T = 3, 12
    target = jnp.asarray(rng.randn(C, T, 67, 3).astype(np.float32) * 0.2)
    contact = jnp.asarray((rng.rand(C, T, 4) > 0.5).astype(np.float32))
    init72 = jnp.asarray(rng.randn(C, T, 72).astype(np.float32) * 0.1)

    single = s2.make_temporal_fitter(model, vpp, enc, stats, ids67, ids81,
                                     feet, num_steps=5)
    batched = s2.make_temporal_fitter_batched(model, vpp, enc, stats,
                                              ids67, ids81, feet,
                                              num_steps=5)
    xb, lb = batched(target, contact, init72)
    for c in range(C):
        xs, ls = single(target[c], contact[c], init72[c])
        # vmap changes XLA fusion/reassociation: fp32 drift amplified
        # through 5 Adam steps lands ~1e-3 abs on O(0.1-1) params —
        # trajectory divergence, not a math bug; exact equality is not
        # expected
        np.testing.assert_allclose(np.asarray(xb[c]), np.asarray(xs),
                                   rtol=6e-2, atol=2e-3)


def test_folded_batched_matches_vmap(setup):
    """impl='fold' (clip axis folded into the forward batch; fused-path
    compatible) reproduces impl='vmap' trajectories and returns the same
    per-clip loss layout [C, S]."""
    model, vpp, ids67, ids81, enc, stats, feet = setup
    rng = np.random.RandomState(7)
    # (C, T, S) matches test_batched_fitter_matches_per_clip so the
    # vmapped core here is a persistent-compile-cache hit (weights enter
    # the program as traced scalars, so shapes are all that matter)
    C, T, S = 3, 12, 5
    target = jnp.asarray(rng.randn(C, T, 67, 3).astype(np.float32) * 0.2)
    contact = jnp.asarray((rng.rand(C, T, 4) > 0.5).astype(np.float32))
    init72 = jnp.asarray(rng.randn(C, T, 72).astype(np.float32) * 0.1)

    fold = s2.make_temporal_fitter_batched(model, vpp, enc, stats,
                                           ids67, ids81, feet,
                                           num_steps=S, impl="fold")
    vm = s2.make_temporal_fitter_batched(model, vpp, enc, stats,
                                         ids67, ids81, feet,
                                         num_steps=S, impl="vmap")
    xf, lf = fold(target, contact, init72)
    xv, lv = vm(target, contact, init72)
    assert lf.shape == (C, S) and lv.shape == (C, S)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lv),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xv),
                               rtol=6e-2, atol=2e-3)


def test_folded_nan_freeze_is_per_clip(setup):
    """A clip whose loss goes non-finite freezes only ITSELF in the
    folded core: the healthy clips must match a batch fitted without the
    poisoned clip, and the poisoned clip's params stay at its init."""
    model, vpp, ids67, ids81, enc, stats, feet = setup
    rng = np.random.RandomState(9)
    # same (C, T, S) as test_folded_batched_matches_vmap: the folded
    # core compile is shared through the persistent cache
    C, T, S = 3, 12, 5
    target = rng.randn(C, T, 67, 3).astype(np.float32) * 0.2
    contact = (rng.rand(C, T, 4) > 0.5).astype(np.float32)
    init72 = rng.randn(C, T, 72).astype(np.float32) * 0.1
    bad = target.copy()
    bad[0] = np.nan  # clip 0's marker loss is NaN from step 0

    fold = s2.make_temporal_fitter_batched(model, vpp, enc, stats,
                                           ids67, ids81, feet,
                                           num_steps=S, impl="fold")
    xb, lb = fold(jnp.asarray(bad), jnp.asarray(contact),
                  jnp.asarray(init72))
    # poisoned clip: frozen at its init (up to the aa->6d->aa roundtrip);
    # its loss history records the NaN
    np.testing.assert_allclose(np.asarray(xb[0]), init72[0], atol=1e-5)
    assert np.isnan(np.asarray(lb[0])).all()
    # healthy clips: bit-match a fit of the same batch with clip 0 healthy
    # (disjoint params + per-clip freeze => identical trajectories)
    xg, lg = fold(jnp.asarray(target), jnp.asarray(contact),
                  jnp.asarray(init72))
    np.testing.assert_allclose(np.asarray(xb[1:]), np.asarray(xg[1:]),
                               atol=0.0)
    assert np.isfinite(np.asarray(lb[1:])).all()
