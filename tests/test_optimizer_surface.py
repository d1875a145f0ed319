"""Optimizer-factory surface of the PROX window fitters.

The reference's create_optimizer serves adam/lbfgs/lbfgsls/rmsprop/sgd
(temp_prox/optimizers/optim_factory.py:27-65) and raises on anything else;
the fitters here must honor `optim_type` in BOTH driver modes instead of
silently running Adam.
"""

import tempfile

import numpy as np
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.config import ProxConfig
from lemo_tpu.fitting.lbfgs import create_optimizer
from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording


@pytest.fixture(scope="module")
def prox_base():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=20, seed=21)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)
    return info, model


def _cfg(info, **kw):
    base = dict(
        recording_dir=info["recording_dir"],
        output_folder=tempfile.mkdtemp(),
        batch_size=16, maxiters=8, lr=0.01, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        init_mode="none", sdf_penetration=False, use_friction=False,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    base.update(kw)
    return ProxConfig(**base)


def test_factory_raises_on_unknown():
    with pytest.raises(ValueError, match="not supported"):
        create_optimizer("adamw_typo", 0.01)


def test_window_fitter_raises_on_unknown(prox_base):
    info, model = prox_base
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    with pytest.raises(ValueError, match="not supported"):
        run_prox_fitting(_cfg(info, optim_type="newton"), assets,
                         max_windows=1, verbose=False)


@pytest.mark.parametrize("optim_type", ["rmsprop", "sgd"])
def test_gradient_family_fits_a_window(prox_base, optim_type):
    info, model = prox_base
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    res = run_prox_fitting(_cfg(info, optim_type=optim_type, lr=1e-3),
                           assets, max_windows=1, verbose=False)[0]
    assert np.isfinite(res.loss_history).all()
    assert res.loss_history[-1] < res.loss_history[0]


def test_optim_types_actually_differ(prox_base):
    """sgd and adam must produce different trajectories — guards against
    any silent fall-through to a single optimizer."""
    info, model = prox_base
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    r_adam = run_prox_fitting(_cfg(info, optim_type="adam"), assets,
                              max_windows=1, verbose=False)[0]
    r_sgd = run_prox_fitting(_cfg(info, optim_type="sgd"), assets,
                             max_windows=1, verbose=False)[0]
    assert not np.allclose(r_adam.params["transl"], r_sgd.params["transl"])


def test_window_parallel_lbfgs_raises(prox_base):
    info, model = prox_base
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    with pytest.raises(ValueError, match="window_parallel"):
        run_prox_fitting(
            _cfg(info, optim_type="lbfgsls", window_parallel=True,
                 window_polish_iters=0),
            assets, max_windows=1, verbose=False)


def test_window_parallel_honors_optim_type(prox_base):
    """window-parallel with sgd differs from window-parallel with adam
    (the round-3 driver ignored the field entirely in this mode)."""
    info, model = prox_base
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])
    common = dict(window_parallel=True, window_polish_iters=0)
    r_adam = run_prox_fitting(_cfg(info, optim_type="adam", **common),
                              assets, max_windows=1, verbose=False)[0]
    r_sgd = run_prox_fitting(_cfg(info, optim_type="sgd", **common),
                             assets, max_windows=1, verbose=False)[0]
    assert np.isfinite(r_sgd.loss_history).all()
    assert not np.allclose(r_adam.params["transl"], r_sgd.params["transl"])
