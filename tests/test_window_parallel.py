"""Window-parallel PROX fitting on the 8-device virtual mesh."""

import tempfile

import numpy as np
import jax
import pytest

from lemo_tpu.body_model import load_model
from lemo_tpu.config import ProxConfig
from lemo_tpu.fitting.prox.driver import ProxAssets, run_prox_fitting
from lemo_tpu.testing.synthetic_prox import write_synthetic_prox_recording


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_window_parallel_matches_sequential_first_window():
    base = tempfile.mkdtemp()
    info = write_synthetic_prox_recording(base, num_frames=40, seed=9,
                                          write_depth=False)
    model = load_model(info["model_dict"], use_pca=True, num_pca_comps=12)

    common = dict(
        recording_dir=info["recording_dir"],
        batch_size=16, maxiters=6, lr=0.005, flip=False,
        s2m=False, m2s=False, read_depth=False, read_mask=False,
        sdf_penetration=True, use_friction=True,
        use_motion_smooth_prior=False, interpenetration=False,
        contact=False, use_motion_infill_prior=False,
    )
    assets = ProxAssets(model=model, vposer_params=info["vposer_params"])

    seq = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), **common),
        assets, max_windows=3, verbose=False)
    par = run_prox_fitting(
        ProxConfig(output_folder=tempfile.mkdtemp(), window_parallel=True,
                   **common),
        assets, max_windows=3, verbose=False)

    assert len(seq) == len(par) == 3
    # window 0 has no overlap dependence: parallel == sequential exactly
    np.testing.assert_allclose(par[0].params["transl"],
                               seq[0].params["transl"], atol=2e-5)
    np.testing.assert_allclose(par[0].loss_history, seq[0].loss_history,
                               rtol=2e-4)
    # later windows: same warm starts, finite losses (stitching semantics
    # differ by design — overlap frames keep warm-start values)
    for r in par[1:]:
        assert np.isfinite(r.final_loss)
