"""Licensed-asset parity auto-hook (VERDICT r3 ask #7).

The definitive end-to-end parity target — marker error vs the reference's
committed golden fits (`res_opt_amass_temp/TotalCapture`) — needs the
LICENSED SMPL-X npz, which this environment does not ship. This test
turns the manual harness (`scripts/parity_report.py`) into CI: it is
SKIPPED until a real model appears at a documented location, and from
that day on parity is a test, not a runbook step.

Provide the model via either:
  * env  `SMPLX_MODEL_DIR=/path/to/smplx/models`  (contains
    SMPLX_MALE.npz / SMPLX_FEMALE.npz), or
  * the conventional checkout path `<repo>/models/smplx/`.
Optionally `VPOSER_CKPT=/path/to/vposer` (snapshot dir) for exact pose
decode; without it the fit still runs (random VPoser) and only the
marker-space bound is asserted.

Expected numbers (documented in README.md): with the licensed model and
the shipped reference smoothness prior, the Stage-2 re-fit from the
golden Stage-1 init recovers the reference's fixed point to
mean < 10 mm / p95 < 25 mm in marker space (the synthetic-geometry
analog, tests/test_golden_format.py, recovers < 5 mm).
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN = "/root/reference/res_opt_amass_temp/TotalCapture"


def _model_dir():
    cand = [os.environ.get("SMPLX_MODEL_DIR", ""),
            osp.join(REPO, "models", "smplx")]
    for d in cand:
        if d and (osp.exists(osp.join(d, "SMPLX_MALE.npz"))
                  or osp.exists(osp.join(d, "SMPLX_NEUTRAL.npz"))):
            return d
    return None


@pytest.mark.slow
@pytest.mark.skipif(_model_dir() is None,
                    reason="licensed SMPL-X npz not present (set "
                           "SMPLX_MODEL_DIR or place models/smplx/)")
@pytest.mark.skipif(not osp.isdir(GOLDEN),
                    reason="reference golden outputs not mounted")
def test_golden_parity_with_licensed_model():
    sys.path.insert(0, osp.join(REPO, "scripts"))
    import parity_report

    argv = ["--model_folder", _model_dir(), "--clip", "0",
            "--num_steps", "100"]
    vposer = os.environ.get("VPOSER_CKPT", "")
    if vposer:
        argv += ["--vposer_ckpt", vposer]
    m = parity_report.main(argv)
    assert isinstance(m, dict), "parity harness exited before fitting"
    # the fit must RECOVER the reference's fixed point, i.e. land far
    # inside the Stage-1 init's error
    assert m["marker_err_mean_mm"] < 10.0, m
    assert m["marker_err_p95_mm"] < 25.0, m
    assert m["marker_err_mean_mm"] < 0.5 * m["init_err_mean_mm"], m
    assert np.isfinite(m["final_loss"])
