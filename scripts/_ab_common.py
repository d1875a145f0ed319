"""Shared steady-state measurement for the TPU A/B harnesses.

A single `run(cfg)` wall-clock conflates three costs: jit compile, the
per-window pre-pass (candidate selection, IO, warm-start assembly), and
the per-step optimization. The two-point scheme isolates the last one:

  1. warmup run (few iters): populates the persistent XLA compile cache
     so the timed runs see near-identical (cached) compile costs;
  2. timed runs at maxiters m1 < m2: both pay the same fixed cost C, so
     steady ms/step = (t2 - t1) / (m2 - m1).

Any warning raised during the runs (e.g. a candidate-count truncation)
is captured into the result dict — a truncated candidate set would make
the speed number meaningless, so it must be visible in the artifact.
"""

from __future__ import annotations

import time
import warnings


def measure_steady(run_for_maxiters, m1: int, m2: int, warmup: int):
    """run_for_maxiters(maxiters) -> result; returns a metrics dict."""
    caught: list = []
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        t0 = time.time()
        run_for_maxiters(warmup)
        t_warm = time.time() - t0

        t0 = time.time()
        res1 = run_for_maxiters(m1)
        t1 = time.time() - t0

        t0 = time.time()
        res2 = run_for_maxiters(m2)
        t2 = time.time() - t0
        caught = sorted({str(w.message) for w in rec})

    steady = (t2 - t1) / (m2 - m1)
    return {
        "warmup_iters": warmup, "warmup_wall_s": round(t_warm, 1),
        "m1": m1, "wall_m1_s": round(t1, 1),
        "m2": m2, "wall_m2_s": round(t2, 1),
        "steady_ms_per_step": round(steady * 1e3, 1),
        "fixed_cost_s": round(t1 - m1 * steady, 1),
        "warnings": caught,
    }, res2
