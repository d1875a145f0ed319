"""Profiling and timing hooks.

The reference's only instrumentation is wall-clock timing around the fits
(fit_temp_loadprox_slide.py:549-573 with cuda synchronize). Here: the same
wall-clock helper plus real profiler integration — jax.profiler traces
viewable in TensorBoard/Perfetto, the TPU-native upgrade.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """Device-synchronized wall-clock timing (the reference's
    `torch.cuda.synchronize(); time.time()` pattern)."""
    # ensure pending work is done before starting the clock
    jax.effects_barrier()
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    sink(f"[{label}] {time.perf_counter() - t0:.4f} s")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (open in TensorBoard's profile tab or
    Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
