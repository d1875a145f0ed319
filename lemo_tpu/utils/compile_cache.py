"""Persistent XLA compilation cache, host-keyed.

The PROX window programs cost 30-60 s of XLA compile per
(recording-shape, config); the compile neither shards over the mesh nor
differs across recordings with the same window shape, so a disk cache
turns every run after the first into a cache-warm run (the
`v5e8_projection_cachewarm` number in perf/ab_window_parallel_r5.json).

The cache directory is keyed by CPU model+flags: XLA's CPU AOT loader
accepts executables compiled for a different machine type with only a
warning and cross-host reuse was observed to silently change f32
results (razor-edge gate flips) — same scheme as tests/conftest.py. On
TPU backends the executable is keyed by the accelerator target, so the
host key only adds safety for CPU runs.
"""

from __future__ import annotations

import hashlib
import os


def _host_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            key = ""
            for line in f:
                if line.startswith(("flags", "model name")):
                    key += line
                    if "flags" in key and "model name" in key:
                        break
            if key:
                return hashlib.sha1(key.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point jax at a persistent compilation cache directory and return
    it. Safe to call more than once; call BEFORE the first compilation
    to get hits in this process."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "LEMO_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "lemo_tpu",
                         "xla", _host_key()))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
