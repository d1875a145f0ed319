"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The harness boots every interpreter with the `axon` TPU PJRT plugin
registered (sitecustomize) and `JAX_PLATFORMS=axon`; plain env overrides do
not stick because the plugin updates jax's config directly. Tests therefore
override via jax.config before any backend is initialized, and request 8
virtual host devices so multi-chip shardings compile and execute on CPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the suite compiles many
# near-identical PROX loss programs across test files (separate processes
# and separate jit closures can't share the in-process cache); the disk
# cache dedupes by HLO hash. Measured 2.7x on the window-parallel file
# warm; identical first-run compiles within one run also hit it.
#
# The cache dir is keyed by the host CPU: XLA's CPU AOT loader accepts
# executables compiled for a different machine type with only a warning
# ("could lead to execution errors such as SIGILL"), and cross-host reuse
# was observed to silently change f32 results (razor-edge gate flips in
# the intersection tests) when rounds run on heterogeneous machines.
import hashlib


def _host_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            # flags AND model name: two hosts can share a flags line yet
            # get different XLA tuning (e.g. prefer-no-scatter), and the
            # AOT loader then warns + may silently change f32 results
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


_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compilation_cache", _host_key())
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
