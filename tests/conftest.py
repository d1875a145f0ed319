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
