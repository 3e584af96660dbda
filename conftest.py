"""Root conftest: force CPU with 8 virtual devices for unit tests.

The axon sitecustomize registers the tunnelled TPU backend at interpreter
start and sets jax_platforms="axon,cpu" via jax.config (which overrides the
JAX_PLATFORMS env var), so we must both set XLA_FLAGS before backends
initialise *and* update the config after importing jax.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
