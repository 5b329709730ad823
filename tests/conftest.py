"""Test environment: CPU backend with 8 virtual XLA devices and x64 enabled.

Multi-device behavior is tested the TPU-native way — a virtual host-platform
device mesh — since real multi-chip hardware is not available in CI.

Note: in this environment the JAX_PLATFORMS env var is overridden by the
harness (axon), so we must select the platform through jax.config before any
backend is initialized. Backends initialize lazily, so doing this at conftest
import time (before any test imports jax functionality that creates arrays)
is sufficient.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
