"""Test configuration: force CPU with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh) and enable x64 for exact-oracle comparisons.

Must run before jax initialises its backends, hence env vars at import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers a TPU-tunnel backend and forces
# jax_platforms programmatically, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
