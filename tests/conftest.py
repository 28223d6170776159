"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU pods (SURVEY.md §4)."""

import os

# must happen before jax import
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's sitecustomize pins JAX_PLATFORMS to the TPU plugin; tests
# must run on the virtual 8-device CPU mesh, so override post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
