"""Test configuration: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication (c)).

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (single tunneled TPU
chip), so the env var alone is not enough — the platform must be overridden via
jax.config before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
