"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware.

Note: the axon TPU site-hook overrides the ``JAX_PLATFORMS`` env var, so we
force the platform through ``jax.config`` (which wins) before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
