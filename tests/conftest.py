"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated with
xla_force_host_platform_device_count (SURVEY.md §4). Note: the axon TPU plugin in this
image overrides the JAX_PLATFORMS env var, so we must force CPU through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
