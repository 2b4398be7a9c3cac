"""Test configuration: force CPU with 8 virtual devices (for sharding tests)
and double precision (regression gates match the reference's DOUBLE build,
reference Makefile:27) BEFORE jax initialises."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("GANDALF_PRECISION", "double")

import jax  # noqa: E402

# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# the config route works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
