"""Test configuration: force CPU with 8 virtual devices (for sharding tests)
and double precision (regression gates match the reference's DOUBLE build,
reference Makefile:27) BEFORE jax initialises."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    # virtual devices time-share one core: shards reach collectives at
    # very different times on load-imbalanced configs, and XLA's CPU
    # rendezvous ABORTS the process after 40s by default (rendezvous.cc).
    # Real TPU collectives have no such watchdog.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("GANDALF_PRECISION", "double")

import jax  # noqa: E402

# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# the config route works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
