"""Test harness: force an 8-device virtual CPU platform so mesh/sharding tests
run without TPU hardware (SURVEY.md §4 strategy (d))."""

import os

# Must happen before jax is imported anywhere. Force CPU: the global
# environment pins JAX_PLATFORMS=axon (the real-TPU tunnel), which is both
# slow for unit tests and single-device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel regardless of the env
# var; the config knob does win.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
# This environment's CPU backend does fp32 matmuls at bf16-grade precision by
# default (TPU-emulating). Tests check logic, not hardware numerics.
jax.config.update("jax_default_matmul_precision", "highest")
# Single-core box: persist compiled executables across test runs.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
