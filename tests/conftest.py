"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests execute without TPU hardware (the standard JAX
substitute for a fake backend — SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself (jax_platforms="axon,cpu") and
# routes every compile through a remote tunnel; unit tests run on the local
# CPU backend with 8 virtual devices instead.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# XLA's default matmul/conv path truncates to bf16 even on CPU; tests verify
# exact numerical contracts, so force full fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache (~/.cache/cwfa_tpu/xla): re-runs of the suite
# skip recompiling unchanged programs on this 1-core host.  Keys include the
# HLO hash + platform/topology, so entries never cross configurations;
# CWFA_COMPILE_CACHE=0 disables.
from cwfa_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
