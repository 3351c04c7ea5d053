"""Test harness config: run JAX on a simulated 8-device CPU mesh.

This is the CI-testable analog of a multi-chip TPU slice (SURVEY.md §4.4):
sharding/collective tests validate DP/TP placement without real hardware,
and numeric tests get deterministic fp32 (the real-TPU MXU runs fp32
matmuls as bf16 passes unless asked otherwise). Must run before jax
initializes its backends, hence module-level. Set SI_TPU_TESTS=1 to run
the suite on the real chip instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("SI_TPU_TESTS"):
    # The TPU PJRT plugin (when present) registers itself at interpreter
    # start and wins over the JAX_PLATFORMS env var, so force the choice
    # through jax.config before any backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(__file__))

# Hermetic tests: engines enable the persistent compile cache by default
# (engine.enable_compilation_cache, first caller wins) — point it at a
# throwaway dir so test runs never write into the user's real ~/.cache
# or flip process-global jax config toward it.
import tempfile

from simpleinfer_tpu.engine import enable_compilation_cache

enable_compilation_cache(tempfile.mkdtemp(prefix="si_test_xla_cache_"))
