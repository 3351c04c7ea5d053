"""Test harness config: run JAX on a simulated 8-device CPU mesh.

This is the CI-testable analog of a multi-chip TPU slice (SURVEY.md §4.4):
sharding/collective tests validate DP/TP placement without real hardware.
Must run before jax initializes its backends, hence module-level.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
