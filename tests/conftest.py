"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference is Float64 throughout; parity tests need x64.  Multi-device
tests use XLA's host-platform device partitioning — the TPU-world equivalent
of "multi-node without a cluster" (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU via the config (not the env var): site customization may import
# jax before this conftest runs, baking a pre-set JAX_PLATFORMS (e.g. a real
# TPU tunnel) into the config default — that platform is slow for unit tests
# and has no float64.  Set MIOC_TEST_TPU=1 to test on the configured platform.
if not os.environ.get("MIOC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# TPU has no float64: a MIOC_TEST_TPU run keeps the default f32 (tests with
# platform-sensitive tolerances read the platform, e.g. test_bellman.py).
# MIOC_TEST_F32=1 keeps f32 on CPU too — a cheap dry run that predicts which
# tests are precision-bound before paying for a real TPU suite run.
if jax.devices()[0].platform != "tpu" and not os.environ.get("MIOC_TEST_F32"):
    jax.config.update("jax_enable_x64", True)
