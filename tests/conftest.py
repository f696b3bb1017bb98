"""Test configuration.

Tests run on CPU with 8 virtual devices by default so distributed/mesh
logic is exercised without TPU hardware (the JAX-native answer to the
reference having no multi-node test story — SURVEY.md §4). Set
``MODALTUNE_TEST_BACKEND=tpu`` to run the suite on real chips (Pallas
kernel parity tests auto-enable there).

Note: the ``JAX_PLATFORMS`` env var is not honored in environments where
a TPU plugin self-registers, so the CPU pin uses ``jax.config`` instead.
"""

import os

_backend = os.environ.get("MODALTUNE_TEST_BACKEND", "cpu")

if _backend == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a TPU backend (run with MODALTUNE_TEST_BACKEND=tpu)")
