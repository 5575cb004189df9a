"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/pjit paths are exercised
without a pod (the reference has no fake-GPU backend and needs real CUDA for
every kernel test, SURVEY.md §4; on TPU we can do better via interpret mode).

Set BITBLAS_TPU_TEST_REAL=1 to run on the attached real TPU chip instead.

Note: the axon TPU PJRT plugin ignores the JAX_PLATFORMS env var, so we must
force the platform through jax.config before any computation runs.
"""

import os

REAL = bool(os.environ.get("BITBLAS_TPU_TEST_REAL"))

if not REAL:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not REAL:
    jax.config.update("jax_platforms", "cpu")
