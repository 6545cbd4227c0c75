"""Test configuration: force CPU with 8 virtual devices.

The sandbox's sitecustomize imports jax at interpreter boot with
``JAX_PLATFORMS=axon`` (the TPU tunnel), so the platform must be overridden
through ``jax.config`` — the env var is already consumed.  ``XLA_FLAGS`` is
still honored because the CPU backend initializes lazily.  Multi-chip
sharding tests then run on a virtual 8-device CPU mesh, mirroring how the
driver validates the multi-chip path without real chips.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables + tracing caches between test modules.

    A full-suite run accumulates hundreds of XLA:CPU executables across
    one process; past ~115 tests the next LLVM compile segfaults
    (reproduced twice at the same index, while every module passes
    standalone).  Per-module cache clearing keeps the compiler state
    bounded — the hygiene the reference gets for free from per-process
    CUDA test isolation."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
