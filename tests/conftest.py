"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization.  The ambient environment pins
JAX_PLATFORMS=axon (the real-TPU tunnel) and sitecustomize imports jax at
interpreter startup, so env-var tricks are too late — force the platform
through jax.config before any backend is instantiated instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables after each test module.

    The full suite compiles several hundred XLA:CPU programs across the
    8 virtual devices; letting them accumulate in one process
    eventually aborts/segfaults inside `backend_compile_and_load`
    (observed deterministically at ~81% of the suite — a native
    compiler-arena failure, not a test bug).  Per-module cache clears
    keep the JIT arena bounded; cross-module recompiles are few because
    test modules mostly compile their own kernels."""
    yield
    jax.clear_caches()
