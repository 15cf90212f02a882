"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU: they run on the CPU backend with 8 virtual devices
so multi-chip sharding (pjit / shard_map over a Mesh) is exercised everywhere,
matching how the driver dry-runs the multichip path.  Must run before jax imports.
"""

import os

# Force, don't setdefault: the machine-level axon sitecustomize pins
# JAX_PLATFORMS=axon (the tunneled TPU) before any user code runs.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU; caching XLA
# executables across runs cuts re-runs from ~20 min to seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
