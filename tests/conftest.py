"""Test config: run all tests on a virtual 8-device CPU platform.

Must set XLA flags before the first jax import anywhere in the process, so
this lives at the top of conftest (pytest imports it before test modules).
Multi-chip sharding paths are exercised on this virtual mesh; the real-TPU
bench path is exercised separately by bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
# before conftest runs, so the env vars above can be too late — update the
# live config as well (backends are initialized lazily, so this still wins
# as long as no test ran yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
