"""Test config: expose a virtual 8-device CPU mesh for sharding tests.

Must set env before the first jax import (hence module scope in conftest).
Note: in environments where a TPU plugin is force-registered at interpreter
start (sitecustomize), JAX_PLATFORMS=cpu cannot demote it — single-device
tests then run on the default backend, while multi-device tests explicitly
request ``jax.devices("cpu")`` (8 virtual devices via the XLA flag below).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: the sandbox has 1 CPU core, so re-JITs dominate
# test wall time without this.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
