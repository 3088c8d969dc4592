"""Test config: expose a virtual 8-device CPU mesh for sharding tests.

Must set env before the first jax import (hence module scope in conftest).

In environments where a TPU plugin is force-registered at interpreter start
(a sitecustomize on PYTHONPATH), ``JAX_PLATFORMS=cpu`` cannot demote it:
the plugin wraps ``jax.get_backend`` and initializes its remote client on
ANY backend lookup, so the "CPU" suite silently runs op-by-op through the
TPU attachment relay (~60x slower, and hangs outright when the relay is
unhealthy). The only airtight fix is to not load the plugin at all, so this
conftest re-execs pytest once with the plugin path stripped from PYTHONPATH
and JAX_PLATFORMS pinned to cpu — the same isolation recipe as
``__graft_entry__.dryrun_multichip`` and ``tests/test_multihost.py``.
"""
import os
import sys


def _needs_reexec() -> bool:
    return (os.environ.get("MASKBEV_TESTS_REEXEC") != "1"
            and (any("axon_site" in p for p in sys.path)
                 or os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu")))


def pytest_configure(config):
    if not _needs_reexec():
        return
    # restore the real stdout/stderr fds before exec — pytest's global
    # fd-capture has already redirected fd 1/2 to temp files, and the
    # exec'd process would inherit those (all output silently lost)
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env["MASKBEV_TESTS_REEXEC"] = "1"  # guard against exec loops
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)
    os.execve(sys.executable, list(sys.orig_argv), env)


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
