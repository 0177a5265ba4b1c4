"""Test configuration.

Tests force the CPU backend with an 8-device virtual mesh so unit tests and
sharding tests are fast and run anywhere; the environment's sitecustomize
pre-registers a remote TPU ('axon') backend, so the platform must be forced
via jax.config *before* any backend is materialized. The driver exercises
the real TPU separately (bench.py, __graft_entry__.py).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())


# Root cause of the r3/r4 multi-file crash (interpreter-level fatal
# error ~30 min into a monolithic `pytest tests/` run, observed in
# test_polarization at 33%): every compiled XLA executable of every
# test file accumulated in ONE CPU client until an allocation failed
# inside native code. Fix: drop all jit caches (compiled executables +
# tracing caches) at each test-FILE boundary — each file recompiles its
# own kernels from scratch, bounding the client's live-executable set to
# one file's worth. run_suite.sh remains as a belt-and-braces runner for
# CI-style isolation, but plain `pytest tests/` is supported again.
_last_test_file = [None]


def pytest_runtest_setup(item):
    f = item.location[0]
    if _last_test_file[0] is not None and f != _last_test_file[0]:
        jax.clear_caches()
        import gc
        gc.collect()
    _last_test_file[0] = f


@pytest.fixture
def rng():
    return np.random.default_rng(42)
