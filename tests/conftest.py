"""Test config: force an 8-device virtual CPU mesh (the TPU-world analog of
testing multi-node without a cluster — SURVEY.md §4). Must run before jax
imports anywhere."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: test time is dominated by XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The session environment may register an "axon" remote-TPU backend through
# sitecustomize and pin jax_platforms to it; the env var JAX_PLATFORMS is
# ignored at that point. Overriding the *config* before any backend
# initialization restores the genuine 8-device virtual CPU mesh the suite is
# designed for. Set ONESTOP_TESTS_ON_TPU=1 to run against the real chip.
if os.environ.get("ONESTOP_TESTS_ON_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Function-scoped, seeded per test: every test gets a deterministic
    stream independent of which other tests ran before it (a session-scoped
    shared stream made results depend on execution order — VERDICT r1)."""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))
