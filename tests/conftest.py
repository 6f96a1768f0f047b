"""Test config: force an 8-device virtual CPU mesh (the TPU-world analog of
testing multi-node without a cluster — SURVEY.md §4). Must run before jax
imports anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins the real TPU ("axon")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
