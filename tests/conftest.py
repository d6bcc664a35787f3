"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware; the driver's
dryrun separately compiles the multi-device path.  Must set flags before
importing jax anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize may register an "axon" TPU backend and
# force jax_platforms to it at interpreter start; re-force CPU before any
# backend is initialized so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
