"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates real multi-chip via __graft_entry__)."""

import os

# must happen before jax is imported anywhere
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize pins jax_platforms="axon,cpu"; force CPU for tests
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file {name}.npz not generated")
    return np.load(path)
