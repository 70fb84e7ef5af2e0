"""Test harness: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin in this image ignores the env var if set after process
# start; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)
