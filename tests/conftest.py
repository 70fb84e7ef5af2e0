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
# Persistent compilation cache: repeated jit instances of the same program
# (each train_net call builds a fresh step) compile once per HLO, and the
# suite reuses compilations across runs. NOTE: the JAX_COMPILATION_CACHE_DIR
# env var is ignored by this jax version — config.update is authoritative.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)
