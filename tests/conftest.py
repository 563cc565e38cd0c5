"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code
paths (jax.sharding.Mesh / shard_map) execute without TPU hardware.
Must set env before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the container's sitecustomize force-registers the axon TPU backend;
# jax.config wins over the env var it sets
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
