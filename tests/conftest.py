"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths (DP, table sharding, collectives) are exercised on
8 simulated host devices so CI needs no TPU. Must run before jax initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms programmatically, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
