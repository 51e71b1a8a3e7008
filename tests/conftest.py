"""Test configuration: run everything on a faked 8-device CPU mesh.

SURVEY.md §4: `xla_force_host_platform_device_count=8` is the TPU-world
equivalent of a mock distributed backend — multi-chip sharding tests run on any
box. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize force-registers the TPU plugin with
# jax_platforms="axon,cpu", overriding the env var — override it back so the
# test suite runs hermetically on the faked 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
