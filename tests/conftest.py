"""Test harness: run everything on an 8-device virtual CPU mesh.

Must set flags before jax initializes; tests exercising multi-chip sharding
use the 8 virtual devices, everything else runs single-device CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon TPU is wired
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook may have force-registered a TPU backend before this
# file ran; the config update (unlike the env var) wins at backend-resolution
# time, so tests always run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
