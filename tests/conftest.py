"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding code
paths compile and execute without TPU hardware.  Must set the env vars
before jax is imported anywhere.
"""

import os

# Force CPU even under the axon sitecustomize, which pins the TPU
# backend regardless of JAX_PLATFORMS.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
