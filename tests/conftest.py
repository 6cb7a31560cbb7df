"""Test config: force an 8-device virtual CPU mesh before any backend use.

The environment's sitecustomize registers the experimental 'axon' TPU
platform and overrides `jax_platforms` at import time, so plain
JAX_PLATFORMS=cpu is not enough — we must update jax.config after import.
Multi-chip sharding is validated on virtual CPU devices per the driver's
contract; real-TPU runs happen in bench.py, not the unit suite.
"""

import os

TPU_MODE = bool(os.environ.get("BMH_TEST_TPU"))

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
