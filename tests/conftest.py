"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the "SIMD build matrix" of the
reference, tests/stress/build_all.sh, becomes {jnp-on-CPU, interpret-Pallas,
compiled 1-chip}; multi-chip sharding is validated on the virtual mesh).
"""
import os

# Must be set before jax initializes any backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
