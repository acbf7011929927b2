"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the "SIMD build matrix" of the
reference, tests/stress/build_all.sh, becomes {jnp-on-CPU, interpret-Pallas,
compiled 1-chip}; multi-chip sharding is validated on the virtual mesh).
"""
import os

# Must be set before jax initializes any backend.  Force-override: the
# driver environment pins JAX_PLATFORMS=axon (the real TPU tunnel), but the
# test suite must run on the local virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

# The jaxtyping pytest plugin imports jax before this conftest runs, so jax
# has already captured JAX_PLATFORMS=axon from the driver env; override via
# the config API (the backend itself is still uninitialized at this point).
import jax
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(12345)

# Persistent compilation cache: the suite compiles many small shape-specialized
# programs; caching them across runs cuts wall time drastically.
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/bitmagic_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
