"""Mesh-sharded vectors + collectives (the scale-out story; SURVEY §2.7).
Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
for a virtual mesh, or on a real multi-chip slice unchanged."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
if _os.environ.get("BMTPU_PLATFORM"):        # e.g. BMTPU_PLATFORM=cpu
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["BMTPU_PLATFORM"])
import numpy as np
import jax
import bitmagic_tpu as bm
from bitmagic_tpu.parallel import ShardedBitVector, make_mesh, sharded_and_many

mesh = make_mesh()
print("mesh:", mesh)
rng = np.random.default_rng(4)
SIZE = 16 * 65536 * max(len(jax.devices()), 1)
vs = [ShardedBitVector.from_indices(
    np.unique(rng.integers(0, SIZE, SIZE // 4)), SIZE, mesh) for _ in range(4)]
inter = sharded_and_many(vs)
print("sharded AND count (psum):", inter.count_shardmap())
print("rank(1/2 size):", inter.rank(SIZE // 2))
