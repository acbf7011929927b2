"""Multi-chip scaling validation on the virtual device mesh.

Real multi-chip hardware is not reachable from this environment (one v5e
via the axon tunnel), so this harness validates the SCALING STRUCTURE —
that the sharded scan/count/select programs compile and execute with the
intended collectives at every mesh size — on a virtual CPU mesh, and
reports indicative weak-scaling timings (CPU arithmetic, NOT TPU rates).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/scaling_check.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
# force the virtual CPU mesh BEFORE any backend query (sitecustomize
# preloads jax, so env vars alone never work here — see CLAUDE.md)
try:
    from jax._src import xla_bridge as _xb
    _backend_up = bool(getattr(_xb, "_backends", None))
except Exception:
    _backend_up = False
if not _backend_up:
    xf = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xf:
        os.environ["XLA_FLAGS"] = (
            xf + " --xla_force_host_platform_device_count=8")
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from bitmagic_tpu.parallel.mesh import BLOCK_AXIS  # noqa: E402
from bitmagic_tpu.parallel.sharded import (ShardedBitVector,  # noqa: E402
                                           pipeline_counts_program,
                                           scan_throughput_program)


def main():
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={len(devs)}")
    rng = np.random.default_rng(0)
    blocks_per_shard = 8
    n_planes = 32

    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = Mesh(np.asarray(devs[:n]), (BLOCK_AXIS,))
        scan, sharding = scan_throughput_program(mesh, n_planes,
                                                 blocks_per_shard)
        nblk = blocks_per_shard * n
        planes_h = rng.integers(0, 2**32, (n_planes, nblk, 2048),
                                dtype=np.uint64).astype(np.uint32)
        from jax.sharding import NamedSharding, PartitionSpec as P
        planes = jax.device_put(
            planes_h, NamedSharding(mesh, P(None, BLOCK_AXIS, None)))
        hits = scan(planes, jnp.uint32(123))
        jax.block_until_ready(hits)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(scan(planes, jnp.uint32(124)))
        dt = (time.perf_counter() - t0) / 3
        elems = nblk * 2048 * 32

        # sharded count + select on the same mesh size
        ids = np.unique(rng.integers(0, nblk * 65536, 20_000))
        sbv = ShardedBitVector.from_indices(ids.astype(np.int64),
                                            nblk * 65536, mesh)
        assert sbv.count() == len(ids)
        assert sbv.count_shardmap() == len(ids)
        sel = sbv.select_batch([1, len(ids)])
        assert sel[0] == ids[0] and sel[1] == ids[-1]

        # sharded bulk-search pipeline (per-shard sweep + psum)
        sels = np.zeros((16, n_planes), np.int32)
        sels[:, 0] = 1
        sels[:, 1:4] = rng.integers(-1, 2, (16, 3))
        prog = pipeline_counts_program(mesh)
        jax.block_until_ready(prog(planes, jnp.asarray(sels)))   # compile
        t0 = time.perf_counter()
        jax.block_until_ready(prog(planes, jnp.asarray(sels)))
        dtp = time.perf_counter() - t0

        # succinct-vector scan through the CONTAINER API
        # (parallel/sharded_sv.py), pinned to numpy ground truth
        from bitmagic_tpu.parallel.sharded_sv import ShardedSparseVector
        vals = rng.integers(0, 1 << 16, nblk * 65536 // 8).astype(np.uint32)
        ssv = ShardedSparseVector.from_array(vals, mesh)
        q = int(vals[42])
        assert ssv.find_eq_count(q) == int((vals == q).sum())
        assert ssv.find_gt(1 << 15).count() == int((vals > (1 << 15)).sum())
        batch = [int(v) for v in vals[:8]]
        ssv.pipeline_find_eq(batch)                  # compile
        t0 = time.perf_counter()
        got = ssv.pipeline_find_eq(batch)
        dts = time.perf_counter() - t0
        assert got == [int((vals == b).sum()) for b in batch]

        print(f"mesh={n}: scan {elems/1e6:.0f}M elems in {dt*1e3:.1f} ms "
              f"(weak scaling), 16-query pipeline {dtp*1e3:.1f} ms, "
              f"sharded-SV container 8-query pipeline {dts*1e3:.1f} ms, "
              f"count/psum + shard-prefix select OK")


if __name__ == "__main__":
    main()
