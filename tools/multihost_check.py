"""Multi-HOST (multi-process) scaling validation.

The virtual-mesh checks (tools/scaling_check.py) validate sharding inside
one process; this harness validates the CROSS-HOST path: N separate
processes, each owning 4 local CPU devices, joined through
jax.distributed into one global mesh.  Collectives cross process
boundaries over Gloo/TCP — the DCN analog available in this environment
(real multi-host TPU is not reachable; see BASELINE.md).  The programs
under test are the library's own: the sharded scan, the bulk-search
pipeline, and the global popcount reduction.

Run:  python tools/multihost_check.py [n_processes]
"""
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
PORT = 9917


def worker(pid: int, n_proc: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=n_proc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    sys.path.insert(0, os.path.join(HERE, ".."))
    from bitmagic_tpu.parallel.mesh import BLOCK_AXIS
    from bitmagic_tpu.parallel.sharded import (pipeline_counts_host,
                                               scan_throughput_program)

    n_global = jax.device_count()
    n_local = jax.local_device_count()
    mesh = Mesh(np.asarray(jax.devices()), (BLOCK_AXIS,))
    n_planes, blocks_per_dev = 16, 2
    nblk = blocks_per_dev * n_global

    # identical seed everywhere: every process KNOWS the global content, so
    # each can verify the collective results independently
    rng = np.random.default_rng(7)
    planes_global = rng.integers(0, 2**32, (n_planes, nblk, 2048),
                                 dtype=np.uint64).astype(np.uint32)
    lo = pid * n_local * blocks_per_dev
    hi = lo + n_local * blocks_per_dev
    planes = multihost_utils.host_local_array_to_global_array(
        planes_global[:, lo:hi], mesh, P(None, BLOCK_AXIS, None))

    # 1. global popcount (psum over ICI+DCN)
    total = jax.jit(lambda p: jnp.sum(jax.lax.population_count(p[0]),
                                      dtype=jnp.int64), out_shardings=None)(
        planes)
    want = int(np.unpackbits(planes_global[0].view(np.uint8)).sum())
    assert int(total) == want, (int(total), want)

    # 2. sharded scan (fused AND-SUB + global count)
    scan, _ = scan_throughput_program(mesh, n_planes, blocks_per_dev)
    t0 = time.perf_counter()
    hits = scan(planes, jnp.uint32(123))
    hits.block_until_ready()
    dt = time.perf_counter() - t0

    # 3. bulk-search pipeline (per-shard sweep; host int64 combine)
    sels = np.zeros((8, n_planes), np.int32)
    sels[:, 0] = 1
    sels[:, 1] = [-1, 0, 1, -1, 0, 1, -1, 0]
    counts = pipeline_counts_host(mesh, planes, jnp.asarray(sels))
    acc = planes_global[0].copy()
    acc &= ~planes_global[1]
    want0 = int(np.unpackbits(acc.view(np.uint8)).sum())
    assert int(counts[0]) == want0, (int(counts[0]), want0)

    # 4. BLOB broadcast + partition/merge over the process network (DCN
    #    analog): compressed bytes travel, never dense bitmaps
    from bitmagic_tpu import BitVector
    from bitmagic_tpu.parallel.blobcast import (all_gather_blobs,
                                                broadcast_bitvector,
                                                merge_broadcast_parts)
    from bitmagic_tpu.serial.serializer import Serializer
    size = 4_000_000
    root_ids = np.unique(rng.integers(0, size, 3000)).astype(np.int64)
    root_bv = BitVector.from_indices(root_ids, size) if pid == 0 else None
    got = broadcast_bitvector(root_bv)
    assert np.array_equal(got.indices(), root_ids), "blob broadcast"
    # partition-then-merge: each process owns a disjoint range
    span = size // n_proc
    my_ids = np.unique(rng.integers(pid * span, (pid + 1) * span,
                                    1000)).astype(np.int64)
    my_blob = Serializer(6).serialize(BitVector.from_indices(my_ids, size))
    merged = merge_broadcast_parts(all_gather_blobs(my_blob))
    assert merged.count() > 0 and merged.test(int(my_ids[0]))

    # 5. sharded succinct-vector CONTAINER across process boundaries:
    #    find_eq digest narrowing + pipeline, each process independently
    #    verifying the global result
    from bitmagic_tpu.parallel.sharded_sv import ShardedSparseVector
    vals = rng.integers(0, 4096, nblk * 65536 // 8).astype(np.uint32)
    vals[3] = 9999
    ssv = ShardedSparseVector.from_array(vals, mesh)
    qv = int(vals[55])
    assert ssv.find_eq_count(qv) == int((vals == qv).sum())
    hits = ssv.find_eq(9999)
    surv, tot = hits.last_narrowing
    assert surv <= 1 and hits.count() == 1, (surv, tot)
    pc = ssv.pipeline_find_eq([qv, 9999])
    assert pc == [int((vals == qv).sum()), 1], pc

    # 6. the REST of the sharded container family cross-host: signed
    #    ordered search, string scanner with remap, float magnitude
    #    descent, RSC rank decompression — every _host_fetch here crosses
    #    process boundaries through the allgather fallback
    ivals = rng.integers(-5000, 5000, 40_000).astype(np.int64)
    ivals[7] = np.iinfo(np.int64).min
    issv = ShardedSparseVector.from_array(ivals, mesh)
    want_gt = int((ivals > -17).sum())
    got_gt = issv.find_gt(-17).count()
    assert got_gt == want_gt, (got_gt, want_gt)
    assert issv.find_le(np.iinfo(np.int64).min).count() == 1

    from bitmagic_tpu.parallel.sharded_sv import (ShardedFloatVector,
                                                  ShardedRSCVector,
                                                  ShardedStrSparseVector)
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
    from bitmagic_tpu.sv.sparse_vector import SparseVector
    from bitmagic_tpu.sv.str_vector import StrSparseVector

    fvals = np.round(rng.normal(0, 100, 20_000), 1).astype(np.float32)
    fvals[11] = 777.5
    sfv = ShardedFloatVector.from_float_vector(
        FloatSparseVector.from_array(fvals), mesh)
    assert sfv.find_eq(777.5).count() == int((fvals == np.float32(777.5)).sum())
    want_fgt = int((fvals > 50.0).sum())
    assert sfv.find_gt(50.0).count() == want_fgt

    strs = [f"k{int(x):04d}" for x in rng.integers(0, 2000, 15_000)]
    strs[5] = "needle"
    sv_str = StrSparseVector.from_strings(strs, max_str_size=8)
    sv_str.remap()
    sss = ShardedStrSparseVector.from_str_vector(sv_str, mesh)
    assert sss.find_eq_str("needle").count() == 1
    assert sss.find_eq_str_count(strs[100]) == strs.count(strs[100])

    rvals = rng.integers(0, 1000, 30_000).astype(np.uint32)
    rnull = rng.random(30_000) < 0.7
    rsc = RSCSparseVector.from_sparse_vector(
        SparseVector.from_array(rvals, nullable=True, null_mask=rnull))
    srsc = ShardedRSCVector.from_rsc(rsc, mesh)
    qr = int(rvals[~rnull][0]) if (~rnull).any() else 0
    want_r = int(((~rnull) & (rvals == qr)).sum())
    assert srsc.find_eq(qr).count() == want_r, (qr, want_r)

    if pid == 0:
        print(f"multihost OK: {n_proc} processes x {n_local} devices = "
              f"{n_global} global; popcount/psum, scan ({dt * 1e3:.1f} ms), "
              f"8-query pipeline, BLOB broadcast + partition/merge, "
              f"sharded int/signed/float/str/RSC container scans all "
              f"verified cross-host", flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return 0
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(n)], env=env) for i in range(n)]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
