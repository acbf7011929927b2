"""Mesh-sharding tests on the virtual 8-device CPU mesh (the multi-chip
validation path; real multi-chip runs use identical code over ICI)."""
import numpy as np
import pytest

import jax

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.parallel import (ShardedBitVector, make_mesh,
                                   scan_throughput_program, sharded_and_many,
                                   sharded_and_sub, TaskBatch, run_task_batch,
                                   build_optimize_plan,
                                   build_sv_serialization_plan)
from bitmagic_tpu.utils.golden import random_indices

SIZE = 16 * BITS_PER_BLOCK          # 16 blocks over 8 devices


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    return make_mesh(8)


def test_roundtrip_and_count(rng, mesh):
    idx = random_indices(rng, SIZE, 0.01)
    bv = BitVector.from_indices(idx, SIZE)
    sh = ShardedBitVector.from_bitvector(bv, mesh)
    assert sh.count() == idx.size
    assert sh.count_shardmap() == idx.size
    back = sh.to_bitvector()
    np.testing.assert_array_equal(back.indices(), idx)


def test_sharded_ops(rng, mesh):
    ia = random_indices(rng, SIZE, 0.02)
    ib = random_indices(rng, SIZE, 0.02)
    a = ShardedBitVector.from_indices(ia, SIZE, mesh)
    b = ShardedBitVector.from_indices(ib, SIZE, mesh)
    am = np.zeros(SIZE, bool); am[ia] = True
    bm_ = np.zeros(SIZE, bool); bm_[ib] = True
    assert (a & b).count() == (am & bm_).sum()
    assert (a | b).count() == (am | bm_).sum()
    assert (a ^ b).count() == (am ^ bm_).sum()
    assert (a - b).count() == (am & ~bm_).sum()


def test_sharded_rank_range(rng, mesh):
    idx = random_indices(rng, SIZE, 0.01)
    sh = ShardedBitVector.from_indices(idx, SIZE, mesh)
    g = np.zeros(SIZE, bool); g[idx] = True
    cum = np.cumsum(g)
    for i in rng.integers(0, SIZE, 10):
        assert sh.rank(int(i)) == cum[int(i)]
    lo, hi = SIZE // 3, 2 * SIZE // 3
    assert sh.count_range(lo, hi) == g[lo:hi + 1].sum()


def test_sharded_aggregator(rng, mesh):
    idxs = [random_indices(rng, SIZE, 0.6) for _ in range(5)]
    vs = [ShardedBitVector.from_indices(i, SIZE, mesh) for i in idxs]
    want = np.ones(SIZE, bool)
    for i in idxs:
        m = np.zeros(SIZE, bool); m[i] = True
        want &= m
    assert sharded_and_many(vs).count() == want.sum()
    sub = ShardedBitVector.from_indices(idxs[0][:100], SIZE, mesh)
    w2 = want.copy(); w2[idxs[0][:100]] = False
    assert sharded_and_sub(vs, [sub]).count() == w2.sum()


def test_scan_throughput_program(rng, mesh):
    n_planes, nb_per_shard = 8, 2
    scan, sharding = scan_throughput_program(mesh, n_planes, nb_per_shard)
    nblk = nb_per_shard * 8
    vals = rng.integers(0, 2**n_planes, nblk * BITS_PER_BLOCK).astype(np.uint32)
    planes = np.zeros((n_planes, nblk, 2048), np.uint32)
    for s in range(n_planes):
        bits = ((vals >> s) & 1).astype(np.uint8)
        planes[s] = np.packbits(bits, bitorder="little").view(
            np.uint32).reshape(nblk, 2048)
    planes_dev = jax.device_put(planes, None)
    target = 42
    got = int(scan(planes_dev, np.uint32(target)))
    assert got == int((vals == target).sum())


def test_task_batch_plans(rng):
    from bitmagic_tpu.sv import SparseVector
    vals = rng.integers(0, 1000, 5000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    run_task_batch(build_optimize_plan(sv), n_threads=4)
    np.testing.assert_array_equal(sv.to_numpy(), vals)
    blobs = run_task_batch(build_sv_serialization_plan(sv), n_threads=4)
    assert len(blobs) == sum(1 for p in sv.planes if p is not None and p.any())
    b = TaskBatch().add(lambda: 1).add(lambda: 2)
    assert run_task_batch(b) == [1, 2]


def test_sharded_select_matches_host():
    """Sharded select1: shard-prefix exclusive scan + local wave descent
    must agree with the single-vector select across shard boundaries."""
    rng = np.random.default_rng(21)
    size = 8 * BITS_PER_BLOCK * 3          # 3 blocks per shard on 8 devices
    ids = np.unique(rng.integers(0, size, 40_000)).astype(np.int64)
    bv = BitVector.from_indices(ids, size)
    sbv = ShardedBitVector.from_bitvector(bv)
    n = len(ids)
    ranks = np.unique(np.concatenate([
        [1, n],                                  # extremes
        rng.integers(1, n + 1, 500),
    ])).astype(np.int64)
    got = sbv.select_batch(ranks)
    want = ids[ranks - 1]
    np.testing.assert_array_equal(got, want)
    assert sbv.select(1) == ids[0]


def test_sharded_select_out_of_range_and_big_pool_path():
    """Out-of-range ranks answer -1 on BOTH select paths, and a pool past
    the device-int32 capacity bound must route through the rs_index path
    (host int64 cross-shard combine) — the fused one-call program carries
    global ranks/positions as device int32 and would wrap there."""
    from bitmagic_tpu.parallel import sharded as sh_mod
    rng = np.random.default_rng(31)
    size = 8 * BITS_PER_BLOCK * 2
    ids = np.unique(rng.integers(0, size, 9_000)).astype(np.int64)
    n = len(ids)
    ranks = np.asarray([0, -5, 1, n, n + 1, 2**40], np.int64)
    want = np.asarray([-1, -1, ids[0], ids[-1], -1, -1], np.int64)

    # fused path (no index built)
    sbv = ShardedBitVector.from_indices(ids, size)
    np.testing.assert_array_equal(sbv.select_batch(ranks), want)

    # indexed path has identical semantics
    sbv2 = ShardedBitVector.from_indices(ids, size)
    sbv2.build_rs_index()
    np.testing.assert_array_equal(sbv2.select_batch(ranks), want)

    # capacity guard: shrink the bound so THIS pool counts as "big" and
    # verify the delegation produces the same answers (and builds the index)
    sbv3 = ShardedBitVector.from_indices(ids, size)
    old = sh_mod._FUSED_SELECT_CAP
    sh_mod._FUSED_SELECT_CAP = 1
    try:
        np.testing.assert_array_equal(sbv3.select_batch(ranks), want)
        assert sbv3._rs is not None      # went through build_rs_index()
    finally:
        sh_mod._FUSED_SELECT_CAP = old


def test_sharded_pipeline_counts(mesh):
    import jax.numpy as jnp
    from bitmagic_tpu.parallel.sharded import pipeline_counts_program
    rng = np.random.default_rng(3)
    S, nblk = 6, 16                       # 16 blocks over 8 shards
    planes_np = rng.integers(0, 1 << 32, (S, nblk, 2048),
                             dtype=np.uint64).astype(np.uint32)
    sels_np = rng.integers(-1, 2, (24, S)).astype(np.int32)
    # every request needs >= 1 AND operand (kernel contract)
    sels_np[:, 0] = 1
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bitmagic_tpu.parallel.mesh import BLOCK_AXIS
    counts = pipeline_counts_program(mesh)
    planes = jax.device_put(
        planes_np, NamedSharding(mesh, P(None, BLOCK_AXIS, None)))
    parts = np.asarray(counts(planes, jnp.asarray(sels_np)))
    assert parts.shape[0] == 8            # per-shard partials
    got = parts.astype(np.int64).sum(axis=0)
    # golden: dense AND-SUB per request
    want = []
    for sel in sels_np:
        acc = np.full((nblk, 2048), 0xFFFFFFFF, np.uint32)
        for s in range(S):
            if sel[s] == 1:
                acc &= planes_np[s]
            elif sel[s] == -1:
                acc &= ~planes_np[s]
        want.append(int(np.unpackbits(acc.view(np.uint8)).sum()))
    assert got.tolist() == want
