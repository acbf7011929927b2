"""Cross-shard digest exchange + persistent sharded rs_index
(VERDICT round-1 items 4 and 7).

Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import bitmagic_tpu.constants as C
from bitmagic_tpu.parallel.mesh import make_mesh
from bitmagic_tpu.parallel.sharded import (
    ShardedBitVector, ShardedRSIndex, group_and_exchange, sharded_and_many,
    sharded_and_sub_count)

SIZE_BLOCKS = 16            # 2 blocks / shard on the 8-device mesh
SIZE = SIZE_BLOCKS * C.BITS_PER_BLOCK


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _sparse_vec(rng, mesh, blocks):
    """Vector whose content lives only in the given block ids."""
    ids = np.concatenate([
        rng.integers(b * C.BITS_PER_BLOCK, (b + 1) * C.BITS_PER_BLOCK, 500)
        for b in blocks])
    ids = np.unique(ids).astype(np.int64)
    return ShardedBitVector.from_indices(ids, SIZE, mesh), ids


def test_sharded_and_many_digest_narrowing(mesh):
    rng = np.random.default_rng(0)
    # overlap only in blocks {3, 11}; other blocks must be skipped
    a, ids_a = _sparse_vec(rng, mesh, [1, 3, 5, 11, 12])
    b, ids_b = _sparse_vec(rng, mesh, [0, 3, 7, 11])
    c, ids_c = _sparse_vec(rng, mesh, [3, 9, 11, 14])
    res = sharded_and_many([a, b, c])
    want = np.intersect1d(np.intersect1d(ids_a, ids_b), ids_c)
    got = np.asarray(res.to_bitvector().indices())
    np.testing.assert_array_equal(got, want)
    survivors, total = res.last_narrowing
    assert total == SIZE_BLOCKS
    assert survivors <= 2          # only blocks 3 and 11 can survive
    # against the non-narrowed path
    res2 = sharded_and_many([a, b, c], digest_narrowing=False)
    assert np.asarray(
        jnp.array_equal(res.pool, res2.pool)).item()


def test_sharded_and_many_survivor_at_row0(mesh):
    """Regression (round-2 VERDICT confirmed data-loss bug): when shards
    have RAGGED survivor counts, the padding slots alias local row 0; with
    a scatter-.set the padded zero update could clobber a genuine survivor
    at a shard's local row 0.  blocks {0, 2, 3} on the 8-device mesh put
    one survivor at shard 0 / row 0 with padding, two on shard 1."""
    ids = np.array([5, 131079, 196617], np.int64)          # blocks 0, 2, 3
    a = ShardedBitVector.from_indices(
        np.union1d(ids, [7 * C.BITS_PER_BLOCK + 11]), SIZE, mesh)
    b = ShardedBitVector.from_indices(
        np.union1d(ids, [9 * C.BITS_PER_BLOCK + 3]), SIZE, mesh)
    res = sharded_and_many([a, b])
    got = np.asarray(res.to_bitvector().indices())
    np.testing.assert_array_equal(got, ids)                # bit 5 must survive
    # randomized ragged-survivor sweep: narrowed == non-narrowed, always
    rng = np.random.default_rng(42)
    for _ in range(5):
        blocks_a = rng.choice(SIZE_BLOCKS, 6, replace=False)
        blocks_b = np.union1d(rng.choice(blocks_a, 3, replace=False),
                              rng.choice(SIZE_BLOCKS, 3, replace=False))
        va, _ = _sparse_vec(rng, mesh, blocks_a)
        vb, _ = _sparse_vec(rng, mesh, blocks_b)
        r1 = sharded_and_many([va, vb])
        r2 = sharded_and_many([va, vb], digest_narrowing=False)
        assert np.asarray(jnp.array_equal(r1.pool, r2.pool)).item()


def test_last_narrowing_always_set(mesh):
    """result.last_narrowing is part of the documented contract on every
    sharded_and_many path (round-2 ADVICE)."""
    rng = np.random.default_rng(6)
    a, _ = _sparse_vec(rng, mesh, [1, 4])
    b, _ = _sparse_vec(rng, mesh, [4, 8])
    nblk = a.pool.shape[0]
    assert sharded_and_many([a]).last_narrowing == (nblk, nblk)
    assert sharded_and_many(
        [a, b], digest_narrowing=False).last_narrowing == (nblk, nblk)
    surv, total = sharded_and_many([a, b]).last_narrowing
    assert total == nblk and surv <= 1
    assert (a & b).last_narrowing is None      # plain ops: no narrowing ran


def test_sharded_and_sub_count(mesh):
    rng = np.random.default_rng(1)
    a, ids_a = _sparse_vec(rng, mesh, [2, 6, 10])
    b, ids_b = _sparse_vec(rng, mesh, [2, 6, 13])
    s, ids_s = _sparse_vec(rng, mesh, [6])
    want = np.setdiff1d(np.intersect1d(ids_a, ids_b), ids_s).size
    got = sharded_and_sub_count([a, b], [s])
    assert got == want
    got2 = sharded_and_sub_count([a, b], [s], digest_narrowing=False)
    assert got2 == want


def test_group_and_exchange_traffic(mesh):
    """Vector-sharded group AND: digests ride the all-gather first; only
    survivor blocks are shipped (traffic proxy asserted)."""
    rng = np.random.default_rng(2)
    K, nblk = 8, SIZE_BLOCKS
    vmesh = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("v",))
    # all vectors share content ONLY in blocks 4 and 9
    stacks = []
    wants = None
    for k in range(K):
        blocks = [4, 9, (k % 6) + 10 if k % 2 else k]
        ids = np.unique(np.concatenate([
            rng.integers(b * C.BITS_PER_BLOCK, (b + 1) * C.BITS_PER_BLOCK,
                         800) for b in blocks])).astype(np.int64)
        from bitmagic_tpu import BitVector
        w = BitVector.from_indices(ids, SIZE).to_words()
        stacks.append(w)
        wants = ids if wants is None else np.intersect1d(wants, ids)
    stack = jax.device_put(np.stack(stacks),
                           NamedSharding(vmesh, P("v", None, None)))
    rows, surv, traffic = group_and_exchange(stack, vmesh, "v")
    shipped, total = traffic
    assert total == nblk
    assert shipped <= 2            # only blocks 4 and 9 can survive
    # result correctness: survivor rows hold the AND
    got = []
    rows_np = np.asarray(rows)
    for i, nb in enumerate(surv):
        bits = np.flatnonzero(np.unpackbits(
            rows_np[i].view(np.uint8), bitorder="little"))
        got.append(bits + int(nb) * C.BITS_PER_BLOCK)
    got = np.sort(np.concatenate(got)) if got else np.zeros(0, np.int64)
    np.testing.assert_array_equal(got, wants)
    # count-only mode
    cnt, _, traffic2 = group_and_exchange(stack, vmesh, "v",
                                          count_only=True)
    assert cnt == wants.size
    assert traffic2[0] <= 2


def test_sharded_rs_index(mesh):
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, SIZE, 30_000)).astype(np.int64)
    sbv = ShardedBitVector.from_indices(ids, SIZE, mesh)
    idx = sbv.build_rs_index()
    assert idx is sbv.build_rs_index()       # cached: built once
    assert idx.count() == ids.size
    ranks = np.concatenate([[1, ids.size],
                            rng.integers(1, ids.size, 500)])
    np.testing.assert_array_equal(idx.select_batch(ranks), ids[ranks - 1])
    # out of range
    assert idx.select(0) == -1
    assert idx.select(ids.size + 1) == -1
    # rank == searchsorted right
    qs = np.concatenate([ids[:200], ids[:200] + 1, [0, SIZE - 1]])
    want = np.searchsorted(ids, qs, side="right")
    np.testing.assert_array_equal(idx.rank_batch(qs), want)
    # cross-check vs the index-free scan
    for q in qs[:5]:
        assert idx.rank(int(q)) == sbv.rank_scan(int(q))
    # select_batch on the vector now routes through the index
    np.testing.assert_array_equal(
        sbv.select_batch(ranks[:10]), ids[ranks[:10] - 1])


def test_sharded_rs_index_repeated_queries_no_rebuild(mesh, monkeypatch):
    """After one build, queries must not recompute the wave prefix."""
    rng = np.random.default_rng(4)
    ids = np.unique(rng.integers(0, SIZE, 5_000)).astype(np.int64)
    sbv = ShardedBitVector.from_indices(ids, SIZE, mesh)
    sbv.build_rs_index()
    import bitmagic_tpu.parallel.sharded as sh
    monkeypatch.setattr(
        sh, "_gwc_prog",
        lambda *a: (_ for _ in ()).throw(
            AssertionError("index rebuilt per query")))
    for _ in range(3):
        r = int(rng.integers(1, ids.size))
        assert sbv.select_batch([r])[0] == ids[r - 1]


def test_reshard_and_checkpoint(mesh):
    rng = np.random.default_rng(5)
    ids = np.unique(rng.integers(0, SIZE, 8_000)).astype(np.int64)
    sbv = ShardedBitVector.from_indices(ids, SIZE, mesh)
    # repartition 8 -> 4 -> 8 shards
    m4 = make_mesh(4)
    r4 = sbv.reshard(m4)
    assert r4.count() == ids.size
    r8 = r4.reshard(mesh)
    assert np.asarray(jnp.array_equal(r8.pool, sbv.pool)).item()
    # checkpoint round-trip (compressed BLOB at rest)
    blob = sbv.checkpoint_bytes()
    back = ShardedBitVector.from_checkpoint(blob, mesh)
    assert back.count() == ids.size
    np.testing.assert_array_equal(
        np.asarray(back.to_bitvector().indices()), ids)
    assert len(blob) < ids.size * 3          # actually compressed
