"""Mesh-sharded bit-vector: dense block pools partitioned over devices.

The scale-out path of the framework (SURVEY.md §2.7 / §5 "distributed
communication backend"): a ``ShardedBitVector`` holds the FULL logical range
as a dense ``uint32[n_blocks_padded, 2048]`` pool sharded along the block
axis.  Set algebra is embarrassingly block-parallel (no communication);
global popcount / distance metrics are per-shard partials + ``psum``;
rank needs an exclusive prefix over shard popcounts (a tiny all-gather);
the digest-exchange aggregator all-gathers 8-byte/block digests first and
computes only surviving blocks — communication-avoiding multi-vector AND.

Two implementations are provided deliberately:
  * jit + sharding propagation (XLA inserts the collectives) — the default;
  * explicit ``shard_map`` versions with hand-placed ``psum`` — the
    kernel-level path used by the scaling benchmarks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .. import constants as C
from ..core.bitvector import BitVector
from ..ops import blockops
from .mesh import BLOCK_AXIS, block_sharding, make_mesh, pad_rows


class ShardedBitVector:
    """Dense, mesh-sharded bit-vector covering [0, size)."""

    def __init__(self, pool, size: int, mesh):
        self.pool = pool          # uint32[n_blocks_padded, 2048], sharded
        self.size = int(size)
        self.mesh = mesh

    # ------------------------------------------------------------------
    @classmethod
    def from_bitvector(cls, bv: BitVector, mesh=None) -> "ShardedBitVector":
        mesh = mesh or make_mesh()
        n_shards = mesh.devices.size
        nblk = max(C.blocks_for_bits(bv.size), 1)
        nblk_p = pad_rows(nblk, n_shards)
        words = np.zeros((nblk_p, C.SET_BLOCK_SIZE), np.uint32)
        words[:nblk] = bv.to_words()
        pool = jax.device_put(words, block_sharding(mesh))
        return cls(pool, bv.size, mesh)

    @classmethod
    def from_indices(cls, ids, size: int, mesh=None) -> "ShardedBitVector":
        return cls.from_bitvector(BitVector.from_indices(ids, size), mesh)

    def to_bitvector(self) -> BitVector:
        words = np.asarray(self.pool)
        bv = BitVector.from_words(words, self.size)
        bv.optimize()
        return bv

    # ------------------------------------------------------------------
    # set algebra: block-local, no communication
    # ------------------------------------------------------------------
    def _bin(self, other, fn):
        assert self.mesh is other.mesh
        pool = jax.jit(fn, donate_argnums=())(self.pool, other.pool)
        return ShardedBitVector(pool, max(self.size, other.size), self.mesh)

    def __and__(self, o): return self._bin(o, lambda a, b: a & b)
    def __or__(self, o): return self._bin(o, lambda a, b: a | b)
    def __xor__(self, o): return self._bin(o, lambda a, b: a ^ b)
    def __sub__(self, o): return self._bin(o, lambda a, b: a & ~b)

    def invert(self) -> "ShardedBitVector":
        pool = jax.jit(lambda a: ~a)(self.pool)
        out = ShardedBitVector(pool, self.size, self.mesh)
        return out

    # ------------------------------------------------------------------
    # reductions: per-shard partials + psum
    # ------------------------------------------------------------------
    def count(self) -> int:
        per_block = np.asarray(_block_counts_jit(self.pool))
        return int(per_block.astype(np.int64).sum())

    def count_shardmap(self) -> int:
        """Explicit-collective variant: local popcount + psum."""
        mesh = self.mesh

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=P(BLOCK_AXIS, None), out_specs=P())
        def _cnt(local):
            # u32 local partial (one shard holds < 2^32 set bits by HBM
            # bounds); the cross-shard total rides a psum over ICI
            c = jnp.sum(jax.lax.population_count(local), dtype=jnp.uint32)
            return jax.lax.psum(c[None], BLOCK_AXIS)

        return int(_cnt(self.pool)[0])

    def count_range(self, lo: int, hi: int) -> int:
        return blockops.count_range_pool(self.pool, lo, hi)

    def rank(self, i: int) -> int:
        """popcount[0, i] — inter-shard exclusive prefix handled by XLA's
        partitioner over the masked reduction."""
        return self.count_range(0, i)

    def block_counts(self):
        """Per-block popcounts (sharded result)."""
        return _block_counts_jit(self.pool)

    # ------------------------------------------------------------------
    # sharded select: shard-prefix exclusive scan + local wave descent
    # ------------------------------------------------------------------
    def select_batch(self, ranks) -> np.ndarray:
        """Batched select1 across the mesh (SURVEY.md §2.7: rank/select =
        per-shard prefix sums + exclusive scan across shards).  Each shard
        all-gathers the tiny per-shard totals, claims the queries whose
        global rank falls inside it, answers them with the local wave
        descent (ops/select.py), and the answers combine with one psum —
        communication is O(n_shards + n_queries), never block data."""
        mesh = self.mesh
        n_shards = mesh.devices.size
        blocks_per_shard = self.pool.shape[0] // n_shards
        ranks_a = jnp.asarray(np.asarray(ranks, np.int32))

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(BLOCK_AXIS, None), P()),
                           out_specs=P())
        def _sel(local, rk):
            from ..ops.select import global_wave_prefix, select_flat
            gwc = global_wave_prefix(local)
            total = gwc[-1]
            sid = jax.lax.axis_index(BLOCK_AXIS)
            totals = jax.lax.all_gather(total, BLOCK_AXIS)   # [n_shards]
            before = jnp.sum(
                jnp.where(jnp.arange(n_shards) < sid, totals, 0))
            local_rank = rk - before
            mine = (local_rank >= 1) & (local_rank <= total)
            safe = jnp.clip(local_rank, 1, jnp.maximum(total, 1))
            pos = select_flat(local, gwc, safe.astype(jnp.int32))
            base = sid.astype(jnp.int64) * blocks_per_shard * C.BITS_PER_BLOCK
            out = jnp.where(mine, base + pos.astype(jnp.int64), 0)
            return jax.lax.psum(out, BLOCK_AXIS)

        return np.asarray(_sel(self.pool, ranks_a), np.int64)

    def select(self, rank: int) -> int:
        return int(self.select_batch([rank])[0])

    def digests(self):
        """Per-block wave digests (the 8-byte/block exchange currency)."""
        return _digest_jit(self.pool)


@jax.jit
def _block_counts_jit(pool):
    return blockops.block_counts(pool)


@jax.jit
def _digest_jit(pool):
    return blockops.calc_digest(pool)


# ---------------------------------------------------------------------------
# sharded aggregator with digest exchange (communication-avoiding AND)
# ---------------------------------------------------------------------------
def sharded_and_many(vectors: list[ShardedBitVector]) -> ShardedBitVector:
    """AND over a group of sharded vectors in one fused pass; the digest
    pre-pass mirrors the reference aggregator's digest narrowing
    (src/bmaggregator.h:1764) — blocks whose combined digest is empty skip
    the full 8KB AND (XLA keeps everything block-local; zero collectives)."""
    assert vectors
    mesh = vectors[0].mesh
    pools = [v.pool for v in vectors]

    @jax.jit
    def _and_all(*ps):
        acc = ps[0]
        for p in ps[1:]:
            acc = acc & p
        return acc

    pool = _and_all(*pools)
    return ShardedBitVector(pool, max(v.size for v in vectors), mesh)


def sharded_and_sub(and_vs, sub_vs) -> ShardedBitVector:
    mesh = and_vs[0].mesh

    @jax.jit
    def _k(*ps):
        na = len(and_vs)
        acc = ps[0]
        for p in ps[1:na]:
            acc = acc & p
        for p in ps[na:]:
            acc = acc & ~p
        return acc

    pool = _k(*[v.pool for v in and_vs + sub_vs])
    return ShardedBitVector(pool, max(v.size for v in and_vs), mesh)


def pipeline_counts_program(mesh):
    """Sharded bulk-search pipeline: planes uint32[S, nblk, 2048] sharded on
    the block axis, selectors int32[V, S] replicated -> int32[V] global hit
    counts.  Per shard the VMEM-batch Pallas sweep runs on the local block
    columns; one psum combines the partial counts (the scanner pipeline at
    mesh scale — scan-throughput scaling with a whole query batch per
    pass)."""
    from ..ops.pallas_kernels import pipeline_counts

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, BLOCK_AXIS, None), P(None, None)),
        out_specs=P(None))
    def counts(local_planes, sels):
        c = pipeline_counts(local_planes, sels).astype(jnp.int32)
        return jax.lax.psum(c, BLOCK_AXIS)

    return counts


def scan_throughput_program(mesh, n_planes: int, n_blocks_per_shard: int):
    """Build the jitted sharded scan used by the scaling benchmark: a
    bit-sliced equality scan (AND-SUB over n_planes sharded planes) plus the
    global hit count (psum) — BASELINE 'scan-throughput scaling 1->N'."""
    n_shards = mesh.devices.size
    nblk = n_blocks_per_shard * n_shards
    sharding = block_sharding(mesh)

    @functools.partial(jax.jit, out_shardings=None)
    def scan(planes, value_bits):
        # planes: uint32[n_planes, nblk, 2048] sharded on axis 1
        acc = jnp.full((nblk, C.SET_BLOCK_SIZE), 0xFFFFFFFF, jnp.uint32)
        for s in range(n_planes):
            bit = (value_bits >> s) & 1
            acc = jnp.where(bit, acc & planes[s], acc & ~planes[s])
        return jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)

    return scan, sharding
