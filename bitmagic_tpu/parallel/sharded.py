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


# the one-call fused select path carries GLOBAL ranks/positions as device
# int32 (TPU has no native int64); a pool holding this many bits or more
# must take the rs_index path (host-side int64 cross-shard combine)
_FUSED_SELECT_CAP = 2**31


def _host_fetch(x, dtype=None) -> np.ndarray:
    """np.asarray that also works when ``x`` spans non-addressable devices
    (multi-process meshes): falls back to a process allgather."""
    try:
        a = np.asarray(x)
    except RuntimeError:
        from jax.experimental import multihost_utils
        a = np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return a if dtype is None else a.astype(dtype, copy=False)


class ShardedBitVector:
    """Dense, mesh-sharded bit-vector covering [0, size)."""

    def __init__(self, pool, size: int, mesh):
        self.pool = pool          # uint32[n_blocks_padded, 2048], sharded
        self.size = int(size)
        self.mesh = mesh
        self._rs = None           # cached ShardedRSIndex
        # (survivors, total) blocks of the last digest-narrowed op that
        # produced this vector; None when no narrowing took place
        self.last_narrowing = None

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
        words = _host_fetch(self.pool)
        bv = BitVector.from_words(words, self.size)
        bv.optimize()
        return bv

    def reshard(self, mesh) -> "ShardedBitVector":
        """Repartition onto a different mesh (the block-shard all-to-all:
        XLA moves only the rows that change owner)."""
        n_shards = mesh.devices.size
        nblk = max(C.blocks_for_bits(self.size), 1)
        nblk_p = pad_rows(nblk, n_shards)
        pool = self.pool
        if nblk_p != pool.shape[0]:
            pool = jnp.concatenate([
                pool[:min(nblk_p, pool.shape[0])],
                jnp.zeros((max(nblk_p - pool.shape[0], 0),
                           C.SET_BLOCK_SIZE), jnp.uint32)], axis=0)
        pool = jax.device_put(pool, block_sharding(mesh))
        return ShardedBitVector(pool, self.size, mesh)

    # ------------------------------------------------------------------
    # checkpoint: compressed BLOB in, compressed BLOB out (the reference's
    # two-stage memory model, README "succinct in RAM <-> BLOB at rest")
    # ------------------------------------------------------------------
    def checkpoint_bytes(self, level: int = 6) -> bytes:
        """Serialize to a compressed BMT1 BLOB (succinct at rest)."""
        from ..serial.serializer import Serializer
        return Serializer(level).serialize(self.to_bitvector())

    @classmethod
    def from_checkpoint(cls, blob: bytes, mesh=None) -> "ShardedBitVector":
        from ..serial.serializer import Deserializer
        return cls.from_bitvector(Deserializer().deserialize(blob), mesh)

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
        per_block = _host_fetch(_block_counts_jit(self.pool))
        return int(per_block.astype(np.int64).sum())

    def count_shardmap(self) -> int:
        """Explicit-collective variant: local popcount partials (cached
        jitted program — CLAUDE.md: shard_map programs must be wrapped in
        jax.jit or every call re-traces)."""
        return int(_host_fetch(_count_prog(self.mesh)(self.pool),
                               np.int64).sum())

    def count_range(self, lo: int, hi: int) -> int:
        return blockops.count_range_pool(self.pool, lo, hi)

    def build_rs_index(self) -> "ShardedRSIndex":
        """Build (once) and cache the persistent sharded rank/select index
        (shard-local wave prefixes + replicated shard totals)."""
        if self._rs is None:
            self._rs = ShardedRSIndex(self)
        return self._rs

    def rank(self, i: int) -> int:
        """popcount[0, i] via the persistent index (one build, then O(1)
        per query — no pool scans)."""
        return self.build_rs_index().rank(i)

    def rank_scan(self, i: int) -> int:
        """Index-free rank: masked reduction over the whole pool (kept for
        cross-checking the index path)."""
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
        communication is O(n_shards + n_queries), never block data.
        Uses the persistent ShardedRSIndex when built (no per-call wave
        prefix recomputation).  Out-of-range ranks answer -1."""
        if self._rs is not None:
            return self._rs.select_batch(ranks)
        capacity = self.pool.shape[0] * C.BITS_PER_BLOCK
        if capacity >= _FUSED_SELECT_CAP:
            # the one-call fused path carries global ranks/positions as
            # device int32 (TPU has no native int64); past 2^31 bits that
            # wraps, so route through the rs_index path, which combines
            # everything cross-shard on host in int64
            return self.build_rs_index().select_batch(ranks)
        ranks64 = np.asarray(ranks, np.int64)
        # clip into int32 before the device sees them; clipped values stay
        # > total (capacity < 2^31 bounds total), so they resolve to -1
        ranks_a = jnp.asarray(
            np.clip(ranks64, -1, 2**31 - 1).astype(np.int32))
        prog = _select_fused_prog(self.mesh, self.mesh.devices.size)
        fetched = _host_fetch(prog(self.pool, ranks_a), np.int64)
        out, total = fetched[:-1], int(fetched[-1])
        out[(ranks64 < 1) | (ranks64 > total)] = -1
        return out

    def select(self, rank: int) -> int:
        return int(self.select_batch([rank])[0])

    def digests(self):
        """Per-block wave digests (the 8-byte/block exchange currency)."""
        return _digest_jit(self.pool)

    def get_bits(self, ids) -> np.ndarray:
        """Bit values at global positions ids, as a bool array.  One
        word-gather pass across the mesh: each shard gathers the
        containing word for its own queries and the answers combine with
        one psum — O(n_queries) communication, no rank machinery."""
        ids = np.asarray(ids, np.int64)
        if ids.size == 0:
            return np.zeros(0, bool)
        n_shards = self.mesh.devices.size
        span = (self.pool.shape[0] // n_shards) * C.BITS_PER_BLOCK
        # shard-LOCAL offsets ride the device as int32 (same bound the
        # rs_index asserts); enforce loudly instead of wrapping
        assert span < 2**31, \
            "per-shard span exceeds the int32 device bound; add shards"
        q = np.clip(ids, 0, self.pool.shape[0] * C.BITS_PER_BLOCK - 1)
        tgt = (q // span).astype(np.int32)
        rel = (q - tgt.astype(np.int64) * span).astype(np.int32)
        bits = _get_bits_prog(self.mesh)(
            self.pool, jnp.asarray(rel >> 5), jnp.asarray(rel & 31),
            jnp.asarray(tgt))
        out = _host_fetch(bits).astype(bool)
        out[(ids < 0) | (ids != q)] = False      # out-of-range reads 0
        return out


@jax.jit
def _block_counts_jit(pool):
    return blockops.block_counts(pool)


@jax.jit
def _digest_jit(pool):
    return blockops.calc_digest(pool)


# ---------------------------------------------------------------------------
# persistent sharded rank/select index (the rs_index at mesh scale,
# src/bmrs.h:28-40: shard-local wave prefixes built ONCE + a tiny replicated
# super-index of shard totals)
# ---------------------------------------------------------------------------
class ShardedRSIndex:
    """Rank/select acceleration over one ShardedBitVector snapshot.

    Build cost: one sharded pass computing each shard's inclusive wave
    popcount prefix (resident on its shard) + an n_shards-entry totals
    fetch.  Queries afterwards are O(batch): no per-call pool scans
    (reference rs_index super-block counts, src/bmrs.h:28-40)."""

    def __init__(self, sbv: "ShardedBitVector"):
        self.sbv = sbv
        self.mesh = sbv.mesh
        n_shards = self.mesh.devices.size
        self.n_shards = n_shards
        self.blocks_per_shard = sbv.pool.shape[0] // n_shards
        # shard-LOCAL positions/counts ride the device as int32 (per-pool
        # 2^31 bound, ops/select.py); everything CROSS-shard — cumulative
        # prefixes, query ranks, global positions — is combined on host in
        # int64 so a mesh holding >= 2^31 total set bits never wraps.
        self.shard_span = self.blocks_per_shard * C.BITS_PER_BLOCK
        # strict: a full shard's set-bit COUNT reaches shard_span, and the
        # int32 inclusive prefix must hold it (2**31 would wrap to -2**31)
        assert self.shard_span < 2**31, \
            "per-shard span exceeds the int32 device bound; add shards"
        # [n_shards, local_waves] inclusive prefix, sharded on axis 0
        self.gwc = _gwc_prog(self.mesh)(sbv.pool)
        totals = _host_fetch(self.gwc[:, -1], np.int64)
        self.shard_totals = totals
        self.cum = np.cumsum(totals)                 # int64, host only
        self.before = np.concatenate([[0], self.cum[:-1]])   # int64
        self.total = int(self.cum[-1]) if n_shards else 0

    def select_batch(self, ranks) -> np.ndarray:
        """Batched select1; -1 for out-of-range ranks."""
        ranks = np.asarray(ranks, np.int64)
        out = np.full(ranks.shape, -1, np.int64)
        ok = (ranks >= 1) & (ranks <= self.total)
        if not ok.any():
            return out
        rk = ranks[ok]
        # host int64: which shard answers each query + its local rank
        tgt = np.searchsorted(self.cum, rk, side="left").astype(np.int32)
        local_rank = (rk - self.before[tgt]).astype(np.int32)
        pos = _rs_select_prog(self.mesh, self.n_shards,
                              self.blocks_per_shard)(
            self.sbv.pool, self.gwc,
            jnp.asarray(local_rank), jnp.asarray(tgt))
        # global position re-assembled on host in int64
        out[ok] = (tgt.astype(np.int64) * self.shard_span
                   + _host_fetch(pos, np.int64))
        return out

    def select(self, rank: int) -> int:
        return int(self.select_batch([rank])[0])

    def rank_batch(self, ids) -> np.ndarray:
        """rank(i) = popcount[0, i] per query (count_to semantics)."""
        ids = np.asarray(ids, np.int64)
        out = np.zeros(ids.shape, np.int64)
        ok = ids >= 0
        if not ok.any():
            return out
        q = np.minimum(ids[ok],
                       self.sbv.pool.shape[0] * C.BITS_PER_BLOCK - 1)
        # host int64: containing shard + its full-shards-before prefix;
        # the device computes only the shard-LOCAL partial (int32-safe)
        tgt = (q // self.shard_span).astype(np.int32)
        rel = (q - tgt.astype(np.int64) * self.shard_span).astype(np.int32)
        r = _rs_rank_prog(self.mesh, self.n_shards, self.blocks_per_shard)(
            self.sbv.pool, self.gwc, jnp.asarray(rel), jnp.asarray(tgt))
        out[ok] = self.before[tgt] + _host_fetch(r, np.int64)
        return out

    def rank(self, i: int) -> int:
        return int(self.rank_batch([i])[0])

    def count(self) -> int:
        return self.total


@functools.lru_cache(maxsize=16)
def _count_prog(mesh):
    def _cnt(local):
        # u32 local partial (one shard holds < 2^32 set bits by HBM
        # bounds); per-shard partials combine on host in int64 —
        # a u32 psum would wrap past 2^32 total set bits
        c = jnp.sum(jax.lax.population_count(local), dtype=jnp.uint32)
        return c[None]

    return jax.jit(shard_map(
        _cnt, mesh=mesh,
        in_specs=P(BLOCK_AXIS, None), out_specs=P(BLOCK_AXIS)))


@functools.lru_cache(maxsize=16)
def _select_fused_prog(mesh, n_shards):
    from ..ops.select import global_wave_prefix, select_flat

    def _sel(local, rk):
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
        base = sid.astype(jnp.int32) * jnp.int32(
            local.shape[0] * C.BITS_PER_BLOCK)
        out = jnp.where(mine, base + pos, 0)
        # tack the global total onto the answers: ONE fetch on return
        out = jnp.concatenate([out, total[None]])
        return jax.lax.psum(out, BLOCK_AXIS)

    return jax.jit(shard_map(
        _sel, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P()), out_specs=P()))


@functools.lru_cache(maxsize=16)
def _gwc_prog(mesh):
    from ..ops.select import global_wave_prefix

    def _local(local):
        return global_wave_prefix(local)[None]

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=P(BLOCK_AXIS, None), out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=16)
def _rs_select_prog(mesh, n_shards, blocks_per_shard):
    from ..ops.select import select_flat

    def _sel(local, gwc_l, local_rank, tgt):
        # local_rank int32[q] (valid on shard tgt[q]); answers are
        # shard-LOCAL bit positions — the int64 global assembly is host-side
        gwc = gwc_l[0]
        total = gwc[-1]
        sid = jax.lax.axis_index(BLOCK_AXIS)
        mine = tgt == sid
        safe = jnp.clip(local_rank, 1, jnp.maximum(total, 1))
        pos = select_flat(local, gwc, safe)
        out = jnp.where(mine, pos, 0).astype(jnp.int32)
        return jax.lax.psum(out, BLOCK_AXIS)

    return jax.jit(shard_map(
        _sel, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None), P(), P()),
        out_specs=P()))


@functools.lru_cache(maxsize=16)
def _rs_rank_prog(mesh, n_shards, blocks_per_shard):
    def _rank(local, gwc_l, rel, tgt):
        # rel int32[q] = bit offset inside shard tgt[q]; only the
        # containing shard contributes its LOCAL partial (int32-safe;
        # the cross-shard prefix is added on host in int64)
        gwc = gwc_l[0]
        sid = jax.lax.axis_index(BLOCK_AXIS)
        # containing-shard partial: prefix of full waves + masked tail wave
        wave = rel >> 10
        prev = jnp.where(wave > 0, gwc[jnp.maximum(wave - 1, 0)], 0)
        flat = local.reshape(-1)                 # [bps * 2048] words
        widx = (wave * C.WAVE_WORDS)[:, None] + jnp.arange(
            C.WAVE_WORDS, dtype=jnp.int32)[None, :]
        words = jnp.take(flat, widx)             # [q, 32]
        bit_in_wave = rel & 1023
        wword = bit_in_wave >> 5
        wbit = (bit_in_wave & 31).astype(jnp.uint32)
        k = jnp.arange(C.WAVE_WORDS, dtype=jnp.int32)[None, :]
        full = k < wword[:, None]
        part = jnp.where(wbit == 31, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << (wbit + 1)) - 1)[:, None]
        mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                         jnp.where(k == wword[:, None], part, jnp.uint32(0)))
        partial = jnp.sum(
            jax.lax.population_count(words & mask).astype(jnp.int32),
            axis=1) + prev
        contrib = jnp.where(tgt == sid, partial, 0)
        return jax.lax.psum(contrib, BLOCK_AXIS)

    return jax.jit(shard_map(
        _rank, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None), P(), P()),
        out_specs=P()))


@functools.lru_cache(maxsize=16)
def _get_bits_prog(mesh):
    def _get(local, widx, wbit, tgt):
        # widx int32[q] = word index inside shard tgt[q]'s flat pool
        sid = jax.lax.axis_index(BLOCK_AXIS)
        words = jnp.take(local.reshape(-1), widx)
        bit = (words >> wbit.astype(jnp.uint32)) & jnp.uint32(1)
        contrib = jnp.where(tgt == sid, bit, jnp.uint32(0))
        return jax.lax.psum(contrib.astype(jnp.int32), BLOCK_AXIS)

    return jax.jit(shard_map(
        _get, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(), P(), P()),
        out_specs=P()))


# ---------------------------------------------------------------------------
# sharded aggregator with digest exchange (communication-avoiding AND)
# ---------------------------------------------------------------------------
@jax.jit
def _digest_packed(pool):
    """8-byte/block wave digest: 64 wave-nonzero flags packed into u32[n, 2]
    (the exchange currency; reference digest, src/bmfunc.h:1230)."""
    d = blockops.calc_digest(pool).astype(jnp.uint32)
    w = jnp.arange(32, dtype=jnp.uint32)
    lo = jnp.sum(d[:, :32] << w, axis=1, dtype=jnp.uint32)
    hi = jnp.sum(d[:, 32:] << w, axis=1, dtype=jnp.uint32)
    return jnp.stack([lo, hi], axis=1)


@jax.jit
def _alive_and(*pools):
    """Digest pre-pass: AND the per-vector block digests -> bool[nblk]."""
    acc = None
    for p in pools:
        d = _digest_packed(p)
        acc = d if acc is None else (acc & d)
    return jnp.any(acc != 0, axis=1)


def _survivor_slots(alive: np.ndarray, n_shards: int):
    """Per-shard survivor row lists padded to the max shard count.
    Returns (idx int32[n_shards, s_max], valid bool[n_shards, s_max])."""
    bps = alive.size // n_shards
    per = alive.reshape(n_shards, bps)
    counts = per.sum(axis=1)
    s_max = max(int(counts.max()), 1)
    idx = np.zeros((n_shards, s_max), np.int32)
    valid = np.zeros((n_shards, s_max), bool)
    for s in range(n_shards):
        rows = np.flatnonzero(per[s]).astype(np.int32)
        idx[s, : rows.size] = rows
        valid[s, : rows.size] = True
    return idx, valid


def sharded_and_many(vectors: list["ShardedBitVector"],
                     digest_narrowing: bool = True) -> "ShardedBitVector":
    """AND over a group of sharded vectors; the digest pre-pass mirrors the
    reference aggregator's digest narrowing (src/bmaggregator.h:1764): the
    8-byte/block digests are ANDed first, the survivor block list is decided
    on host, and the second phase gathers and ANDs ONLY surviving 8KB rows
    per shard (dead blocks are written as zeros without being read).
    ``result.last_narrowing`` reports (survivors, total) blocks."""
    assert vectors
    mesh = vectors[0].mesh
    pools = [v.pool for v in vectors]
    size = max(v.size for v in vectors)
    n_shards = mesh.devices.size

    if not digest_narrowing or len(vectors) < 2:
        @jax.jit
        def _and_all(*ps):
            acc = ps[0]
            for p in ps[1:]:
                acc = acc & p
            return acc
        sbv = ShardedBitVector(_and_all(*pools), size, mesh)
        nblk = pools[0].shape[0]
        sbv.last_narrowing = (nblk, nblk)      # nothing skipped
        return sbv

    alive = _host_fetch(_alive_and(*pools))       # tiny: 1 flag/block
    idx, valid = _survivor_slots(alive, n_shards)
    pool = _and_survivors_prog(mesh, len(pools))(
        jnp.asarray(idx), jnp.asarray(valid), *pools)
    sbv = ShardedBitVector(pool, size, mesh)
    sbv.last_narrowing = (int(alive.sum()), int(alive.size))
    return sbv


@functools.lru_cache(maxsize=64)
def _and_survivors_prog(mesh, k):
    def _local(idx_l, valid_l, *pools_l):
        rows = None
        for p in pools_l:
            r = jnp.take(p, idx_l[0], axis=0)
            rows = r if rows is None else (rows & r)
        rows = jnp.where(valid_l[0][:, None], rows, jnp.uint32(0))
        out = jnp.zeros_like(pools_l[0])
        # scatter-ADD, not set: padding slots alias local row 0, and with
        # .set the padded zero update can win over a genuine survivor at
        # row 0 (silent data loss).  Valid rows target unique indices and
        # padded rows are zeroed above, so accumulation is exact.
        return out.at[idx_l[0]].add(rows)

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None))
        + (P(BLOCK_AXIS, None),) * k,
        out_specs=P(BLOCK_AXIS, None)))


def sharded_and_sub_count(and_vs, sub_vs=(), digest_narrowing=True) -> int:
    """Global popcount of AND(and_vs) MINUS OR(sub_vs) with digest narrowing:
    only blocks whose AND-digest survives are read; per-shard partials
    combine on host in int64 — the aggregator's count mode at mesh scale."""
    assert and_vs
    mesh = and_vs[0].mesh
    n_shards = mesh.devices.size
    pools = [v.pool for v in and_vs]
    spools = [v.pool for v in sub_vs]
    if digest_narrowing:
        alive = _host_fetch(_alive_and(*pools))
        idx, valid = _survivor_slots(alive, n_shards)
    else:
        nblk = pools[0].shape[0]
        bps = nblk // n_shards
        idx = np.tile(np.arange(bps, dtype=np.int32), (n_shards, 1))
        valid = np.ones((n_shards, bps), bool)
    cnt = _and_sub_count_prog(mesh, len(pools), len(spools))(
        jnp.asarray(idx), jnp.asarray(valid), *pools, *spools)
    return int(_host_fetch(cnt, np.int64).sum())


@functools.lru_cache(maxsize=64)
def _and_sub_count_prog(mesh, ka, ks):
    def _local(idx_l, valid_l, *ps):
        acc = None
        for p in ps[:ka]:
            r = jnp.take(p, idx_l[0], axis=0)
            acc = r if acc is None else (acc & r)
        for p in ps[ka:]:
            acc = acc & ~jnp.take(p, idx_l[0], axis=0)
        acc = jnp.where(valid_l[0][:, None], acc, jnp.uint32(0))
        # per-shard u32 partial; host combines in int64 (a u32 psum would
        # wrap past 2^32 global hits — the scale a mesh exists for)
        c = jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)
        return c[None]

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None))
        + (P(BLOCK_AXIS, None),) * (ka + ks),
        out_specs=P(BLOCK_AXIS)))


# ---------------------------------------------------------------------------
# distributed vector GROUP: operands sharded over the mesh by VECTOR (each
# device owns whole vectors); the AND must cross devices.  This is where the
# digest exchange is a real communication saver (SURVEY.md §2.7): all-gather
# the 8-byte/block digests over ICI, AND-reduce, and then all-gather ONLY the
# surviving 8KB blocks instead of every block.
# ---------------------------------------------------------------------------
def group_and_exchange(stack, mesh, vec_axis: str = "v",
                       count_only: bool = False):
    """AND over a vector group sharded by vector.

    stack: uint32[K, nblk, 2048] sharded P(vec_axis, None, None) — each
    device holds K/n whole vectors.  Phase 1 reduces locally and exchanges
    digests (8 B/block) over ICI; phase 2 all-gathers only survivor rows.
    Returns (result_rows_or_count, survivor_block_ids, traffic) where
    traffic = (blocks_shipped, blocks_total) — the communication-avoidance
    proxy asserted by the scaling tests."""
    nblk = stack.shape[1]

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(vec_axis, None, None), out_specs=P(None),
                       check_vma=False)
    def _phase1(local_stack):
        acc = local_stack[0]
        for i in range(1, local_stack.shape[0]):
            acc = acc & local_stack[i]
        d = _digest_packed(acc)                     # u32[nblk, 2] local
        alld = jax.lax.all_gather(d, vec_axis)      # [n, nblk, 2] over ICI
        combined = alld[0]
        for i in range(1, alld.shape[0]):
            combined = combined & alld[i]
        return jnp.any(combined != 0, axis=1)[None]  # replicated bool[nblk]

    alive = _host_fetch(_phase1(stack))[0]
    surv = np.flatnonzero(alive).astype(np.int32)
    n_surv = max(int(surv.size), 1)
    surv_pad = np.zeros(n_surv, np.int32)
    surv_pad[: surv.size] = surv

    def _phase2_body(local_stack, surv_idx):
        acc = local_stack[0]
        for i in range(1, local_stack.shape[0]):
            acc = acc & local_stack[i]
        mine = jnp.take(acc, surv_idx, axis=0)       # [S, 2048] local
        allr = jax.lax.all_gather(mine, vec_axis)    # ship ONLY survivors
        out = allr[0]
        for i in range(1, allr.shape[0]):
            out = out & allr[i]
        if count_only:
            # per-survivor-row int32 counts (<= 65536 each); the total is
            # summed on host in int64 so huge results never wrap a u32
            return jnp.sum(jax.lax.population_count(out).astype(jnp.int32),
                           axis=1)
        return out

    _phase2 = jax.jit(shard_map(
        _phase2_body, mesh=mesh,
        in_specs=(P(vec_axis, None, None), P(None)), out_specs=P(None),
        check_vma=False))
    res = _phase2(stack, jnp.asarray(surv_pad))
    if count_only:
        res = int(_host_fetch(res, np.int64).sum()) if surv.size else 0
    traffic = (int(surv.size), int(nblk))
    return res, surv, traffic


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
    the block axis, selectors int32[V, S] replicated -> int32[n_shards, V]
    PER-SHARD hit counts.  Per shard the VMEM-batch Pallas sweep runs on the
    local block columns; the tiny partials all-gather over ICI and the
    caller combines them on host in int64 (``pipeline_counts_host``) — a
    device int32 psum would wrap past 2^31 global hits, exactly the scale a
    mesh is for (the scanner pipeline at mesh scale — scan-throughput
    scaling with a whole query batch per pass)."""
    from ..ops.pallas_kernels import pipeline_counts

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, BLOCK_AXIS, None), P(None, None)),
        out_specs=P(BLOCK_AXIS, None),
        check_vma=False)   # pallas_call out_shapes carry no vma annotation
    def counts(local_planes, sels):
        c = pipeline_counts(local_planes, sels).astype(jnp.int32)
        return c[None]

    return counts


def pipeline_counts_host(mesh, planes, sels) -> np.ndarray:
    """Run the sharded pipeline and combine the per-shard partials on host:
    int64[V] global hit counts (never wraps)."""
    parts = _host_fetch(pipeline_counts_program(mesh)(planes, sels),
                        np.int64)
    return parts.sum(axis=0)


def scan_throughput_program(mesh, n_planes: int, n_blocks_per_shard: int):
    """Build the jitted sharded scan used by the scaling benchmark: a
    bit-sliced equality scan (AND-SUB over n_planes sharded planes) plus the
    global hit count (psum) — BASELINE 'scan-throughput scaling 1->N'."""
    n_shards = mesh.devices.size
    nblk = n_blocks_per_shard * n_shards
    sharding = block_sharding(mesh)

    @functools.partial(jax.jit, out_shardings=None)
    def scan(planes, value_bits):
        # planes: uint32[n_planes, nblk, 2048] sharded on axis 1.
        # u32 hit count is fine HERE (benchmark program, hits << 2^32);
        # production queries go through ShardedSparseVector, whose count
        # paths combine per-shard partials on host in int64.
        acc = jnp.full((nblk, C.SET_BLOCK_SIZE), 0xFFFFFFFF, jnp.uint32)
        for s in range(n_planes):
            bit = (value_bits >> s) & 1
            acc = jnp.where(bit, acc & planes[s], acc & ~planes[s])
        return jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)

    return scan, sharding
