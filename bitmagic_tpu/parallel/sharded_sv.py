"""Mesh-sharded bit-sliced succinct vector: the scanner workload at scale.

The reference scanner (``bm::sparse_vector_scanner``,
/root/reference/src/bmsparsevec_algo.h:612) searches bit-sliced vectors in
compressed form on one node.  This container is its mesh-scale form
(SURVEY.md §2.7 "sharding rules per container"): ALL value slices of a
``SparseVector`` live in ONE stacked device pool
``uint32[K, n_blocks_padded, 2048]`` sharded along the block axis — every
plane shares the same block sharding, so slice algebra (find_eq AND-SUB,
ordered slice descent) is entirely shard-local; only per-query counts and
gathered scalars ride ICI (``psum``).

Layout (rows of the stack):
  * rows ``0 .. n_eff-1``  — value slices (absent slices are zero rows,
    which make slice algebra degrade *correctly*: AND with an absent slice
    empties the result, AND-NOT is a no-op);
  * row ``n_eff`` (``UNI``) — the universe: the NULL plane when nullable
    (bit set = value assigned), else the dense ``[0, size)`` range.

Searches mirror the single-chip scanner exactly:
  * ``find_eq``: digest pre-pass (8 B/block, reference
    src/bmaggregator.h:1764) decides the survivor block list, then ONE
    shard-local gather-AND-SUB pass touches only surviving 8 KB rows;
  * ``find_gt/ge/lt/le/range``: MSB-first slice descent, one fused
    shard-local program per query (find_gt_horizontal,
    src/bmsparsevec_algo.h:1144), with the signed split via the s2u
    encoding (sign = slice 0);
  * ``pipeline_find_eq``: whole value batches through the sharded
    VMEM-batch pipeline (pipeline_counts_program) — one sweep per batch
    per shard; the tiny per-shard partials combine on host in int64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import constants as C
from ..ops import blockops
from .mesh import BLOCK_AXIS, make_mesh, pad_rows
from .sharded import (ShardedBitVector, _digest_packed, _host_fetch,
                      _survivor_slots)

_I64 = np.int64


def _plane_words(bv, nblk: int) -> np.ndarray:
    """Dense word image of blocks [0, nblk) of one plane BitVector
    (planes span ID_MAX48, so BitVector.to_words() is unusable here)."""
    words = np.zeros((nblk, C.SET_BLOCK_SIZE), np.uint32)
    if bv is None:
        return words
    bv._flush()
    st = bv._struct
    if st.has_runs:
        # run-covered FULL spans (e.g. a plane coalesced by optimize())
        # are not in st.nb — span-fill them; clipped to nblk so the fill
        # is bounded by the dense image being built anyway
        from ..core.blocks import runs_clip
        for s, e in runs_clip(st.runs, 0, nblk):
            words[int(s):int(e)] = 0xFFFFFFFF
    keep = st.nb < nblk
    fm = keep & (st.cls == C.CLS_FULL)
    words[st.nb[fm]] = 0xFFFFFFFF
    bm = keep & (st.cls == C.CLS_BIT)
    if bm.any():
        rows = bv._pool_host()
        sel = (st.cls == C.CLS_BIT)
        words[st.nb[bm]] = rows[keep[sel]]
    if bv._gaps is not None:
        gm = keep & (st.cls == C.CLS_GAP)
        if gm.any():
            dense = bv._gaps.to_dense()
            sel = (st.cls == C.CLS_GAP)
            words[st.nb[gm]] = dense[keep[sel]]
    return words


def _fill_universe_row(host, row, size):
    """Dense [0, size) universe plane written into host[row] (the non-
    nullable case: every position is assigned)."""
    if not size:
        return
    full, rem = divmod(size, C.BITS_PER_BLOCK)
    host[row, :full] = 0xFFFFFFFF
    if rem:
        tail = np.zeros(C.SET_BLOCK_SIZE, np.uint32)
        fw, rb = divmod(rem, 32)
        tail[:fw] = 0xFFFFFFFF
        if rb:
            tail[fw] = (1 << rb) - 1
        host[row, full] = tail


class _SelectorSearchBase:
    """Shared digest-narrowing search flow for stacked-plane containers.

    Subclasses provide ``stack`` (uint32[K, nblk_p, 2048] block-sharded),
    ``mesh``, ``size`` and ``_selector(key) -> int32[K] | None`` (1=AND,
    -1=AND-NOT per plane; None = key cannot occur).  The flow mirrors the
    single-chip scanner: digest pre-pass (8 B/block) -> survivor-only
    gather-AND-SUB pass; pipelines push whole key batches through one
    sweep per shard, partials combined on host in int64."""

    @property
    def K(self) -> int:
        return int(self.stack.shape[0])

    @property
    def n_blocks(self) -> int:
        return int(self.stack.shape[1])

    def _empty_result(self) -> ShardedBitVector:
        pool = _zeros_row_prog()(self.stack)
        out = ShardedBitVector(pool, self.size, self.mesh)
        out.last_narrowing = (0, self.n_blocks)
        return out

    def _search(self, key) -> ShardedBitVector:
        return self._search_sel(self._selector(key))

    def _search_sel(self, sel) -> ShardedBitVector:
        """Digest-narrowed survivor AND-SUB for a prepared selector."""
        if sel is None:
            return self._empty_result()
        sel_j = jnp.asarray(sel)
        alive = _host_fetch(_sel_alive_prog(self.mesh, self.K)(
            sel_j, self.stack)).reshape(-1)
        idx, valid = _survivor_slots(alive, self.mesh.devices.size)
        pool = _sel_survivors_prog(self.mesh, self.K)(
            sel_j, jnp.asarray(idx), jnp.asarray(valid), self.stack)
        out = ShardedBitVector(pool, self.size, self.mesh)
        out.last_narrowing = (int(alive.sum()), int(alive.size))
        return out

    def _search_count(self, key) -> int:
        sel = self._selector(key)
        if sel is None:
            return 0
        sel_j = jnp.asarray(sel)
        alive = _host_fetch(_sel_alive_prog(self.mesh, self.K)(
            sel_j, self.stack)).reshape(-1)
        if not alive.any():
            return 0
        idx, valid = _survivor_slots(alive, self.mesh.devices.size)
        cnt = _sel_count_prog(self.mesh, self.K)(
            sel_j, jnp.asarray(idx), jnp.asarray(valid), self.stack)
        return int(_host_fetch(cnt, np.int64).sum())

    def _search_ne(self, key) -> ShardedBitVector:
        """Universe minus the eq hits (scanner find_ne)."""
        eq = self._search(key)
        return ShardedBitVector(
            _sub_from_uni_prog(self.mesh, self.K, self.UNI)(
                eq.pool, self.stack), self.size, self.mesh)

    def _pipeline(self, keys) -> list:
        from .sharded import pipeline_counts_host
        sels = np.zeros((len(keys), self.K), np.int32)
        known_zero = []
        for i, k in enumerate(keys):
            sel = self._selector(k)
            if sel is None:
                known_zero.append(i)
            else:
                sels[i] = sel
        counts = pipeline_counts_host(self.mesh, self.stack,
                                      jnp.asarray(sels))
        out = [int(c) for c in counts]
        for i in known_zero:
            out[i] = 0
        return out


class ShardedSparseVector(_SelectorSearchBase):
    """Block-axis-sharded bit-sliced integer vector with scanner searches."""

    def __init__(self, stack, size: int, mesh, dtype, signed: bool,
                 n_slices: int, n_eff: int, nullable: bool):
        self.stack = stack            # uint32[K, nblk_p, 2048] sharded
        self.size = int(size)
        self.mesh = mesh
        self.dtype = np.dtype(dtype)
        self.signed = bool(signed)
        self.n_slices = int(n_slices)   # logical slice count (incl. sign)
        self.n_eff = int(n_eff)         # stack rows holding value slices
        self.nullable = bool(nullable)

    # row index of the universe plane
    @property
    def UNI(self) -> int:
        return self.n_eff

    # ------------------------------------------------------------------
    @classmethod
    def from_sparse_vector(cls, sv, mesh=None) -> "ShardedSparseVector":
        from ..sv.sparse_vector import SparseVector  # noqa: F401 (type)
        mesh = mesh or make_mesh()
        sv._flush()
        n_shards = mesh.devices.size
        size = sv._size
        nblk = max(C.blocks_for_bits(max(size, 1)), 1)
        nblk_p = pad_rows(nblk, n_shards)
        n_eff = max(sv.effective_slices(), 1)
        host = np.zeros((n_eff + 1, nblk_p, C.SET_BLOCK_SIZE), np.uint32)
        for s in range(n_eff):
            host[s, :nblk] = _plane_words(sv.planes[s], nblk)
        if sv.nullable:
            host[n_eff, :nblk] = _plane_words(sv.null_plane, nblk)
        else:
            _fill_universe_row(host, n_eff, size)
        stack = jax.device_put(
            host, NamedSharding(mesh, P(None, BLOCK_AXIS, None)))
        return cls(stack, size, mesh, sv.dtype, sv.signed, sv.n_slices,
                   n_eff, sv.nullable)

    @classmethod
    def from_array(cls, values, mesh=None, dtype=None, nullable=False,
                   null_mask=None) -> "ShardedSparseVector":
        from ..sv.sparse_vector import SparseVector
        sv = SparseVector.from_array(values, dtype=dtype, nullable=nullable,
                                     null_mask=null_mask)
        return cls.from_sparse_vector(sv, mesh)

    def to_sparse_vector(self):
        """Collect into a single-host SparseVector (planes optimized)."""
        from ..sv.sparse_vector import SparseVector
        from ..core.bitvector import BitVector
        host = _host_fetch(self.stack)
        sv = SparseVector(self.dtype, nullable=self.nullable)
        for s in range(self.n_eff):
            if host[s].any():
                bv = BitVector.from_words(host[s], C.ID_MAX48)
                bv.optimize()
                sv.planes[s] = bv
        if self.nullable:
            bv = BitVector.from_words(host[self.UNI], C.ID_MAX48)
            bv.optimize()
            sv.null_plane = bv
        sv._size = self.size
        return sv

    # checkpoint: compressed BMSV blob (succinct at rest)
    def checkpoint_bytes(self, level: int = 6) -> bytes:
        from ..serial.sv_serial import sparse_vector_serialize
        return sparse_vector_serialize(self.to_sparse_vector(), level)

    @classmethod
    def from_checkpoint(cls, blob: bytes, mesh=None) -> "ShardedSparseVector":
        from ..serial.sv_serial import sparse_vector_deserialize
        return cls.from_sparse_vector(sparse_vector_deserialize(blob), mesh)

    # ------------------------------------------------------------------
    # selector construction (scanner find_eq decomposition,
    # src/bmsparsevec_algo.h:776: 1-bits -> AND group, 0-bits -> SUB group)
    # ------------------------------------------------------------------
    def _s2u_one(self, value) -> int:
        from ..sv.sparse_vector import SparseVector
        sv = SparseVector.__new__(SparseVector)
        sv.signed = self.signed
        sv.dtype = self.dtype
        return int(np.asarray(SparseVector.s2u(
            sv, np.asarray([value], self.dtype)))[0])

    def _selector(self, value):
        """int32[K] selector (1=AND, -1=AND-NOT per slice; UNI always AND),
        or None when the value cannot occur (bit above every stored slice).
        Value 0 maps to AND(UNI) - OR(all slices): the same program."""
        from ..sv.sparse_vector import value_fits
        if not value_fits(value, self.dtype):
            return None                    # unrepresentable: never matches
        u = self._s2u_one(value)
        if u >> self.n_eff:            # a required bit has no stored slice
            return None
        sel = np.full(self.K, -1, np.int32)
        for s in range(self.n_eff):
            if (u >> s) & 1:
                sel[s] = 1
        sel[self.UNI] = 1
        return sel

    # ------------------------------------------------------------------
    # find_eq with the sharded digest pre-pass (_SelectorSearchBase flow)
    # ------------------------------------------------------------------
    def find_eq(self, value) -> ShardedBitVector:
        """All positions holding ``value``, as a sharded hit vector.
        Digest narrowing first (only blocks whose AND-digest survives are
        read), then one shard-local gather-AND-SUB pass."""
        return self._search(value)

    def find_eq_count(self, value) -> int:
        """Global hit count: survivor-only popcount per shard, partials
        combined on host in int64."""
        return self._search_count(value)

    def find_ne(self, value) -> ShardedBitVector:
        """Assigned positions holding anything but ``value``
        (scanner find_ne, src/bmsparsevec_algo.h)."""
        return self._search_ne(value)

    def find_zero(self) -> ShardedBitVector:
        """Assigned positions holding 0 (scanner find_zero)."""
        return self._search(0)

    def find_nonzero(self) -> ShardedBitVector:
        """OR of all value slices (scanner find_nonzero semantics,
        reference src/bmsparsevec_algo.h:1082 — NOT null-masked)."""
        return self._wrap(_or_rows_prog(self.mesh, self.n_eff)(self.stack))

    # ------------------------------------------------------------------
    # ordered searches: fused MSB-first slice descent (shard-local)
    # ------------------------------------------------------------------
    def _descent(self, universe_mode: int, vbits: np.ndarray, lo_row: int,
                 n_bits: int):
        """(gt, eq) pools relative to the universe.  universe_mode selects
        the descent universe IN-program: 0=UNI, 1=UNI&~sign, 2=UNI&sign."""
        prog = _descent_prog(self.mesh, self.K, lo_row, n_bits, self.UNI,
                             universe_mode)
        return prog(jnp.asarray(vbits, np.int32), self.stack)

    def _vbits(self, u: int, lo_bit: int, n_bits: int) -> np.ndarray:
        return np.asarray([(u >> (lo_bit + s)) & 1 for s in range(n_bits)],
                          np.int32)

    def find_gt(self, value) -> ShardedBitVector:
        """Positions with element > value (find_gt_horizontal,
        src/bmsparsevec_algo.h:1144) — one fused descent program.

        The descent only sees the n_eff stored slices, so queries whose
        magnitude exceeds every storable value resolve symbolically here
        (descent on truncated bits would answer for value mod 2**n_eff)."""
        if not self.signed:
            u = int(value)
            if u < 0:
                return self._universe_vector()
            if u >= (1 << self.n_eff) - 1:
                return self._empty_result()   # no stored value can exceed u
            gt, _ = self._descent(0, self._vbits(u, 0, self.n_eff), 0,
                                  self.n_eff)
            return self._wrap(gt)
        value = int(value)
        n_mag = max(self.n_eff - 1, 0)
        max_mag = (1 << n_mag) - 1      # largest storable magnitude field
        if value >= 0:
            if value >= max_mag:
                return self._empty_result()
            # universe = non-negatives (UNI & ~sign-slice)
            gt, _ = self._descent(1, self._vbits(value, 0, n_mag), 1, n_mag)
            return self._wrap(gt)
        # negatives store |x|-1 in the magnitude slices (reference s2u):
        # x > value  <=>  stored (-x-1) < (-value-1)
        magq = -value - 1
        if magq > max_mag:
            # every stored negative has (-x-1) <= max_mag < magq -> all
            return self._universe_vector()
        gt, eq = self._descent(2, self._vbits(magq, 0, n_mag), 1, n_mag)
        # negatives with stored magnitude < magq, plus every non-negative
        pool = _lt_mag_plus_pos_prog(self.mesh, self.K, self.UNI)(
            gt, eq, self.stack)
        return self._wrap(pool)

    def find_ge(self, value) -> ShardedBitVector:
        if not self.signed:
            u = int(value)
            if u <= 0:
                return self._universe_vector()
            if u > (1 << self.n_eff) - 1:
                return self._empty_result()
            gt, eq = self._descent(0, self._vbits(u, 0, self.n_eff), 0,
                                   self.n_eff)
            return self._wrap(_or_pools(gt, eq))
        return self.find_gt(int(value) - 1)

    def find_lt(self, value) -> ShardedBitVector:
        ge = self.find_ge(value)
        return self._wrap(_sub_from_uni_prog(self.mesh, self.K, self.UNI)(
            ge.pool, self.stack))

    def find_le(self, value) -> ShardedBitVector:
        gt = self.find_gt(value)
        return self._wrap(_sub_from_uni_prog(self.mesh, self.K, self.UNI)(
            gt.pool, self.stack))

    def find_range(self, lo, hi) -> ShardedBitVector:
        ge = self.find_ge(lo)
        le = self.find_le(hi)
        return self._wrap(_and_pools(ge.pool, le.pool))

    def _wrap(self, pool) -> ShardedBitVector:
        return ShardedBitVector(pool, self.size, self.mesh)

    def _universe_vector(self) -> ShardedBitVector:
        pool = _stack_row_prog(self.UNI)(self.stack)
        return self._wrap(pool)

    # ------------------------------------------------------------------
    # pipeline: a whole value batch in one sweep per shard
    # ------------------------------------------------------------------
    def pipeline_find_eq(self, values) -> list:
        """Hit counts for a value batch through the sharded VMEM-batch
        pipeline (scanner pipeline src/bmsparsevec_algo.h:653 at mesh
        scale)."""
        return self._pipeline(values)

    # ------------------------------------------------------------------
    # gather / decode at mesh scale: each shard answers the queries whose
    # block it owns; assembled halves combine with one psum
    # ------------------------------------------------------------------
    def gather(self, ids) -> np.ndarray:
        ids = np.asarray(ids, _I64)
        if ids.size == 0:
            return np.zeros(0, self.dtype)
        if (ids < 0).any() or (ids >= max(self.size, 1)).any():
            raise IndexError("gather index out of range")
        blk = (ids >> C.SET_BLOCK_SHIFT).astype(np.int32)
        word_idx = ((ids & C.SET_BLOCK_MASK) >> 5).astype(np.int32)
        bit_in = (ids & 31).astype(np.uint32)
        lo, hi, nn = _gather_prog(self.mesh, self.K, self.n_eff, self.UNI)(
            jnp.asarray(blk), jnp.asarray(word_idx), jnp.asarray(bit_in),
            self.stack)
        u = (_host_fetch(hi).astype(np.uint64) << np.uint64(32)) \
            | _host_fetch(lo).astype(np.uint64)
        from ..sv.sparse_vector import SparseVector
        sv = SparseVector.__new__(SparseVector)
        sv.signed = self.signed
        sv.dtype = self.dtype
        vals = SparseVector.u2s(sv, u)
        if self.nullable:
            vals = np.where(_host_fetch(nn) == 0,
                            np.asarray(0, self.dtype), vals)
        return np.asarray(vals, self.dtype)

    def decode(self, lo: int, n: int) -> np.ndarray:
        return self.gather(np.arange(lo, lo + n, dtype=_I64))

    def get(self, i):
        return self.gather(np.asarray([i]))[0]

    __getitem__ = get

    def __len__(self):
        return self.size

    def __repr__(self):
        return (f"ShardedSparseVector(dtype={self.dtype}, size={self.size}, "
                f"slices={self.n_eff}, mesh={self.mesh.devices.size} shards)")


class ShardedRSCVector:
    """Mesh-sharded rank-select-compressed vector
    (``bm::rsc_sparse_vector``, reference src/bmsparsevec_compr.h at
    mesh scale): the dense payload is a block-sharded
    ``ShardedSparseVector`` over compressed slots, NULL membership is a
    block-sharded ``ShardedBitVector`` with a persistent
    ``ShardedRSIndex`` — searches run in the compressed domain and
    rank-decompress through the sharded index (the scanner's RSC front,
    src/bmsparsevec_algo.h find_eq over rsc)."""

    def __init__(self, dense, null_sbv, rs, size, mesh):
        self.dense = dense            # ShardedSparseVector (compressed)
        self.null_sbv = null_sbv      # ShardedBitVector (logical domain)
        self.rs = rs                  # ShardedRSIndex over null_sbv
        self.size = int(size)
        self.mesh = mesh

    # ------------------------------------------------------------------
    @classmethod
    def from_rsc(cls, rsc, mesh=None) -> "ShardedRSCVector":
        mesh = mesh or make_mesh()
        rsc._flush()
        dense = ShardedSparseVector.from_sparse_vector(rsc.dense, mesh)
        ids = np.asarray(rsc.null_bv.indices())
        ids = ids[ids < max(rsc._size, 1)]
        null_sbv = ShardedBitVector.from_indices(
            ids, max(rsc._size, 1), mesh)
        rs = null_sbv.build_rs_index()
        return cls(dense, null_sbv, rs, rsc._size, mesh)

    @classmethod
    def from_sparse_vector(cls, sv, mesh=None) -> "ShardedRSCVector":
        from ..sv.rsc_vector import RSCSparseVector
        return cls.from_rsc(RSCSparseVector.from_sparse_vector(sv), mesh)

    def to_rsc(self):
        """Collect into a single-host RSCSparseVector."""
        from ..sv.rsc_vector import RSCSparseVector
        out = RSCSparseVector(self.dense.dtype)
        out.dense = self.dense.to_sparse_vector()
        out.dense.nullable = False
        out.dense.null_plane = None
        # RSC null_bv lives in the ID_MAX48 address space by convention
        from ..core.bitvector import BitVector
        wide = BitVector(C.ID_MAX48)
        ids = np.asarray(self.null_sbv.to_bitvector().indices())
        if ids.size:
            wide.set_many(ids)
        out.null_bv = wide
        out._size = self.size
        out._rs = None
        return out

    def checkpoint_bytes(self) -> bytes:
        from ..serial.sv_serial import SparseVectorSerializer
        return SparseVectorSerializer().serialize_rsc(self.to_rsc())

    @classmethod
    def from_checkpoint(cls, blob: bytes, mesh=None) -> "ShardedRSCVector":
        from ..serial.sv_serial import SparseVectorDeserializer
        return cls.from_rsc(SparseVectorDeserializer().deserialize(blob),
                            mesh)

    # ------------------------------------------------------------------
    def count(self) -> int:
        """Assigned (non-NULL) element count."""
        return int(self.rs.count())

    def __len__(self):
        return self.size

    def _decompress(self, hits) -> ShardedBitVector:
        """Compressed-domain hit vector -> logical positions through the
        sharded rank-select index (reference rank decompression)."""
        pos = np.asarray(hits.to_bitvector().indices())
        if pos.size == 0:
            return ShardedBitVector.from_indices(
                np.zeros(0, _I64), max(self.size, 1), self.mesh)
        logical = self.rs.select_batch(np.asarray(pos + 1, _I64))
        out = ShardedBitVector.from_indices(
            np.asarray(logical, _I64), max(self.size, 1), self.mesh)
        out.last_narrowing = getattr(hits, "last_narrowing", None)
        return out

    def find_eq(self, value) -> ShardedBitVector:
        """Logical positions holding ``value`` (search runs shard-local in
        the compressed domain, then one sharded select pass)."""
        return self._decompress(self.dense.find_eq(value))

    def find_eq_count(self, value) -> int:
        return self.dense.find_eq_count(value)

    def find_gt(self, value) -> ShardedBitVector:
        return self._decompress(self.dense.find_gt(value))

    def find_ge(self, value) -> ShardedBitVector:
        return self._decompress(self.dense.find_ge(value))

    def find_lt(self, value) -> ShardedBitVector:
        return self._decompress(self.dense.find_lt(value))

    def find_le(self, value) -> ShardedBitVector:
        return self._decompress(self.dense.find_le(value))

    def find_ne(self, value) -> ShardedBitVector:
        """Assigned slots holding anything but ``value`` (compressed-
        domain ne, then one sharded rank decompression)."""
        return self._decompress(self.dense.find_ne(value))

    def find_range(self, lo, hi) -> ShardedBitVector:
        return self._decompress(self.dense.find_range(lo, hi))

    def pipeline_find_eq(self, values) -> list:
        return self.dense.pipeline_find_eq(values)

    # ------------------------------------------------------------------
    def gather(self, ids):
        """(values, not_null mask) for logical positions — NULL reads 0."""
        ids = np.asarray(ids, _I64)
        if ids.size == 0:
            return (np.zeros(0, self.dense.dtype), np.zeros(0, bool))
        if (ids < 0).any() or (ids >= max(self.size, 1)).any():
            raise IndexError("gather index out of range")
        # assigned = bit set at ids in null_sbv (one word-gather pass);
        # then ONE rank pass over just the assigned ids gives the value
        # indices — not two full rank_batch dispatches (ids and ids-1)
        assigned = self.null_sbv.get_bits(ids)
        vals = np.zeros(ids.size, self.dense.dtype)
        if assigned.any():
            rk = np.asarray(self.rs.rank_batch(ids[assigned]))
            vals[assigned] = self.dense.gather((rk - 1).astype(_I64))
        return vals, assigned

    def try_get(self, i):
        """Value at logical position i, or None when NULL."""
        vals, ok = self.gather([i])
        return (self.dense.dtype.type(vals[0]) if ok[0] else None)

    def get(self, i):
        vals, _ = self.gather([i])
        return vals[0]

    __getitem__ = get

    def __repr__(self):
        return (f"ShardedRSCVector(dtype={self.dense.dtype}, "
                f"size={self.size}, assigned={self.count()}, "
                f"mesh={self.mesh.devices.size} shards)")


class ShardedStrSparseVector(_SelectorSearchBase):
    """Mesh-sharded string vector: every present octet-bit plane of a
    ``StrSparseVector`` (sv/str_vector.py) plus the universe plane in ONE
    block-sharded stack — the string scanner at mesh scale (reference
    find_eq_str pipeline, src/bmsparsevec_algo.h:653 over
    src/bmstrsparsevec.h).  Shares the digest-narrowing / survivor-AND-SUB
    / pipeline flow with ShardedSparseVector (_SelectorSearchBase;
    selectors differ: one AND/AND-NOT entry per (octet, bit) plane from
    the remapped query image)."""

    def __init__(self, stack, size, mesh, max_str_size, nullable, slots,
                 remap_matrices, unmap_matrices):
        self.stack = stack
        self.size = int(size)
        self.mesh = mesh
        self.max_str_size = int(max_str_size)
        self.nullable = bool(nullable)
        self.slots = list(slots)          # (octet k, bit b) per value row
        self.pos_of = {kb: i for i, kb in enumerate(self.slots)}
        self.remap_matrices = remap_matrices
        self.unmap_matrices = unmap_matrices

    @property
    def K(self) -> int:
        return int(self.stack.shape[0])

    @property
    def UNI(self) -> int:
        return len(self.slots)

    @property
    def n_blocks(self) -> int:
        return int(self.stack.shape[1])

    # ------------------------------------------------------------------
    @classmethod
    def from_str_vector(cls, ssv, mesh=None) -> "ShardedStrSparseVector":
        mesh = mesh or make_mesh()
        for o in ssv.octets:
            o._flush()
        n_shards = mesh.devices.size
        size = ssv._size
        nblk = max(C.blocks_for_bits(max(size, 1)), 1)
        nblk_p = pad_rows(nblk, n_shards)
        slots, rows = [], []
        for k in range(ssv.max_str_size):
            for b, p in enumerate(ssv.octets[k].planes):
                if p is not None:
                    slots.append((k, b))
                    rows.append(_plane_words(p, nblk))
        host = np.zeros((len(slots) + 1, nblk_p, C.SET_BLOCK_SIZE),
                        np.uint32)
        for i, r in enumerate(rows):
            host[i, :nblk] = r
        if ssv.nullable:
            host[len(slots), :nblk] = _plane_words(ssv.null_plane, nblk)
        else:
            _fill_universe_row(host, len(slots), size)
        stack = jax.device_put(
            host, NamedSharding(mesh, P(None, BLOCK_AXIS, None)))
        return cls(stack, size, mesh, ssv.max_str_size, ssv.nullable,
                   slots, ssv.remap_matrices, ssv.unmap_matrices)

    @classmethod
    def from_strings(cls, strings, mesh=None, **kw) -> \
            "ShardedStrSparseVector":
        from ..sv.str_vector import StrSparseVector
        return cls.from_str_vector(
            StrSparseVector.from_strings(strings, **kw), mesh)

    def _skel(self):
        """Remap-only StrSparseVector view (for remap_value/_remap_invert
        without any payload)."""
        from ..sv.str_vector import StrSparseVector
        sk = StrSparseVector.__new__(StrSparseVector)
        sk.max_str_size = self.max_str_size
        sk.remap_matrices = self.remap_matrices
        sk.unmap_matrices = self.unmap_matrices
        return sk

    # ------------------------------------------------------------------
    def _selector(self, s):
        """int32[K] selector for a query string, or None when the string
        cannot occur (remap miss or a set bit with no stored plane) — the
        _PreparedStrPipeline decomposition over the sharded stack."""
        img = self._skel().remap_value(s)
        if img is None:
            return None
        sel = np.zeros(self.K, np.int32)
        for k in range(self.max_str_size):
            code = int(img[k])
            for b in range(8):
                idx = self.pos_of.get((k, b))
                if (code >> b) & 1:
                    if idx is None:
                        return None
                    sel[idx] = 1
                elif idx is not None:
                    sel[idx] = -1
        sel[self.UNI] = 1
        return sel

    def find_eq_str(self, s) -> ShardedBitVector:
        """All positions holding string ``s``: digest narrowing + one
        shard-local survivor AND-SUB pass (the shared
        _SelectorSearchBase flow — same programs as the int container)."""
        return self._search(s)

    def _selector_prefix(self, s):
        """Prefix selector: only octet positions < len(s) constrained
        (reference find_eq_str_impl(prefix_sub=false),
        src/bmsparsevec_algo.h:2239; the empty query degrades to the exact
        empty-string selector, mirroring the reference's ``if (*str)``
        branch).  None = the prefix cannot occur."""
        s = s if isinstance(s, str) else bytes(s).decode("latin-1")
        if not s:
            return self._selector("")
        img = self._skel().remap_value(s)
        if img is None:
            return None
        sel = np.zeros(self.K, np.int32)
        for k in range(len(s)):
            code = int(img[k])
            for b in range(8):
                idx = self.pos_of.get((k, b))
                if (code >> b) & 1:
                    if idx is None:
                        return None
                    sel[idx] = 1
                elif idx is not None:
                    sel[idx] = -1
        sel[self.UNI] = 1
        return sel

    def find_eq_str_prefix(self, s) -> ShardedBitVector:
        """All positions whose string starts with ``s`` — the prefix
        selector through the same digest-narrowed survivor AND-SUB flow
        (scanner find_eq_str_prefix at mesh scale)."""
        return self._search_sel(self._selector_prefix(s))

    def find_eq_str_count(self, s) -> int:
        return self._search_count(s)

    def pipeline_find_eq_str(self, strings) -> list:
        """Hit counts for a string batch through the sharded VMEM-batch
        pipeline (the shared _SelectorSearchBase flow) — one sweep per
        batch per shard; per-shard partials combine on host in int64."""
        return self._pipeline(strings)

    # ------------------------------------------------------------------
    def gather(self, ids) -> list:
        """Decode strings at mesh scale: the owning shard reads one word
        per plane per query; one psum assembles the octet codes."""
        ids = np.asarray(ids, np.int64)
        if ids.size == 0:
            return []
        if (ids < 0).any() or (ids >= max(self.size, 1)).any():
            raise IndexError("gather index out of range")
        blk = (ids >> C.SET_BLOCK_SHIFT).astype(np.int32)
        word_idx = ((ids & C.SET_BLOCK_MASK) >> 5).astype(np.int32)
        bit_in = (ids & 31).astype(np.uint32)
        bits = _host_fetch(_gather_rows_prog(self.mesh, self.K)(
            jnp.asarray(blk), jnp.asarray(word_idx), jnp.asarray(bit_in),
            self.stack))                      # [K, n_ids] 0/1
        cols = np.zeros((ids.size, self.max_str_size), np.uint8)
        for i, (k, b) in enumerate(self.slots):
            cols[:, k] |= (bits[i].astype(np.uint8) << b)
        if self.remap_matrices is not None:
            cols = self._skel()._remap_invert(cols)
        nn = bits[self.UNI]
        out = []
        for r in range(ids.size):
            if self.nullable and not nn[r]:
                out.append(None)
                continue
            row = cols[r]
            nz = np.flatnonzero(row == 0)
            end = int(nz[0]) if nz.size else self.max_str_size
            out.append(bytes(row[:end]).decode("latin-1"))
        return out

    def get(self, i):
        return self.gather([i])[0]

    __getitem__ = get

    def decode(self, lo: int, n: int) -> list:
        return self.gather(np.arange(lo, lo + n, dtype=np.int64))

    def compare(self, i: int, s) -> int:
        """-1/0/1 of element i vs string s (NULL sorts as "" — the
        single-host compare() contract; enables scanner sorted search)."""
        s = s if isinstance(s, str) else bytes(s).decode("latin-1")
        a = self.get(int(i)) or ""
        return (a > s) - (a < s)

    def __len__(self):
        return self.size

    # ------------------------------------------------------------------
    def to_str_vector(self):
        """Collect into a single-host StrSparseVector."""
        from ..core.bitvector import BitVector
        from ..sv.sparse_vector import SparseVector
        from ..sv.str_vector import StrSparseVector
        host = _host_fetch(self.stack)
        out = StrSparseVector(self.max_str_size, nullable=self.nullable)
        for i, (k, b) in enumerate(self.slots):
            if host[i].any():
                bv = BitVector.from_words(host[i], C.ID_MAX48)
                bv.optimize()
                self_oct = out.octets[k]
                self_oct.planes[b] = bv
        for o in out.octets:
            o._size = self.size
        if self.nullable:
            bv = BitVector.from_words(host[self.UNI], C.ID_MAX48)
            bv.optimize()
            out.null_plane = bv
        out._size = self.size
        out.remap_matrices = self.remap_matrices
        out.unmap_matrices = self.unmap_matrices
        return out

    def checkpoint_bytes(self) -> bytes:
        from ..serial.sv_serial import SparseVectorSerializer
        return SparseVectorSerializer().serialize_str(self.to_str_vector())

    @classmethod
    def from_checkpoint(cls, blob: bytes, mesh=None) -> \
            "ShardedStrSparseVector":
        from ..serial.sv_serial import SparseVectorDeserializer
        return cls.from_str_vector(
            SparseVectorDeserializer().deserialize(blob), mesh)

    def __repr__(self):
        return (f"ShardedStrSparseVector(size={self.size}, "
                f"octets={self.max_str_size}, planes={len(self.slots)}, "
                f"mesh={self.mesh.devices.size} shards)")


class ShardedFloatVector(_SelectorSearchBase):
    """Mesh-sharded float vector (``bm::sparse_vector_float``,
    reference src/bmsparsevec_float.h at mesh scale): the IEEE-754
    sign/exponent/mantissa split of a ``FloatSparseVector``
    (sv/float_vector.py) in ONE block-sharded stack.

    Stack rows: mantissa slices [0, man_eff), exponent slices
    [man_eff, man_eff+exp_eff), then the sign plane, then the universe.
    Magnitude bit s of the (exp << man_bits) | mantissa image maps through
    ``self.rows`` (-1 = no element stores that bit; the descent
    synthesizes a zero plane at trace time, the eq selector resolves a
    required absent bit symbolically).

    find_eq rides the shared digest-narrowing selector flow
    (_SelectorSearchBase); ordered searches use a fused magnitude descent
    with the float scanner's sign-class assembly (scanner find_gt_float:
    lexicographic (exp, mantissa) per sign class, order reversed for
    negatives, stored -0.0 moved to the non-negative class)."""

    def __init__(self, stack, size, mesh, dtype, rows, sign_row, nullable):
        self.stack = stack
        self.size = int(size)
        self.mesh = mesh
        self.dtype = np.dtype(dtype)
        spec_u = np.uint32 if self.dtype == np.float32 else np.uint64
        self._uint = spec_u
        self._eb = 8 if self.dtype == np.float32 else 11
        self._mb = 23 if self.dtype == np.float32 else 52
        self.rows = tuple(rows)        # magnitude bit s -> stack row / -1
        self.SIGN = int(sign_row)
        self.nullable = bool(nullable)

    @property
    def UNI(self) -> int:
        return self.SIGN + 1

    # ------------------------------------------------------------------
    @classmethod
    def from_float_vector(cls, fv, mesh=None) -> "ShardedFloatVector":
        mesh = mesh or make_mesh()
        fv.mantissa._flush()
        fv.exponent._flush()
        fv.sign._flush()
        n_shards = mesh.devices.size
        size = fv._size
        nblk = max(C.blocks_for_bits(max(size, 1)), 1)
        nblk_p = pad_rows(nblk, n_shards)
        man_eff = fv.mantissa.effective_slices()
        exp_eff = fv.exponent.effective_slices()
        eb = 8 if fv.dtype == np.float32 else 11
        mb = 23 if fv.dtype == np.float32 else 52
        rows = [(s if s < man_eff else -1) for s in range(mb)] + \
               [(man_eff + e if e < exp_eff else -1) for e in range(eb)]
        sign_row = man_eff + exp_eff
        host = np.zeros((sign_row + 2, nblk_p, C.SET_BLOCK_SIZE), np.uint32)
        for s in range(man_eff):
            host[s, :nblk] = _plane_words(fv.mantissa.planes[s], nblk)
        for e in range(exp_eff):
            host[man_eff + e, :nblk] = _plane_words(
                fv.exponent.planes[e], nblk)
        host[sign_row, :nblk] = _plane_words(fv.sign, nblk)
        if fv.nullable:
            host[sign_row + 1, :nblk] = _plane_words(fv.null_plane, nblk)
        else:
            _fill_universe_row(host, sign_row + 1, size)
        stack = jax.device_put(
            host, NamedSharding(mesh, P(None, BLOCK_AXIS, None)))
        return cls(stack, size, mesh, fv.dtype, rows, sign_row, fv.nullable)

    @classmethod
    def from_array(cls, values, mesh=None, dtype=None,
                   nullable=False) -> "ShardedFloatVector":
        from ..sv.float_vector import FloatSparseVector
        return cls.from_float_vector(
            FloatSparseVector.from_array(values, dtype=dtype,
                                         nullable=nullable), mesh)

    def to_float_vector(self):
        """Collect into a single-host FloatSparseVector."""
        from ..core.bitvector import BitVector
        from ..sv.float_vector import FloatSparseVector
        host = _host_fetch(self.stack)
        fv = FloatSparseVector(self.dtype, nullable=self.nullable)
        for s, r in enumerate(self.rows):
            if r < 0 or not host[r].any():
                continue
            bv = BitVector.from_words(host[r], C.ID_MAX48)
            bv.optimize()
            (fv.mantissa if s < self._mb else fv.exponent).planes[
                s if s < self._mb else s - self._mb] = bv
        fv.sign = BitVector.from_words(host[self.SIGN], C.ID_MAX48)
        fv.sign.optimize()
        if self.nullable:
            fv.null_plane = BitVector.from_words(host[self.UNI], C.ID_MAX48)
            fv.null_plane.optimize()
        fv.mantissa._size = fv.exponent._size = self.size
        fv._size = self.size
        return fv

    def checkpoint_bytes(self) -> bytes:
        from ..serial.sv_serial import SparseVectorSerializer
        return SparseVectorSerializer().serialize_float(
            self.to_float_vector())

    @classmethod
    def from_checkpoint(cls, blob: bytes, mesh=None) -> "ShardedFloatVector":
        from ..serial.sv_serial import SparseVectorDeserializer
        return cls.from_float_vector(
            SparseVectorDeserializer().deserialize(blob), mesh)

    # ------------------------------------------------------------------
    def _parts(self, value):
        u = int(np.asarray([value], self.dtype).view(self._uint)[0])
        sign = u >> (self._eb + self._mb)
        exp = (u >> self._mb) & ((1 << self._eb) - 1)
        mant = u & ((1 << self._mb) - 1)
        if exp == 0 and mant == 0:
            sign = 0                     # -0.0 compares equal to +0.0
        return sign, exp, mant

    def _selector(self, value):
        """Equality selector over magnitude rows + sign + universe (the
        scanner find_eq_float decomposition; None = value cannot occur)."""
        sign, exp, mant = self._parts(value)
        mag = (exp << self._mb) | mant
        sel = np.zeros(self.K, np.int32)
        for s, r in enumerate(self.rows):
            if (mag >> s) & 1:
                if r < 0:                # a required bit no element stores
                    return None
                sel[r] = 1
            elif r >= 0:
                sel[r] = -1
        if not (exp == 0 and mant == 0):
            sel[self.SIGN] = 1 if sign else -1
        sel[self.UNI] = 1
        return sel

    def find_eq(self, value) -> ShardedBitVector:
        """All positions holding ``value`` (digest narrowing + one
        survivor AND-SUB pass; +-0.0 match each other)."""
        return self._search(value)

    def find_eq_count(self, value) -> int:
        return self._search_count(value)

    def find_ne(self, value) -> ShardedBitVector:
        """Assigned positions holding anything but ``value``."""
        return self._search_ne(value)

    def pipeline_find_eq(self, values) -> list:
        """Hit counts for a float batch — one sharded sweep per batch."""
        return self._pipeline(values)

    # ------------------------------------------------------------------
    def _gt_eq(self, value):
        """(gt_pool, eq_pool) of the float ordering (scanner
        find_gt_float semantics: gt_pool is the FINAL x > value set)."""
        sign, exp, mant = self._parts(value)
        mag = (exp << self._mb) | mant
        vbits = np.asarray([(mag >> s) & 1 for s in range(len(self.rows))],
                           np.int32)
        prog = _float_gt_prog(self.mesh, self.rows, self.SIGN, self.UNI,
                              bool(sign))
        return prog(jnp.asarray(vbits), self.stack)

    def find_gt(self, value) -> ShardedBitVector:
        gt, _ = self._gt_eq(value)
        return self._wrap(gt)

    def find_ge(self, value) -> ShardedBitVector:
        gt, eq = self._gt_eq(value)
        return self._wrap(_or_pools(gt, eq))

    def find_le(self, value) -> ShardedBitVector:
        gt, _ = self._gt_eq(value)
        return self._wrap(_sub_from_uni_prog(self.mesh, self.K, self.UNI)(
            gt, self.stack))

    def find_lt(self, value) -> ShardedBitVector:
        gt, eq = self._gt_eq(value)
        return self._wrap(_sub_from_uni_prog(self.mesh, self.K, self.UNI)(
            _or_pools(gt, eq), self.stack))

    def find_range(self, lo, hi) -> ShardedBitVector:
        ge = self.find_ge(lo)
        le = self.find_le(hi)
        return self._wrap(_and_pools(ge.pool, le.pool))

    def _wrap(self, pool) -> ShardedBitVector:
        return ShardedBitVector(pool, self.size, self.mesh)

    # ------------------------------------------------------------------
    def gather(self, ids) -> np.ndarray:
        """Decode floats at mesh scale (NULL positions read 0.0)."""
        ids = np.asarray(ids, _I64)
        if ids.size == 0:
            return np.zeros(0, self.dtype)
        if (ids < 0).any() or (ids >= max(self.size, 1)).any():
            raise IndexError("gather index out of range")
        blk = (ids >> C.SET_BLOCK_SHIFT).astype(np.int32)
        word_idx = ((ids & C.SET_BLOCK_MASK) >> 5).astype(np.int32)
        bit_in = (ids & 31).astype(np.uint32)
        bits = _host_fetch(_gather_rows_prog(self.mesh, self.K)(
            jnp.asarray(blk), jnp.asarray(word_idx), jnp.asarray(bit_in),
            self.stack)).astype(np.uint64)
        u = np.zeros(ids.size, np.uint64)
        for s, r in enumerate(self.rows):
            if r >= 0:
                u |= bits[r] << np.uint64(s)
        u |= bits[self.SIGN] << np.uint64(self._eb + self._mb)
        vals = u.astype(np.uint64).view(np.float64) \
            if self.dtype == np.float64 \
            else u.astype(np.uint32).view(np.float32)
        if self.nullable:
            vals = np.where(bits[self.UNI] == 0,
                            np.asarray(0, self.dtype), vals)
        return np.asarray(vals, self.dtype)

    def decode(self, lo: int, n: int) -> np.ndarray:
        return self.gather(np.arange(lo, lo + n, dtype=_I64))

    def get(self, i):
        return self.gather(np.asarray([i]))[0]

    __getitem__ = get

    def __len__(self):
        return self.size

    def __repr__(self):
        return (f"ShardedFloatVector(dtype={self.dtype}, size={self.size}, "
                f"rows={self.K}, mesh={self.mesh.devices.size} shards)")


# ---------------------------------------------------------------------------
# device programs (cached per mesh/shape signature)
# ---------------------------------------------------------------------------
# module-level singletons: jit caches live on the wrapper, so per-call
# jax.jit(lambda ...) would re-trace every invocation
_or_pools = jax.jit(jnp.bitwise_or)
_and_pools = jax.jit(jnp.bitwise_and)


@functools.lru_cache(maxsize=32)
def _stack_row_prog(row):
    """stack -> copy of stack[row] (universe plane extraction)."""
    return jax.jit(lambda s: s[row] | jnp.uint32(0))


@functools.lru_cache(maxsize=4)
def _zeros_row_prog():
    return jax.jit(lambda s: jnp.zeros_like(s[0]))


@functools.lru_cache(maxsize=64)
def _or_rows_prog(mesh, n_rows):
    """OR of stack rows [0, n_rows) (find_nonzero: union of value slices)."""
    def _local(stack_l):
        acc = stack_l[0]
        for i in range(1, n_rows):
            acc = acc | stack_l[i]
        return acc

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=P(None, BLOCK_AXIS, None),
        out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=64)
def _sel_alive_prog(mesh, k):
    """Digest pre-pass for a selector: AND the 8-byte/block digests of the
    AND-group rows -> bool[local_blocks] per shard (sharded out)."""
    def _local(sel, stack_l):
        acc = None
        for i in range(k):
            d = _digest_packed(stack_l[i])
            d = jnp.where(sel[i] == 1, d, jnp.uint32(0xFFFFFFFF))
            acc = d if acc is None else (acc & d)
        return jnp.any(acc != 0, axis=1)[None]

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(None, BLOCK_AXIS, None)),
        out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=64)
def _sel_survivors_prog(mesh, k):
    """Survivor-only AND-SUB: gather surviving rows from each slice,
    combine by selector polarity, scatter-ADD into a zero pool."""
    def _local(sel, idx_l, valid_l, stack_l):
        idx = idx_l[0]
        acc = None
        for i in range(k):
            r = jnp.take(stack_l[i], idx, axis=0)
            r = jnp.where(sel[i] == 1, r,
                          jnp.where(sel[i] == -1, ~r,
                                    jnp.uint32(0xFFFFFFFF)))
            acc = r if acc is None else (acc & r)
        acc = jnp.where(valid_l[0][:, None], acc, jnp.uint32(0))
        out = jnp.zeros_like(stack_l[0])
        return out.at[idx].add(acc)       # add: padded slots alias row 0

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(BLOCK_AXIS, None), P(BLOCK_AXIS, None),
                  P(None, BLOCK_AXIS, None)),
        out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=64)
def _sel_count_prog(mesh, k):
    def _local(sel, idx_l, valid_l, stack_l):
        idx = idx_l[0]
        acc = None
        for i in range(k):
            r = jnp.take(stack_l[i], idx, axis=0)
            r = jnp.where(sel[i] == 1, r,
                          jnp.where(sel[i] == -1, ~r,
                                    jnp.uint32(0xFFFFFFFF)))
            acc = r if acc is None else (acc & r)
        acc = jnp.where(valid_l[0][:, None], acc, jnp.uint32(0))
        # per-shard partial only; the cross-shard total combines on host in
        # int64 (a u32 psum would wrap past 2^32 global hits)
        c = jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)
        return c[None]

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(BLOCK_AXIS, None), P(BLOCK_AXIS, None),
                  P(None, BLOCK_AXIS, None)),
        out_specs=P(BLOCK_AXIS)))


@functools.lru_cache(maxsize=128)
def _descent_prog(mesh, k, lo_row, n_bits, uni_row, universe_mode):
    """Fused MSB-first descent: (gt, eq) accumulators over the slice rows
    [lo_row, lo_row + n_bits), universe chosen in-program.  vbits is the
    value's bit vector (int32[n_bits]) so one compile serves all values."""
    def _local(vbits, stack_l):
        uni = stack_l[uni_row]
        if universe_mode == 1:            # non-negatives: UNI & ~sign
            uni = uni & ~stack_l[0]
        elif universe_mode == 2:          # negatives: UNI & sign
            uni = uni & stack_l[0]
        gt = jnp.zeros_like(uni)
        eq = uni
        for s in range(n_bits - 1, -1, -1):
            p = stack_l[lo_row + s]
            vb = vbits[s]
            gt = jnp.where(vb == 0, gt | (eq & p), gt)
            eq = jnp.where(vb == 1, eq & p, eq & ~p)
        return gt, eq

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(None, BLOCK_AXIS, None)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None))))


@functools.lru_cache(maxsize=64)
def _float_gt_prog(mesh, rows, sign_row, uni_row, neg_mode):
    """Fused float ordering (scanner find_gt_float at mesh scale):
    magnitude descent over ``rows`` (stack row per (exp<<mb)|mantissa bit,
    -1 = zero plane synthesized at trace time) with IEEE sign-class
    assembly — stored -0.0 joins the non-negative class; for a negative
    query (neg_mode) the result is all non-negatives plus negatives of
    SMALLER magnitude.  Returns (x > value, x == value) pools."""
    n_bits = len(rows)

    def _local(vbits, stack_l):
        uni = stack_l[uni_row]
        sgn = stack_l[sign_row]
        mag_zero = uni
        for r in rows:
            if r >= 0:
                mag_zero = mag_zero & ~stack_l[r]
        pos = (uni & ~sgn) | (mag_zero & sgn)
        neg = (uni & sgn) & ~mag_zero
        eq = neg if neg_mode else pos
        gt = jnp.zeros_like(uni)
        for s in range(n_bits - 1, -1, -1):
            p = (jnp.zeros_like(uni) if rows[s] < 0
                 else stack_l[rows[s]])
            vb = vbits[s]
            gt = jnp.where(vb == 0, gt | (eq & p), gt)
            eq = jnp.where(vb == 1, eq & p, eq & ~p)
        if neg_mode:
            return pos | (neg & ~(gt | eq)), eq
        return gt, eq

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(None, BLOCK_AXIS, None)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None))))


@functools.lru_cache(maxsize=64)
def _lt_mag_plus_pos_prog(mesh, k, uni_row):
    """value < 0 assembly: (negatives with |x| < |v|) | all non-negatives."""
    def _local(gt_l, eq_l, stack_l):
        uni = stack_l[uni_row]
        neg = uni & stack_l[0]
        pos = uni & ~stack_l[0]
        return pos | (neg & ~(gt_l | eq_l))

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None),
                  P(None, BLOCK_AXIS, None)),
        out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=64)
def _sub_from_uni_prog(mesh, k, uni_row):
    def _local(pool_l, stack_l):
        return stack_l[uni_row] & ~pool_l

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(None, BLOCK_AXIS, None)),
        out_specs=P(BLOCK_AXIS, None)))


@functools.lru_cache(maxsize=64)
def _gather_rows_prog(mesh, k):
    """Per-query per-row bit extraction: the owning shard reads one word
    per stack row; psum assembles -> uint32[k, n_ids] of 0/1 bits."""
    def _local(blk, word_idx, bit_in, stack_l):
        bps = stack_l.shape[1]
        sid = jax.lax.axis_index(BLOCK_AXIS)
        rel = blk - sid * bps
        mine = (rel >= 0) & (rel < bps)
        relc = jnp.clip(rel, 0, bps - 1)
        flat_idx = relc * C.SET_BLOCK_SIZE + word_idx
        rows = []
        for s in range(k):
            w = jnp.take(stack_l[s].reshape(-1), flat_idx)
            bit = (w >> bit_in) & jnp.uint32(1)
            rows.append(jnp.where(mine, bit, jnp.uint32(0)))
        return jax.lax.psum(jnp.stack(rows), BLOCK_AXIS)

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, BLOCK_AXIS, None)),
        out_specs=P()))


@functools.lru_cache(maxsize=64)
def _gather_prog(mesh, k, n_eff, uni_row):
    """Per-query value assembly: the owning shard reads one word per slice,
    assembles (lo, hi) u32 halves + the universe bit; one psum combines."""
    def _local(blk, word_idx, bit_in, stack_l):
        bps = stack_l.shape[1]
        sid = jax.lax.axis_index(BLOCK_AXIS)
        rel = blk - sid * bps
        mine = (rel >= 0) & (rel < bps)
        relc = jnp.clip(rel, 0, bps - 1)
        flat_idx = relc * C.SET_BLOCK_SIZE + word_idx
        lo = jnp.zeros(blk.shape, jnp.uint32)
        hi = jnp.zeros(blk.shape, jnp.uint32)
        for s in range(n_eff):
            w = jnp.take(stack_l[s].reshape(-1), flat_idx)
            bit = (w >> bit_in) & jnp.uint32(1)
            bit = jnp.where(mine, bit, jnp.uint32(0))
            if s < 32:
                lo = lo | (bit << jnp.uint32(s))
            else:
                hi = hi | (bit << jnp.uint32(s - 32))
        wn = jnp.take(stack_l[uni_row].reshape(-1), flat_idx)
        nn = jnp.where(mine, (wn >> bit_in) & jnp.uint32(1), jnp.uint32(0))
        return (jax.lax.psum(lo, BLOCK_AXIS),
                jax.lax.psum(hi, BLOCK_AXIS),
                jax.lax.psum(nn, BLOCK_AXIS))

    return jax.jit(shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, BLOCK_AXIS, None)),
        out_specs=(P(), P(), P())))
