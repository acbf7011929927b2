"""Rank-select acceleration index.

Equivalent of the reference ``bm::rs_index`` (src/bmrs.h:40): per-block
running counts for O(1) rank and log-descent select.  The TPU layout replaces
the reference's super-block/sub-count packing (rs3 borders 21824/43648,
src/bmconst.h:120-124) with:

  * host: inclusive popcount prefix ``cum[int64, n_alloc]`` over allocated
    blocks (ZERO blocks contribute nothing, exactly like the reference's
    NULL super-block encoding),
  * device: per-BIT-row inclusive *wave* popcount prefix ``int32[r, 64]``
    (finer than the reference's 3 sub-blocks — one entry per 1024 bits —
    which is the natural vector width on TPU).

Select descends rank -> block (host searchsorted over ``cum``) -> wave
(device searchsorted over the wave prefix) -> word -> in-word position via a
vectorized binary popcount descent (bm::word_select32 analog,
src/bmfunc.h:1075).  All queries are batched: thousands of ranks resolve in
one device pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops import blockops
from ..ops.select import global_wave_prefix, select_flat

_I32 = jnp.int32
_I64 = np.int64


class RSIndex:
    """Rank/select index over one BitVector snapshot."""

    def __init__(self, nb, cls, cum, pool, size, gaps=None, span=None,
                 slots=None, gslots=None):
        self.nb = nb                   # int64[m] segment start block ids
        self.cls = cls                 # uint8[m]
        self.span = (span if span is not None
                     else np.ones(len(nb), _I64))  # blocks per segment
        self.cum = cum                 # int64[m] inclusive popcount prefix
        self.pool = pool               # device uint32[r, 2048]
        self.gaps = gaps               # host GapStore (CLS_GAP blocks)
        # global wave popcount prefix (the rs3 sub-count analog, 256 B/row,
        # flattened so select is one searchsorted over a small table)
        self.gwc = (global_wave_prefix(pool) if pool.shape[0]
                    else jnp.zeros((0,), jnp.int32))
        self._gwc_cache = None
        self.size = size
        self.total = int(cum[-1]) if cum.size else 0
        if slots is None:
            is_bit = cls == C.CLS_BIT
            s = np.cumsum(is_bit) - 1
            slots = np.where(is_bit, s, -1).astype(_I64)
        if gslots is None:
            is_gap = cls == C.CLS_GAP
            g = np.cumsum(is_gap) - 1
            gslots = np.where(is_gap, g, -1).astype(_I64)
        self.slots = slots
        self.gslots = gslots

    # ------------------------------------------------------------------
    @classmethod
    def build(cls_, bv) -> "RSIndex":
        """Build from a BitVector (reference build_rs_index, src/bm.h:2501).
        FULL runs join as single multi-block segments — their rank/select
        contribution is pure arithmetic, O(1) metadata per run (the
        reference's FULL super-block encoding, src/bmrs.h:70-73)."""
        bv._flush()
        pool = bv._pool
        start, span, seg_cls, slots, gslots = bv._struct.segments()
        counts = span * C.BITS_PER_BLOCK          # FULL segments (and runs)
        counts[seg_cls != C.CLS_FULL] = 0
        is_bit = seg_cls == C.CLS_BIT
        if pool.shape[0]:
            bc = np.asarray(blockops.block_counts(pool)).astype(_I64)
            counts[is_bit] = bc[slots[is_bit]]
            # the select descent carries pool-global ranks as device int32
            # (ops/select.py contract); enforce the documented bound
            # loudly instead of wrapping silently
            if int(bc.sum()) >= 2**31:
                raise ValueError(
                    "rs_index: device pool holds >= 2^31 set bits — beyond "
                    "the int32 select-descent bound; split the vector "
                    "(rank_range_split) or shard it over a mesh")
        is_gap = seg_cls == C.CLS_GAP
        if bv._gaps is not None and is_gap.any():
            counts[is_gap] = bv._gaps.popcounts()[gslots[is_gap]]
        cum = np.cumsum(counts)
        return cls_(start, seg_cls, cum, pool, bv.size, bv._gaps,
                    span=span, slots=slots, gslots=gslots)

    def _gwc_host(self):
        if self._gwc_cache is None:
            self._gwc_cache = np.asarray(self.gwc).astype(np.int64)
        return self._gwc_cache

    # ------------------------------------------------------------------
    def count(self) -> int:
        return self.total

    def rank_batch(self, ids) -> np.ndarray:
        """rank(i) = popcount[0, i] for each id (reference count_to with
        rs_index, src/bm.h:1420)."""
        ids = np.asarray(ids, _I64)
        out = np.zeros(ids.shape, _I64)
        if len(self.nb) == 0:
            return out
        blocks = ids >> C.SET_BLOCK_SHIFT
        # segment at or before each block (segments may span many blocks)
        pos = np.searchsorted(self.nb, blocks, side="right") - 1
        pos_c = np.maximum(pos, 0)
        hit = (pos >= 0) & (blocks < self.nb[pos_c] + self.span[pos_c])
        # whole segments strictly before the queried block
        out += np.where(hit,
                        np.where(pos_c > 0,
                                 self.cum[np.maximum(pos_c - 1, 0)], 0),
                        np.where(pos >= 0, self.cum[pos_c], 0))
        cls_at = self.cls[pos_c]
        # FULL segment containing i: in-segment offset + 1 (pure arithmetic,
        # valid across multi-block runs)
        fullm = hit & (cls_at == C.CLS_FULL)
        out[fullm] += (ids[fullm]
                       - (self.nb[pos_c[fullm]] << C.SET_BLOCK_SHIFT)) + 1
        # GAP block containing i: host run arithmetic (gap_bfind analog)
        gapm = hit & (cls_at == C.CLS_GAP)
        if gapm.any():
            g = self.gslots[pos_c[gapm]]
            out[gapm] += self.gaps.rank_in_block(
                g, ids[gapm] & C.SET_BLOCK_MASK)
        # BIT block containing i: device partial popcount
        bitm = hit & (cls_at == C.CLS_BIT)
        if bitm.any():
            slots = self.slots[pos_c[bitm]]
            inb = (ids[bitm] & C.SET_BLOCK_MASK).astype(np.int32)
            out[bitm] += np.asarray(_rank_in_rows(
                self.pool, jnp.asarray(slots), jnp.asarray(inb))).astype(_I64)
        return out

    def rank(self, i) -> int:
        return int(self.rank_batch(np.asarray([i]))[0])

    def select_batch(self, ranks) -> np.ndarray:
        """Position of each (1-based) rank's set bit; -1 if out of range
        (reference select, src/bm.h:1705)."""
        ranks = np.asarray(ranks, _I64)
        out = np.full(ranks.shape, -1, _I64)
        ok = (ranks >= 1) & (ranks <= self.total)
        if not ok.any():
            return out
        r = ranks[ok]
        entry = np.searchsorted(self.cum, r, side="left")
        base_rank = np.where(entry > 0, self.cum[np.maximum(entry - 1, 0)], 0)
        rem64 = r - base_rank                # 1-based in segment (int64:
        rem = rem64.astype(np.int32)         # FULL runs can exceed 2^31 bits)
        blk_base = self.nb[entry] << C.SET_BLOCK_SHIFT
        res = np.empty(r.shape, _I64)
        fullm = self.cls[entry] == C.CLS_FULL
        res[fullm] = blk_base[fullm] + rem64[fullm] - 1
        gapm = self.cls[entry] == C.CLS_GAP
        if gapm.any():
            g = self.gslots[entry[gapm]]
            res[gapm] = blk_base[gapm] + self.gaps.select_in_block(
                g, rem[gapm].astype(_I64))
        bitm = ~fullm & ~gapm
        if bitm.any():
            slots = self.slots[entry[bitm]].astype(np.int64)
            # translate the in-block rank into the pool's global rank space
            # and resolve with ONE flat searchsorted over the global wave
            # prefix (the table is small and stays cache-resident)
            gwc_np = self._gwc_host()
            before = np.where(slots > 0,
                              gwc_np[np.maximum(slots * C.BLOCK_WAVES - 1, 0)],
                              0)
            granks = (rem[bitm].astype(np.int64) + before).astype(np.int32)
            pos_flat = np.asarray(select_flat(
                self.pool, self.gwc, jnp.asarray(granks))).astype(np.int64)
            in_block = pos_flat - slots * C.BITS_PER_BLOCK
            res[bitm] = blk_base[bitm] + in_block
        out[ok] = res
        return out

    def select(self, rank) -> int:
        return int(self.select_batch(np.asarray([rank]))[0])


@jax.jit
def _rank_in_rows(pool, slots, in_block_bits):
    """popcount of bits [0, in_block_bits] within the given pool rows."""
    rows = jnp.take(pool, slots, axis=0)
    q = rows.shape[0]
    widx = jax.lax.broadcasted_iota(_I32, (q, C.SET_BLOCK_SIZE), 1)
    wi = (in_block_bits >> 5)[:, None]
    bi = (in_block_bits & 31).astype(jnp.uint32)[:, None]
    full = widx < wi
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    part = jnp.where(bi == 31, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << (bi + jnp.uint32(1))) - jnp.uint32(1))
    mask = jnp.where(widx == wi, part, mask)
    return jnp.sum(jax.lax.population_count(rows & mask).astype(_I32), axis=1)
