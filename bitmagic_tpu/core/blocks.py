"""Block-structure bookkeeping for the TPU bit-vector.

The reference manages blocks with a two-level pointer tree + pointer tagging
(`blocks_manager`, src/bmblocks.h:41; GAP/FULL pointer tags src/bmdef.h:165-199).
XLA needs static shapes and no pointers, so the TPU design replaces the tree
with three parallel host-side numpy arrays (tiny metadata) plus one dense
device pool:

  * ``nb``  : int64[n_alloc]  — sorted unique logical block ids,
  * ``cls`` : uint8[n_alloc]  — CLS_BIT or CLS_FULL (CLS_ZERO blocks are
               simply absent, like NULL pointers in the reference),
  * pool    : uint32[n_rows, 2048] on device — one row per CLS_BIT block, in
               ``nb`` order.

Binary set-ops are *planned* on host over this metadata (pure numpy, O(n_alloc))
and *executed* on device as one gather + one fused elementwise kernel — the
TPU analog of the reference's per-block dispatch loop
(`combine_operation_and`, src/bm.h:6604-7056), where FULL/ZERO fast paths
resolve symbolically and only genuine BIT x BIT work touches HBM.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..constants import (ALL_ONES_WORD, CLS_BIT, CLS_FULL, CLS_GAP,
                         SET_BLOCK_SIZE)

# symbolic per-block operand state used during planning
_Z, _F, _B, _G = 0, 1, 2, 3   # zero / full / bit-row / host GAP buffer


@dataclasses.dataclass
class Structure:
    """Host metadata of one bit-vector's block structure."""
    nb: np.ndarray        # int64[n_alloc], sorted unique
    cls: np.ndarray       # uint8[n_alloc]

    @classmethod
    def empty(cls_):
        return cls_(np.zeros(0, np.int64), np.zeros(0, np.uint8))

    def n_rows(self) -> int:
        return int((self.cls == CLS_BIT).sum())

    def slots(self) -> np.ndarray:
        """Pool-row index per entry (-1 for non-BIT)."""
        is_bit = self.cls == CLS_BIT
        s = np.cumsum(is_bit) - 1
        return np.where(is_bit, s, -1).astype(np.int64)

    def gslots(self) -> np.ndarray:
        """GAP-store index per entry (-1 for non-GAP)."""
        is_gap = self.cls == CLS_GAP
        s = np.cumsum(is_gap) - 1
        return np.where(is_gap, s, -1).astype(np.int64)

    def lookup(self, blocks: np.ndarray):
        """For each logical block id, return (state, slot):
        state in {_Z,_F,_B,_G}; slot = pool row (_B), GAP-store index (_G),
        else -1."""
        blocks = np.asarray(blocks, np.int64)
        if len(self.nb) == 0:
            return (np.full(blocks.shape, _Z, np.int8),
                    np.full(blocks.shape, -1, np.int64))
        pos = np.searchsorted(self.nb, blocks)
        pos_c = np.minimum(pos, len(self.nb) - 1)
        found = self.nb[pos_c] == blocks
        cls = np.where(found, self.cls[pos_c], 255)
        state = np.full(blocks.shape, _Z, np.int8)
        state[cls == CLS_FULL] = _F
        state[cls == CLS_BIT] = _B
        state[cls == CLS_GAP] = _G
        slot = np.where(state == _B, self.slots()[pos_c], -1)
        slot = np.where(state == _G, self.gslots()[pos_c], slot)
        return state, slot.astype(np.int64)


@dataclasses.dataclass
class BinaryPlan:
    """Execution plan of one binary set-op."""
    nb: np.ndarray          # result block ids (all classes)
    cls: np.ndarray         # result classes (CLS_BIT entries computed by kernel)
    # for the CLS_BIT result blocks, operand gather descriptors:
    a_slot: np.ndarray      # int64[k] row in pool A or -1
    a_full: np.ndarray      # bool[k]  operand block is FULL
    a_gap: np.ndarray       # int64[k] GAP-store index in A or -1
    b_slot: np.ndarray
    b_full: np.ndarray
    b_gap: np.ndarray


def plan_binary(op: str, sa: Structure, sb: Structure) -> BinaryPlan:
    """Symbolically resolve FULL/ZERO algebra per block; emit kernel work for
    the rest.  Mirrors the FULL/NULL fast paths of the reference op loops
    (src/bm.h:6628-6676, combine_operation_block_and :7033-7056)."""
    if op == "and":
        cand = np.intersect1d(sa.nb, sb.nb)
    elif op == "sub":
        cand = sa.nb.copy()
    else:  # or / xor
        cand = np.union1d(sa.nb, sb.nb)

    st_a, sl_a = sa.lookup(cand)
    st_b, sl_b = sb.lookup(cand)

    res_cls = np.full(cand.shape, CLS_BIT, np.uint8)
    drop = np.zeros(cand.shape, bool)

    if op == "and":
        drop |= (st_a == _Z) | (st_b == _Z)
        res_cls[(st_a == _F) & (st_b == _F)] = CLS_FULL
    elif op == "or":
        drop |= (st_a == _Z) & (st_b == _Z)
        res_cls[(st_a == _F) | (st_b == _F)] = CLS_FULL
    elif op == "xor":
        drop |= (st_a == _Z) & (st_b == _Z)
        both_f = (st_a == _F) & (st_b == _F)
        drop |= both_f
        res_cls[((st_a == _F) & (st_b == _Z)) | ((st_a == _Z) & (st_b == _F))] = CLS_FULL
    elif op == "sub":
        drop |= (st_a == _Z) | (st_b == _F)
        res_cls[(st_a == _F) & (st_b == _Z)] = CLS_FULL
    else:
        raise ValueError(op)

    keep = ~drop
    nb = cand[keep]
    cls = res_cls[keep]
    is_kernel = cls == CLS_BIT
    km = keep.copy()
    km[keep] = is_kernel
    return BinaryPlan(
        nb=nb, cls=cls,
        a_slot=np.where(st_a[km] == _B, sl_a[km], -1),
        a_full=(st_a[km] == _F),
        a_gap=np.where(st_a[km] == _G, sl_a[km], -1),
        b_slot=np.where(st_b[km] == _B, sl_b[km], -1),
        b_full=(st_b[km] == _F),
        b_gap=np.where(st_b[km] == _G, sl_b[km], -1),
    )


def gather_operand(pool, slot, full, aux=None, aux_slot=None):
    """Materialize aligned operand rows: pool rows where slot>=0, all-ones
    rows where full, zero rows otherwise; rows from the transient ``aux``
    array (expanded GAP blocks) where aux_slot>=0.  XLA fuses the fills and
    the second gather into the consuming elementwise op."""
    slot = jnp.asarray(slot)
    fullm = jnp.asarray(full)[:, None]
    if pool.shape[0] == 0:
        rows = jnp.zeros((slot.shape[0], SET_BLOCK_SIZE), jnp.uint32)
    else:
        rows = jnp.take(pool, jnp.maximum(slot, 0), axis=0)
    zerom = (slot < 0)[:, None]
    rows = jnp.where(zerom, jnp.uint32(0), rows)
    rows = jnp.where(fullm, ALL_ONES_WORD, rows)
    if aux is not None and aux.shape[0]:
        aux_slot = jnp.asarray(aux_slot)
        arows = jnp.take(aux, jnp.maximum(aux_slot, 0), axis=0)
        rows = jnp.where((aux_slot >= 0)[:, None], arows, rows)
    return rows


def expand_gap_operand(store, gap_slots: np.ndarray):
    """Transient dense rows for the GAP blocks referenced by ``gap_slots``
    (-1 = not GAP).  Returns (aux_rows_np[k, 2048], aux_slot[n]) where
    aux_slot maps each input position to its row in aux (or -1).  The
    batched gap_convert_to_bitset upload (src/bmfunc.h:5223)."""
    gap_slots = np.asarray(gap_slots, np.int64)
    used = np.unique(gap_slots[gap_slots >= 0])
    if used.size == 0 or store is None:
        return (np.zeros((0, SET_BLOCK_SIZE), np.uint32),
                np.full(gap_slots.shape, -1, np.int64))
    rows = store.to_dense(used)
    pos = np.searchsorted(used, np.maximum(gap_slots, 0))
    aux_slot = np.where(gap_slots >= 0, pos, -1)
    return rows, aux_slot.astype(np.int64)


def operand_args(v, blocklist: np.ndarray):
    """Device-ready 5-tuple (pool, slot, full, aux, aux_slot) for one
    BitVector operand aligned on ``blocklist`` — the shared gather
    descriptor used by set-op/metric/aggregator kernels."""
    st, slot = v._struct.lookup(blocklist)
    aux_np, aux_slot = expand_gap_operand(
        v._gaps, np.where(st == _G, slot, -1))
    return (v._pool,
            jnp.asarray(np.where(st == _B, slot, -1)),
            jnp.asarray(st == _F),
            jnp.asarray(aux_np),
            jnp.asarray(aux_slot))
