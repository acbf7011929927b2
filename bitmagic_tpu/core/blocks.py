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

from ..constants import ALL_ONES_WORD, CLS_BIT, CLS_FULL, SET_BLOCK_SIZE

# symbolic per-block operand state used during planning
_Z, _F, _B = 0, 1, 2   # zero / full / bit-row


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

    def lookup(self, blocks: np.ndarray):
        """For each logical block id, return (state, slot):
        state in {_Z,_F,_B}, slot = pool row or -1."""
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
        slot = np.where(state == _B, self.slots()[pos_c], -1)
        return state, slot.astype(np.int64)


@dataclasses.dataclass
class BinaryPlan:
    """Execution plan of one binary set-op."""
    nb: np.ndarray          # result block ids (all classes)
    cls: np.ndarray         # result classes (CLS_BIT entries computed by kernel)
    # for the CLS_BIT result blocks, operand gather descriptors:
    a_slot: np.ndarray      # int64[k] row in pool A or -1
    a_full: np.ndarray      # bool[k]  operand block is FULL
    b_slot: np.ndarray
    b_full: np.ndarray


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
        a_slot=sl_a[km], a_full=(st_a[km] == _F),
        b_slot=sl_b[km], b_full=(st_b[km] == _F),
    )


def gather_operand(pool, slot, full):
    """Materialize aligned operand rows: pool rows where slot>=0, all-ones
    rows where full, zero rows otherwise.  XLA fuses the fills into the
    consuming elementwise op."""
    slot = jnp.asarray(slot)
    fullm = jnp.asarray(full)[:, None]
    if pool.shape[0] == 0:
        rows = jnp.zeros((slot.shape[0], SET_BLOCK_SIZE), jnp.uint32)
    else:
        rows = jnp.take(pool, jnp.maximum(slot, 0), axis=0)
    zerom = (slot < 0)[:, None]
    rows = jnp.where(zerom, jnp.uint32(0), rows)
    rows = jnp.where(fullm, ALL_ONES_WORD, rows)
    return rows
