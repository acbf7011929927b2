"""Operand arena: a combined device pool over a group of BitVectors.

The reference aggregator keeps operand block lists in arena-allocated lists
(src/bmaggregator.h arg_groups/arena) and its pipeline caches decoded blocks
across hundreds of searches (pipeline_bcache :197).  The TPU analog: operand
pools concatenate ONCE into a single HBM arena; every subsequent group op is
a slot-matrix lookup (host numpy) + one Pallas sweep over the arena
(ops/pallas_kernels.agg_and_sub_pallas) that streams each needed 8KB block
exactly once, with all-zero early exit.

Building the arena costs one device concat (HBM copy).  It pays off when the
same vector group is queried repeatedly — exactly the scanner / pipeline
workload (BASELINE configs 3 and 4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..ops import blockops

_I64 = np.int64


class OperandArena:
    """Combined pool + per-vector structure tables for fast slot lookups."""

    def __init__(self, vectors):
        for v in vectors:
            v._flush()
        self.vectors = list(vectors)
        pools = [v._pool for v in self.vectors if v._pool.shape[0]]
        self.pool = (jnp.concatenate(pools, axis=0) if pools
                     else blockops.zero_pool(0))
        self.row_offset = []
        off = 0
        for v in self.vectors:
            self.row_offset.append(off)
            off += int(v._pool.shape[0])

    def slot_row(self, vector_index: int, blocklist: np.ndarray,
                 full_as: int) -> np.ndarray:
        """Arena slot per block for one operand: -1 where the operand has no
        payload there.  ``full_as``: what a FULL block maps to (-1 = identity
        — used when FULL was already resolved by the planner)."""
        v = self.vectors[vector_index]
        st, slot = v._struct.lookup(blocklist)
        out = np.where(st == 2, slot + self.row_offset[vector_index], -1)
        if full_as >= 0:
            out = np.where(st == 1, full_as, out)
        return out.astype(np.int32)

    def slots_matrix(self, indices, blocklist) -> np.ndarray:
        return np.stack([self.slot_row(i, blocklist, -1) for i in indices])
