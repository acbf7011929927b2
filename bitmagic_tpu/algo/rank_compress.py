"""Rank-Select space compression of one bit-vector by an index bit-vector.

Equivalent of `bm::rank_compressor<BV>` (src/bmalgo.h:452-647):

  * compress(src, index): bit i of src (where index[i] is set) moves to
    position rank_index(i) - 1 — dropping all positions not covered by the
    index;
  * decompress: the inverse scatter.

TPU formulation: both directions are one batched rank/select pass over the
set-bit lists — no per-bit loops.
"""

from __future__ import annotations

from ..core.bitvector import BitVector


def compress(src: BitVector, index: BitVector) -> BitVector:
    """Rank-compress src by index (reference rank_compressor::compress,
    src/bmalgo.h:471)."""
    hits = (src & index).indices()          # positions present in both
    if hits.size == 0:
        return BitVector(index.count())
    rs = index.build_rs_index()
    ranks = rs.rank_batch(hits)             # 1-based ranks within index
    return BitVector.from_indices(ranks - 1, max(int(index.count()), 1))


def compress_by_source(src: BitVector, index: BitVector) -> BitVector:
    """Same result, different reference algorithm choice
    (src/bmalgo.h:540); provided for API parity."""
    return compress(src, index)


def decompress(src: BitVector, index: BitVector) -> BitVector:
    """Inverse: bit r of src moves to select(r+1) of index
    (reference rank_compressor::decompress, src/bmalgo.h:595)."""
    ranks = src.indices() + 1
    if ranks.size == 0:
        return BitVector(index.size)
    rs = index.build_rs_index()
    pos = rs.select_batch(ranks)
    pos = pos[pos >= 0]
    return BitVector.from_indices(pos, index.size)
