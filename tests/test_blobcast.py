"""BLOB broadcast/gather helpers (parallel/blobcast.py) — the DCN
communication story: compressed bytes on the wire, never dense bitmaps.
Single-process semantics here; the true cross-process path runs in
tools/multihost_check.py (CI) over jax.distributed/Gloo.
"""
import numpy as np

import bitmagic_tpu as bm
from bitmagic_tpu.parallel import (all_gather_blobs, broadcast_bitvector,
                                   broadcast_bytes, broadcast_sparse_vector,
                                   merge_broadcast_parts)
from bitmagic_tpu.serial.serializer import Serializer
from bitmagic_tpu.sv import SparseVector


def test_broadcast_bytes_identity():
    assert broadcast_bytes(b"abc\x00\xff") == b"abc\x00\xff"


def test_broadcast_bitvector_roundtrip():
    rng = np.random.default_rng(1)
    ids = np.unique(rng.integers(0, 2**34, 5000)).astype(np.int64)
    bv = bm.BitVector.from_indices(ids, 2**34)
    bv.set_range(100_000, 200_000)
    bv.optimize()
    got = broadcast_bitvector(bv)
    assert got == bv
    # received vector is host-resident (no device transfer yet)
    assert got._pool_np is not None


def test_partition_merge_pattern():
    rng = np.random.default_rng(2)
    size = 10_000_000
    parts = [bm.BitVector.from_indices(
        np.unique(rng.integers(i * 2_500_000, (i + 1) * 2_500_000, 3000)),
        size) for i in range(4)]
    blobs = [Serializer(6).serialize(p) for p in parts]
    merged = merge_broadcast_parts(blobs)
    want = parts[0]
    for p in parts[1:]:
        want = want | p
    assert merged == want
    assert all_gather_blobs(blobs[0]) == [blobs[0]]


def test_broadcast_sparse_vector():
    vals = np.arange(5000, dtype=np.uint32) * 7
    sv = SparseVector.from_array(vals, nullable=True)
    got = broadcast_sparse_vector(sv)
    assert got.equal(sv)
