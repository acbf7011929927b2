"""Succinct-vector serialization + operation deserializer tests (reference
sparse vector serialization suites + Check_SimModel/XOR tests in
tests/stress/t.cpp:17365+)."""
import numpy as np
import pytest

import bitmagic_tpu.constants as C
from bitmagic_tpu import BitVector
from bitmagic_tpu.serial.opdeser import OperationDeserializer
from bitmagic_tpu.serial.serializer import Serializer
from bitmagic_tpu.serial.sv_serial import (sparse_vector_deserialize,
                                           sparse_vector_serialize)
from bitmagic_tpu.sv import (FloatSparseVector, RSCSparseVector, SparseVector,
                             StrSparseVector)
from bitmagic_tpu.utils.golden import random_indices


def test_sv_blob_roundtrip(rng):
    vals = rng.integers(0, 2**20, 30000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    blob = sparse_vector_serialize(sv)
    back = sparse_vector_deserialize(blob)
    np.testing.assert_array_equal(back.to_numpy(), vals)
    assert back.dtype == sv.dtype


def test_sv_blob_signed_nullable(rng):
    vals = rng.integers(-1000, 1000, 5000).astype(np.int32)
    nulls = rng.random(5000) < 0.4
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nulls)
    back = sparse_vector_deserialize(sparse_vector_serialize(sv))
    np.testing.assert_array_equal(back.to_numpy(), np.where(nulls, 0, vals))
    for i in rng.integers(0, 5000, 20):
        assert back.is_null(int(i)) == bool(nulls[i])


def test_sv_xor_filter_helps_correlated(rng):
    """correlated planes: XOR ref filter must shrink the BLOB and round-trip."""
    base = rng.integers(0, 2, 60000).astype(np.uint32)
    vals = base * 0b1111111      # planes 0..6 all identical
    sv = SparseVector.from_array(vals)
    from bitmagic_tpu.serial.sv_serial import SparseVectorSerializer
    b_on = SparseVectorSerializer(6, xor_filter=True).serialize(sv)
    b_off = SparseVectorSerializer(6, xor_filter=False).serialize(sv)
    assert len(b_on) < len(b_off) // 2
    back = sparse_vector_deserialize(b_on)
    np.testing.assert_array_equal(back.to_numpy(), vals)


def test_rsc_blob_roundtrip(rng):
    rsc = RSCSparseVector(np.uint32)
    for i in sorted(rng.choice(10000, 500, replace=False)):
        rsc.set(int(i), int(rng.integers(1, 10**6)))
    back = sparse_vector_deserialize(sparse_vector_serialize(rsc))
    assert back.count() == rsc.count()
    np.testing.assert_array_equal(back.to_numpy(), rsc.to_numpy())


def test_str_blob_roundtrip(rng):
    words = ["hello", "world", "", "bitmagic", None, "tpu"]
    ssv = StrSparseVector.from_strings(words)
    back = sparse_vector_deserialize(sparse_vector_serialize(ssv))
    assert back.to_list() == words
    ssv2 = StrSparseVector.from_strings([w for w in words if w is not None])
    ssv2.remap()
    back2 = sparse_vector_deserialize(sparse_vector_serialize(ssv2))
    assert back2.is_remap()
    assert back2.to_list() == [w for w in words if w is not None]


def test_float_blob_roundtrip(rng):
    vals = (rng.standard_normal(2000) * 100).astype(np.float32)
    fv = FloatSparseVector.from_array(vals)
    back = sparse_vector_deserialize(sparse_vector_serialize(fv))
    np.testing.assert_array_equal(back.to_numpy().view(np.uint32),
                                  vals.view(np.uint32))


def test_operation_deserializer(rng):
    SIZE = 3 * C.BITS_PER_BLOCK
    a_idx = random_indices(rng, SIZE, 0.02)
    b_idx = random_indices(rng, SIZE, 0.02)
    a = BitVector.from_indices(a_idx, SIZE)
    b = BitVector.from_indices(b_idx, SIZE)
    blob = Serializer(6).serialize(b)
    od = OperationDeserializer()
    am = np.zeros(SIZE, bool); am[a_idx] = True
    bm_ = np.zeros(SIZE, bool); bm_[b_idx] = True
    # counts without materializing
    assert od.deserialize(a.copy(), blob, C.SET_COUNT_AND) == (am & bm_).sum()
    assert od.deserialize(a.copy(), blob, C.SET_COUNT_OR) == (am | bm_).sum()
    assert od.deserialize(a.copy(), blob, C.SET_COUNT_XOR) == (am ^ bm_).sum()
    assert od.deserialize(a.copy(), blob, C.SET_COUNT_SUB_AB) == (am & ~bm_).sum()
    assert od.deserialize(a.copy(), blob, C.SET_COUNT_B) == bm_.sum()
    # in-place ops against the BLOB
    for op, fn in [(C.SET_AND, np.logical_and), (C.SET_OR, np.logical_or),
                   (C.SET_XOR, np.logical_xor)]:
        t = a.copy()
        od.deserialize(t, blob, op)
        np.testing.assert_array_equal(t.indices(), np.flatnonzero(fn(am, bm_)))
    t = a.copy()
    od.deserialize(t, blob, C.SET_SUB)
    np.testing.assert_array_equal(t.indices(), np.flatnonzero(am & ~bm_))


def test_compressed_collection_roundtrip():
    from bitmagic_tpu.serial.sv_serial import (
        deserialize_compressed_collection, serialize_compressed_collection)
    from bitmagic_tpu.sv.util import CompressedBufferCollection
    coll = CompressedBufferCollection()
    coll.push_back(10, b"alpha")
    coll.push_back(42, b"beta" * 50)
    coll.push_back(9_000_000, b"")
    coll.push_back(10_000_000, b"far")
    blob = serialize_compressed_collection(coll)
    back = deserialize_compressed_collection(blob)
    assert list(back.keys()) == [10, 42, 9_000_000, 10_000_000]
    assert back[42] == b"beta" * 50
    assert back[9_000_000] == b""
    assert 10 in back and 11 not in back


# ---------------------------------------------------------------------------
# range deserialization (reference deserialize_range, svsample08 /
# strsvsample05 / rscsample02)
# ---------------------------------------------------------------------------
def test_sv_range_deserialize(rng):
    from bitmagic_tpu.serial.sv_serial import SparseVectorDeserializer
    n = 300_000
    vals = rng.integers(0, 1 << 24, n).astype(np.uint32)
    mask = rng.random(n) < 0.3
    arr = vals.copy()
    arr[mask] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=mask)
    blob = sparse_vector_serialize(sv)
    lo, hi = 140_000, 160_000
    de = SparseVectorDeserializer()
    part = de.deserialize_range(blob, lo, hi)
    assert part._size == sv._size
    a = part.to_numpy()
    assert np.array_equal(a[lo:hi + 1], arr[lo:hi + 1])
    assert not a[:lo].any() and not a[hi + 1:n].any()
    with pytest.raises(ValueError):
        de.deserialize_range(blob, 10, 5)


def test_rsc_range_deserialize(rng):
    from bitmagic_tpu.serial.sv_serial import SparseVectorDeserializer
    n = 200_000
    vals = rng.integers(1, 1 << 20, n).astype(np.uint32)
    mask = rng.random(n) < 0.6                      # mostly NULL
    arr = vals.copy()
    arr[mask] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=mask)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    blob = sparse_vector_serialize(rsc)
    lo, hi = 77_000, 99_000
    part = SparseVectorDeserializer().deserialize_range(blob, lo, hi)
    idx = np.arange(lo, hi + 1)
    got = part.gather(idx)
    want = arr[lo:hi + 1].copy()
    assert np.array_equal(np.asarray(got, np.uint32), want)
    # everything outside the range is unassigned
    assert part.get_null_bvector().count() == int((~mask[lo:hi + 1]).sum())


def test_str_and_float_range_deserialize(rng):
    from bitmagic_tpu.serial.sv_serial import SparseVectorDeserializer
    de = SparseVectorDeserializer()
    strs = [f"k{int(x):05d}" for x in rng.integers(0, 99999, 20_000)]
    ssv = StrSparseVector.from_strings(strs)
    sblob = sparse_vector_serialize(ssv)
    part = de.deserialize_range(sblob, 500, 600)
    assert part.gather(np.arange(500, 601)) == strs[500:601]

    fvals = rng.normal(size=40_000).astype(np.float32)
    fv = FloatSparseVector.from_array(fvals)
    fpart = de.deserialize_range(sparse_vector_serialize(fv), 2000, 2100)
    assert np.array_equal(fpart.to_numpy()[2000:2101], fvals[2000:2101])


def test_gather_deserialize_all_families(rng):
    from bitmagic_tpu.serial.sv_serial import SparseVectorDeserializer
    de = SparseVectorDeserializer()
    n = 300_000
    arr = rng.integers(0, 1 << 22, n).astype(np.uint32)
    mask = rng.random(n) < 0.4
    arr[mask] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=mask)
    blob = sparse_vector_serialize(sv)
    ids = np.sort(rng.choice(n, 200, replace=False))
    part = de.deserialize_gather(blob, ids)
    assert np.array_equal(part.to_numpy()[ids], arr[ids])

    rsc = RSCSparseVector.from_sparse_vector(sv)
    rpart = de.deserialize_gather(sparse_vector_serialize(rsc), ids)
    assert np.array_equal(np.asarray(rpart.gather(ids), np.uint32),
                          arr[ids])

    strs = [f"s{int(x):06d}" for x in rng.integers(0, 999999, 20_000)]
    ssv = StrSparseVector.from_strings(strs)
    sids = np.sort(rng.choice(20_000, 30, replace=False))
    spart = de.deserialize_gather(sparse_vector_serialize(ssv), sids)
    assert spart.gather(sids) == [strs[i] for i in sids]

    fv = FloatSparseVector.from_array(
        rng.normal(size=40_000).astype(np.float32))
    fids = np.sort(rng.choice(40_000, 30, replace=False))
    fpart = de.deserialize_gather(sparse_vector_serialize(fv), fids)
    assert np.array_equal(fpart.to_numpy()[fids], fv.to_numpy()[fids])

    with pytest.raises(ValueError):
        de.deserialize_gather(blob, [])


def test_grouped_planes_compression_and_legacy():
    """v2 plane sections (block-level XOR groups, actual-size guarded):
    never larger than no-filter, and clearly smaller when bit-slices
    genuinely correlate; v1 (non-grouped) blobs still decode."""
    from bitmagic_tpu.serial.sv_serial import (SparseVectorSerializer,
                                               sparse_vector_deserialize,
                                               sparse_vector_serialize)
    rng = np.random.default_rng(5)
    n = 1_000_000
    vals = rng.integers(0, 1 << 10, n).astype(np.uint32)
    # make plane 10 a near-copy of plane 3: block-level deltas win big
    bit3 = (vals >> 3) & 1
    vals |= bit3 << 10
    flip = rng.integers(0, n, 200)
    vals[flip] ^= 1 << 10
    sv = SparseVector.from_array(vals, nullable=True)
    grouped = sparse_vector_serialize(sv)
    plain = SparseVectorSerializer(xor_filter=False).serialize(sv)
    assert len(grouped) < 0.95 * len(plain)       # correlated planes win
    assert sparse_vector_deserialize(grouped).equal(sv)
    assert sparse_vector_deserialize(plain).equal(sv)
    # the guard: on uncorrelated data grouped never exceeds plain
    vals2 = rng.integers(0, 1 << 16, n).astype(np.uint32)
    sv2 = SparseVector.from_array(vals2)
    g2 = sparse_vector_serialize(sv2)
    p2 = SparseVectorSerializer(xor_filter=False).serialize(sv2)
    assert len(g2) <= len(p2) + 64
