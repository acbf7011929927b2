"""Bit-sliced sparse_vector tests (reference TestSparseVector*,
tests/stress/t.cpp:27574+)."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.sv.sparse_vector import SparseVector

N = BITS_PER_BLOCK + 999


def test_import_roundtrip_u32(rng):
    vals = rng.integers(0, 2**31, N).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    assert len(sv) == N
    np.testing.assert_array_equal(sv.to_numpy(), vals)


def test_import_roundtrip_small_dtypes(rng):
    for dt in (np.uint8, np.uint16, np.uint64):
        hi = min(np.iinfo(dt).max, 2**40)
        vals = rng.integers(0, hi, 500).astype(dt)
        sv = SparseVector.from_array(vals)
        np.testing.assert_array_equal(sv.to_numpy(), vals)


def test_signed_values(rng):
    vals = rng.integers(-2**30, 2**30, 1000).astype(np.int32)
    sv = SparseVector.from_array(vals)
    np.testing.assert_array_equal(sv.to_numpy(), vals)
    assert sv[0] == vals[0]


def test_single_set_get(rng):
    sv = SparseVector(np.uint32)
    sv.set(5, 42)
    sv.set(100000, 7)
    sv[3] = 9
    assert sv[5] == 42
    assert sv[100000] == 7
    assert sv[3] == 9
    assert sv[4] == 0
    assert len(sv) == 100001
    sv.inc(5)
    assert sv[5] == 43
    sv.add(3, 10)
    assert sv[3] == 19


def test_gather_decode(rng):
    vals = rng.integers(0, 2**20, N).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    ids = rng.integers(0, N, 300)
    np.testing.assert_array_equal(sv.gather(ids), vals[ids])
    lo = N // 3
    np.testing.assert_array_equal(sv.decode(lo, 500), vals[lo:lo + 500])


def test_nullable(rng):
    vals = rng.integers(1, 1000, 200).astype(np.uint32)
    nulls = rng.random(200) < 0.3
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nulls)
    for i in range(200):
        assert sv.is_null(i) == bool(nulls[i])
    got = sv.to_numpy()
    want = np.where(nulls, 0, vals)
    np.testing.assert_array_equal(got, want)
    sv.set_null(0)
    assert sv.is_null(0)
    sv.set(0, 5)
    assert not sv.is_null(0)
    assert sv[0] == 5


def test_import_at_offset_overwrites(rng):
    vals = rng.integers(0, 2**16, 1000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    patch = rng.integers(0, 2**16, 128).astype(np.uint32)
    sv.import_values(patch, offset=256)   # 32-aligned
    want = vals.copy(); want[256:384] = patch
    np.testing.assert_array_equal(sv.to_numpy(), want)
    patch2 = rng.integers(0, 2**16, 50).astype(np.uint32)
    sv.import_values(patch2, offset=101)  # unaligned
    want[101:151] = patch2
    np.testing.assert_array_equal(sv.to_numpy(), want)


def test_import_back_extend(rng):
    a = rng.integers(0, 99, 100).astype(np.uint32)
    b = rng.integers(0, 99, 77).astype(np.uint32)
    sv = SparseVector.from_array(a)
    sv.import_back(b)
    np.testing.assert_array_equal(sv.to_numpy(), np.concatenate([a, b]))


def test_join_merge_filter_clear(rng):
    a = SparseVector(np.uint32, nullable=True)
    b = SparseVector(np.uint32, nullable=True)
    a.set(1, 10); a.set(3, 30)
    b.set(2, 20); b.set(3, 99); b.set(5, 50)
    a.join(b)
    # join is a plane-wise OR (src/bmsparsevec.h:2186): overlapping
    # assigned values combine bitwise
    assert a[1] == 10 and a[2] == 20 and a[3] == (30 | 99) and a[5] == 50
    assert len(a) == 6
    c = SparseVector(np.uint32, nullable=True)
    c.set(0, 1)
    c.merge(b)
    assert c[2] == 20 and len(b) == 0
    vals = rng.integers(1, 100, 100).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    keep = BitVector.from_indices(np.arange(0, 100, 2), 2**48)
    sv.filter(keep)
    want = vals.copy(); want[1::2] = 0
    np.testing.assert_array_equal(sv.to_numpy(), want)
    sv.clear_range(0, 10)
    want[:11] = 0
    np.testing.assert_array_equal(sv.to_numpy(), want)


def test_resize_equal_stat(rng):
    vals = rng.integers(0, 2**10, 300).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    sv2 = SparseVector.from_array(vals)
    assert sv.equal(sv2)
    sv2.set(5, sv2[5] + 1)
    assert not sv.equal(sv2)
    sv.resize(100)
    np.testing.assert_array_equal(sv.to_numpy(), vals[:100])
    sv.optimize()
    st = sv.calc_stat()
    assert st["planes"] >= 1
    assert sv.effective_slices() <= 10


def test_sv_insert_erase_copy_range(rng):
    vals = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True)
    sv.insert(500, 77777)
    ref = np.insert(vals, 500, 77777)
    assert np.array_equal(sv.to_numpy()[:len(ref)], ref)
    assert len(sv) == 1001
    sv.erase(500)
    assert np.array_equal(sv.to_numpy()[:len(vals)], vals)
    assert len(sv) == 1000
    # copy_range
    dst = SparseVector(np.uint32, nullable=True)
    dst.copy_range(sv, 100, 199)
    a = dst.to_numpy()
    assert np.array_equal(a[100:200], vals[100:200])
    assert not a[:100].any() and not a[200:1000].any()
    # reference-name helpers
    assert sv.at(0) == vals[0]
    with pytest.raises(IndexError):
        sv.at(5000)
    assert not sv.empty() and sv.effective_size() == 1000
    assert not sv.is_compressed() and not sv.is_str()


def test_str_insert_erase_prefix(rng):
    from bitmagic_tpu.sv import StrSparseVector
    strs = [f"w{int(x):04d}" for x in rng.integers(0, 9999, 200)]
    ssv = StrSparseVector.from_strings(strs)
    ssv.insert(50, "hello")
    assert ssv.get(50) == "hello" and ssv.get(51) == strs[50]
    ssv.erase(50)
    assert ssv.get(50) == strs[50] and len(ssv) == 200
    ssv.assign(0, "abcXY")
    ssv.set(1, "abcDE")
    assert ssv.common_prefix_length(0, 1) == 3
    assert ssv.decode(10, 3) == strs[10:13]
    assert ssv.is_str() and not ssv.is_compressed()


def test_rsc_reference_aliases(rng):
    from bitmagic_tpu.sv import RSCSparseVector
    vals = rng.integers(1, 1 << 16, 500).astype(np.uint32)
    mask = rng.random(500) < 0.5
    arr = vals.copy()
    arr[mask] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=mask)
    rsc = RSCSparseVector(np.uint32)
    rsc.load_from(sv)
    rsc.construct_rs_index()
    assert rsc.is_sync()
    assert rsc.is_compressed() and not rsc.is_str()
    i = int(np.flatnonzero(~mask)[0])
    assert int(rsc.get(i)) == int(vals[i])


def test_sv_stress_optimize_serialize_scan(rng):
    """Randomized walk over a succinct vector: optimize (GAP-resident
    planes), grouped serialization round-trips, scans and point access all
    interleave; values checked against a plain numpy array."""
    from bitmagic_tpu.serial.sv_serial import (sparse_vector_deserialize,
                                               sparse_vector_serialize)
    from bitmagic_tpu.sv.scanner import scanner
    n = 300_000
    vals = np.zeros(n, np.uint32)
    nz = rng.integers(0, n, 20_000)
    vals[nz] = rng.integers(1, 500, nz.size)
    sv = SparseVector.from_array(vals, nullable=True)
    for step in range(8):
        op = step % 4
        if op == 0:
            sv.optimize()
        elif op == 1:
            sv = sparse_vector_deserialize(sparse_vector_serialize(sv))
        elif op == 2:
            v = int(rng.integers(1, 500))
            hits = scanner.find_eq(sv, v)
            np.testing.assert_array_equal(
                np.asarray(hits.indices()), np.flatnonzero(vals == v))
        else:
            ids = rng.integers(0, n, 200)
            np.testing.assert_array_equal(sv.gather(ids), vals[ids])
            i = int(rng.integers(0, n))
            w = int(rng.integers(0, 500))
            sv.set(i, w)
            vals[i] = w
    np.testing.assert_array_equal(
        sv.gather(np.arange(0, n, 97)), vals[::97])
