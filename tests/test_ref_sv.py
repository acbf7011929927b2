"""Reference sparse-vector BLOB format interop (serial/ref_sv.py).

Fixture BLOBs come from the reference's own sparse_vector_serializer
(tools/make_refblob_fixtures.py); bridge tests additionally round-trip our
writer's output through the reference reader.
"""
import json
import os

import numpy as np
import pytest

from bitmagic_tpu.serial import ref_sv, refformat
from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
from bitmagic_tpu.sv.sparse_vector import SparseVector

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refblobs")
HAVE = os.path.exists(os.path.join(FIX, "sv_inputs.npz"))

pytestmark = pytest.mark.skipif(not HAVE, reason="sv fixtures missing")

if HAVE:
    _IN = np.load(os.path.join(FIX, "sv_inputs.npz"))
    VALS, NOTNULL = _IN["vals"], _IN["notnull"].astype(bool)
    IDX = np.flatnonzero(NOTNULL).astype(np.int64)


def _blob(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", ["sv_plain.bin", "sv_xor.bin"])
def test_reference_sv_fixture_decodes(name):
    sv = ref_sv.deserialize_sv_blob(_blob(name), np.uint32)
    assert sv.size == len(VALS)
    got = np.asarray(sv.gather(IDX), np.uint32)
    assert np.array_equal(got, VALS[IDX])
    nn = np.zeros(len(VALS), bool)
    nz = sv.null_plane.indices()
    nn[nz[nz < len(VALS)]] = True
    assert np.array_equal(nn, NOTNULL)


def test_reference_rsc_fixture_decodes():
    rsc = ref_sv.deserialize_rsc_blob(_blob("rsc.bin"), np.uint32)
    got = np.asarray(rsc.gather(IDX), np.uint32)
    assert np.array_equal(got, VALS[IDX])


def test_sv_roundtrip_standalone():
    rng = np.random.default_rng(4)
    n = 60_000
    vals = rng.integers(0, 1 << 16, n).astype(np.uint32)
    nn = rng.random(n) > 0.5
    arr = vals.copy()
    arr[~nn] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=~nn)
    blob = ref_sv.serialize_sv_blob(sv)
    back = ref_sv.deserialize_sv_blob(blob, np.uint32)
    idx = np.flatnonzero(nn).astype(np.int64)
    assert np.array_equal(np.asarray(back.gather(idx), np.uint32), vals[idx])
    assert back.size == n


def test_rsc_roundtrip_standalone():
    rng = np.random.default_rng(6)
    n = 50_000
    vals = rng.integers(0, 1 << 16, n).astype(np.uint32)
    nn = rng.random(n) > 0.7
    nn[-1] = True
    arr = vals.copy()
    arr[~nn] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=~nn)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    blob = ref_sv.serialize_rsc_blob(rsc)
    back = ref_sv.deserialize_rsc_blob(blob, np.uint32)
    idx = np.flatnonzero(nn).astype(np.int64)
    assert np.array_equal(np.asarray(back.gather(idx), np.uint32), vals[idx])


def test_empty_sv_blob():
    sv = SparseVector(np.uint32, nullable=True)
    blob = ref_sv.serialize_sv_blob(sv)
    assert blob == b"BZ"
    back = ref_sv.deserialize_sv_blob(blob)
    assert back.size == 0


bridge = pytest.mark.skipif(not refformat.available(),
                            reason="reference bridge unavailable")


@bridge
def test_reference_reads_our_sv_blob():
    rng = np.random.default_rng(8)
    n = 40_000
    vals = rng.integers(0, 1 << 20, n).astype(np.uint32)
    nn = rng.random(n) > 0.4
    arr = vals.copy()
    arr[~nn] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=~nn)
    rv, rm = refformat.deserialize_reference_sv(ref_sv.serialize_sv_blob(sv))
    assert np.array_equal(rm, nn)
    assert np.array_equal(rv[nn], vals[nn])


def test_sv_xor_planes_shrink_and_roundtrip():
    rng = np.random.default_rng(14)
    # few distinct magnitudes -> strongly correlated bit-slices
    vals = (rng.integers(0, 4, 200_000).astype(np.uint32) * 0x0F0F0F0) | 1
    sv = SparseVector.from_array(vals, nullable=True)
    plain = ref_sv.serialize_sv_blob(sv, xor_refs=False)
    xored = ref_sv.serialize_sv_blob(sv, xor_refs=True)
    assert len(xored) < len(plain) // 2
    back = ref_sv.deserialize_sv_blob(xored)
    assert np.array_equal(back.to_numpy()[:len(vals)], vals)


@bridge
def test_reference_reads_our_xor_sv_blob():
    rng = np.random.default_rng(15)
    vals = (rng.integers(0, 4, 120_000).astype(np.uint32) * 0x0F0F0F0) | 1
    sv = SparseVector.from_array(vals, nullable=True)
    blob = ref_sv.serialize_sv_blob(sv, xor_refs=True)
    rv, rm = refformat.deserialize_reference_sv(blob)
    assert np.array_equal(np.asarray(rv, np.uint32)[:len(vals)], vals)
    assert rm[:len(vals)].all()


@bridge
def test_reference_reads_our_rsc_blob():
    rng = np.random.default_rng(10)
    n = 30_000
    vals = rng.integers(0, 1 << 20, n).astype(np.uint32)
    nn = rng.random(n) > 0.6
    nn[-1] = True
    arr = vals.copy()
    arr[~nn] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=~nn)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    rv, rm = refformat.deserialize_reference_rsc(
        ref_sv.serialize_rsc_blob(rsc))
    assert np.array_equal(rm, nn)
    assert np.array_equal(rv[nn], vals[nn])


# ---------------------------------------------------------------------------
# string sparse vectors
# ---------------------------------------------------------------------------
HAVE_STR = os.path.exists(os.path.join(FIX, "str_inputs.npz"))

if HAVE_STR:
    _SIN = np.load(os.path.join(FIX, "str_inputs.npz"), allow_pickle=True)
    STRINGS = [s or None for s in _SIN["strings"].tolist()]


@pytest.mark.skipif(not HAVE_STR, reason="str fixtures missing")
@pytest.mark.parametrize("name", ["strsv_plain.bin", "strsv_remap.bin"])
def test_reference_str_fixture_decodes(name):
    ssv = ref_sv.deserialize_str_blob(_blob(name))
    got = [g or None for g in ssv.to_list()]
    assert got == STRINGS


@pytest.mark.skipif(not HAVE_STR, reason="str fixtures missing")
def test_str_roundtrip_standalone():
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    sub = STRINGS[:5000]
    ssv = StrSparseVector.from_strings([s or "" for s in sub],
                                       nullable=True)
    for i, s in enumerate(sub):
        if not s:
            ssv.set_null(i)
    for do_remap in (False, True):
        if do_remap:
            ssv.remap()
        blob = ref_sv.serialize_str_blob(ssv)
        got = [g or None for g in
               ref_sv.deserialize_str_blob(blob).to_list()]
        assert got == sub, f"remap={do_remap}"


@bridge
@pytest.mark.skipif(not HAVE_STR, reason="str fixtures missing")
def test_reference_reads_our_str_blob():
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    sub = STRINGS[:5000]
    ssv = StrSparseVector.from_strings([s or "" for s in sub],
                                       nullable=True)
    for i, s in enumerate(sub):
        if not s:
            ssv.set_null(i)
    ssv.remap()
    back = refformat.deserialize_reference_str(
        ref_sv.serialize_str_blob(ssv))
    assert [b or None for b in back] == sub


# ---------------------------------------------------------------------------
# float sparse vectors ('bf0' composite)
# ---------------------------------------------------------------------------
def test_float_roundtrip_standalone():
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    rng = np.random.default_rng(3)
    vals = (rng.standard_normal(20_000) * 100).astype(np.float32)
    vals[::11] = 0.0
    fv = FloatSparseVector.from_array(vals)
    blob = ref_sv.serialize_float_blob(fv)
    back = ref_sv.deserialize_float_blob(blob)
    assert np.array_equal(back.to_numpy()[:len(vals)], vals)


@bridge
def test_float_bridge_both_directions():
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    rng = np.random.default_rng(4)
    vals = (rng.standard_normal(30_000) * 1e4).astype(np.float32)
    vals[::7] *= -1
    blob = refformat.serialize_reference_float(vals)
    got = ref_sv.deserialize_float_blob(blob).to_numpy()[:len(vals)]
    assert np.array_equal(got, vals)
    fv = FloatSparseVector.from_array(vals)
    back = refformat.deserialize_reference_float(
        ref_sv.serialize_float_blob(fv))
    assert np.array_equal(back, vals)


def test_sv_blob_range_decode():
    rng = np.random.default_rng(31)
    n = 250_000
    vals = rng.integers(0, 1 << 20, n).astype(np.uint32)
    mask = rng.random(n) < 0.4
    arr = vals.copy()
    arr[mask] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=mask)
    blob = ref_sv.serialize_sv_blob(sv)
    lo, hi = 100_000, 140_000
    part = ref_sv.deserialize_sv_blob(blob, range_=(lo, hi))
    a = part.to_numpy()
    assert np.array_equal(a[lo:hi + 1], arr[lo:hi + 1])
    assert not a[:lo].any() and not a[hi + 1:n].any()

    from bitmagic_tpu.sv import RSCSparseVector
    rsc = RSCSparseVector.from_sparse_vector(sv)
    rblob = ref_sv.serialize_rsc_blob(rsc)
    rpart = ref_sv.deserialize_rsc_blob(rblob, range_=(lo, hi))
    idx = np.arange(lo, hi + 1)
    assert np.array_equal(np.asarray(rpart.gather(idx), np.uint32),
                          arr[lo:hi + 1])


def test_all_null_nullable_round_trip():
    """An all-NULL nullable vector round-trips through the ref format:
    the writer emits the EMPTY null row explicitly (digest bit + empty
    bvector blob) so the reader does not fall back to all-assigned
    (round-5 review finding: every position silently flipped to
    assigned-0)."""
    sv = SparseVector(np.uint32, nullable=True)
    sv.resize(100)
    back = ref_sv.deserialize_sv_blob(ref_sv.serialize_sv_blob(sv))
    assert back.is_null(0) and back.is_null(99)
    assert back.size == 100
    # fully-assigned and non-nullable vectors unchanged
    sv2 = SparseVector.from_array(np.arange(50, dtype=np.uint32))
    back2 = ref_sv.deserialize_sv_blob(ref_sv.serialize_sv_blob(sv2))
    assert not back2.is_null(3) and back2.get(3) == 3


def test_sv_blob_adversarial_hardening():
    """Round-5 hardening: implausible plane counts / string widths /
    remap row counts and digest wide-spans fail fast with ValueError."""
    import struct as _st
    # header with planes_code = 2^60 (would build 2^57 octet vectors)
    w = bytearray()
    w += b"BM"
    w += bytes([1, 0, 1])
    w += _st.pack("<Q", (1 << 60) | (1 << 63))
    w += _st.pack("<Q", 100)
    w += _st.pack("<Q", 40)          # digest offset (bogus)
    w += b"\x00" * 4
    with pytest.raises(ValueError):
        ref_sv.deserialize_str_blob(bytes(w) + b"\x00" * 64)
    with pytest.raises((ValueError, IndexError)):
        ref_sv.deserialize_sv_blob(bytes(w) + b"\x00" * 64)


def test_all_null_blob_reference_cross_check():
    """The reference's OWN decoder reads our empty-null-row blob as
    all-NULL (assigned mask all False) — the disambiguation stays
    reference-readable."""
    if not refformat.available():
        pytest.skip("reference bridge unavailable")
    sv = SparseVector(np.uint32, nullable=True)
    sv.resize(100)
    blob = ref_sv.serialize_sv_blob(sv)
    vals, assigned = refformat.deserialize_reference_sv(blob)
    assert len(assigned) == 100 and not assigned.any()
    assert (vals == 0).all()
