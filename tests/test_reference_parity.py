"""Bit-for-bit parity against fixtures produced by the REFERENCE
implementation (tools/make_fixtures.cpp, compiled against the reference
headers).  BASELINE acceptance: logical/rank/select results must match the
reference exactly on identical inputs."""
import os
import struct

import numpy as np
import pytest

from bitmagic_tpu import BitVector

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
SIZE = 100_000_000

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIX, "expected.bin")),
    reason="fixtures not generated (tools/make_fixtures.cpp)")


def _read_u64s(f, n):
    return np.frombuffer(f.read(8 * n), "<u8").astype(np.int64)


@pytest.fixture(scope="module")
def vectors():
    with open(os.path.join(FIX, "inputs.bin"), "rb") as f:
        na = struct.unpack("<Q", f.read(8))[0]
        ia = _read_u64s(f, na)
        nb = struct.unpack("<Q", f.read(8))[0]
        ib = _read_u64s(f, nb)
    a = BitVector.from_indices(ia, SIZE)
    b = BitVector.from_indices(ib, SIZE)
    return a, b, ia, ib


@pytest.fixture(scope="module")
def expected():
    with open(os.path.join(FIX, "expected.bin"), "rb") as f:
        counts = _read_u64s(f, 6)
        nr = struct.unpack("<Q", f.read(8))[0]
        ranks = _read_u64s(f, 2 * nr).reshape(nr, 2)
        ns = struct.unpack("<Q", f.read(8))[0]
        sels = _read_u64s(f, 2 * ns).reshape(ns, 2)
        n_and = struct.unpack("<Q", f.read(8))[0]
        and_idx = _read_u64s(f, n_and)
    return dict(counts=counts, ranks=ranks, sels=sels, and_idx=and_idx)


def test_counts_match_reference(vectors, expected):
    a, b, ia, ib = vectors
    c = expected["counts"]
    assert a.count() == c[0]
    assert b.count() == c[1]
    from bitmagic_tpu import algo
    assert algo.count_and(a, b) == c[2]
    assert algo.count_or(a, b) == c[3]
    assert algo.count_xor(a, b) == c[4]
    assert algo.count_sub(a, b) == c[5]


def test_and_result_bit_for_bit(vectors, expected):
    a, b, *_ = vectors
    res = a & b
    np.testing.assert_array_equal(res.indices(), expected["and_idx"])


def test_rank_matches_reference(vectors, expected):
    a, *_ = vectors
    rs = a.build_rs_index()
    pos = expected["ranks"][:, 0]
    want = expected["ranks"][:, 1]
    np.testing.assert_array_equal(rs.rank_batch(pos), want)


def test_select_matches_reference(vectors, expected):
    a, *_ = vectors
    rs = a.build_rs_index()
    ranks = expected["sels"][:, 0]
    want = expected["sels"][:, 1]
    got = rs.select_batch(ranks)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# reference-format BLOB interop (via the native bridge)
# ---------------------------------------------------------------------------
from bitmagic_tpu.serial import refformat


@pytest.mark.skipif(not refformat.available(),
                    reason="reference bridge unavailable")
def test_reference_blob_decode(vectors):
    a, *_ = vectors
    with open(os.path.join(FIX, "blob_a.bin"), "rb") as f:
        blob = f.read()
    got = refformat.deserialize_reference_blob(blob)
    np.testing.assert_array_equal(got.indices(), a.indices())


@pytest.mark.skipif(not refformat.available(),
                    reason="reference bridge unavailable")
def test_reference_blob_write_roundtrip(vectors):
    a, *_ = vectors
    blob = refformat.serialize_reference_blob(a)
    back = refformat.deserialize_reference_blob(blob)
    assert back.equal(a)
    # and the reference itself must accept what we wrote
    lib = refformat.load()
    buf = np.frombuffer(blob, np.uint8)
    import ctypes
    assert lib.bmref_selfcheck(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))) == 1
