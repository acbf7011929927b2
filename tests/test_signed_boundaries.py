"""Signed-value boundary semantics: the s2u mapping must match the
reference's -(v+1) magnitude encoding (src/bmbmatrix.h:2294) so that
(a) dtype minimum round-trips (no uint64 overflow — fuzz finding:
find_gt(int64.min) answered like find_ge), (b) ordered searches are
exact at every dtype edge, and (c) signed planes are byte-compatible
with the reference BLOB format."""
import numpy as np
import pytest

from bitmagic_tpu.parallel.mesh import make_mesh
from bitmagic_tpu.parallel.sharded_sv import ShardedSparseVector
from bitmagic_tpu.serial import ref_sv, refformat, sv_serial
from bitmagic_tpu.sv.scanner import scanner
from bitmagic_tpu.sv.sparse_vector import SparseVector

DTYPES = [np.int8, np.int16, np.int32, np.int64]


def _edge_values(dt):
    info = np.iinfo(dt)
    return np.array([info.min, info.min + 1, -5, -1, 0, 1, 7,
                     info.max - 1, info.max, info.min, 3], dtype=dt)


@pytest.mark.parametrize("dt", DTYPES)
def test_s2u_roundtrip_at_edges(dt):
    vals = _edge_values(dt)
    sv = SparseVector.from_array(vals)
    assert sv.n_slices == np.iinfo(dt).bits  # reference slice layout
    got = np.asarray(sv.gather(np.arange(vals.size)))
    assert np.array_equal(got, vals)
    for i, v in enumerate(vals):
        assert sv.get(i) == v


@pytest.mark.parametrize("dt", DTYPES)
def test_ordered_search_at_edges(dt):
    info = np.iinfo(dt)
    vals = _edge_values(dt)
    sv = SparseVector.from_array(vals)
    v64 = vals.astype(object)
    queries = [info.min, info.min + 1, -1, 0, 1, info.max - 1, info.max,
               int(info.min) - 1, int(info.max) + 1, -(1 << 70), 1 << 70]
    for q in queries:
        for name, op in [("gt", lambda a, b: a > b),
                         ("ge", lambda a, b: a >= b),
                         ("lt", lambda a, b: a < b),
                         ("le", lambda a, b: a <= b)]:
            want = np.flatnonzero(op(v64, q))
            got = np.asarray(getattr(scanner, f"find_{name}")(sv, q)
                             .indices())
            assert np.array_equal(got, want), (dt, name, q)
        want_eq = np.flatnonzero(v64 == q)
        got_eq = np.asarray(scanner.find_eq(sv, q).indices())
        assert np.array_equal(got_eq, want_eq), (dt, "eq", q)


@pytest.mark.parametrize("dt", [np.int8, np.int64])
def test_sharded_ordered_search_at_edges(dt):
    info = np.iinfo(dt)
    vals = _edge_values(dt)
    ssv = ShardedSparseVector.from_sparse_vector(
        SparseVector.from_array(vals), make_mesh(8))
    v64 = vals.astype(object)
    for q in [info.min, info.min + 1, -1, 0, info.max,
              int(info.min) - 1, int(info.max) + 1]:
        for name, op in [("gt", lambda a, b: a > b),
                         ("ge", lambda a, b: a >= b),
                         ("le", lambda a, b: a <= b)]:
            want = np.flatnonzero(op(v64, q))
            got = np.asarray(getattr(ssv, f"find_{name}")(q)
                             .to_bitvector().indices())
            assert np.array_equal(got, want), (dt, name, q)


def test_bmt1_signed_roundtrip_with_min():
    rng = np.random.default_rng(11)
    vals = rng.integers(-10**12, 10**12, 20_000)
    info = np.iinfo(np.int64)
    vals[:4] = [info.min, info.max, -1, 0]
    sv = SparseVector.from_array(vals.astype(np.int64))
    blob = sv_serial.sparse_vector_serialize(sv)
    back = sv_serial.sparse_vector_deserialize(blob)
    got = np.asarray(back.gather(np.arange(vals.size)), np.int64)
    assert np.array_equal(got, vals)


def test_range_crossing_zero_and_min():
    vals = _edge_values(np.int32)
    sv = SparseVector.from_array(vals)
    info = np.iinfo(np.int32)
    v64 = vals.astype(np.int64)
    for lo, hi in [(info.min, info.min), (info.min, -1), (-1, 1),
                   (info.min, info.max), (0, info.max)]:
        want = np.flatnonzero((v64 >= lo) & (v64 <= hi))
        got = np.asarray(scanner.find_range(sv, lo, hi).indices())
        assert np.array_equal(got, want), (lo, hi)


bridge = pytest.mark.skipif(not refformat.available(),
                            reason="reference bridge unavailable")


@bridge
def test_reference_format_signed_interop_both_directions():
    info = np.iinfo(np.int64)
    rng = np.random.default_rng(7)
    vals = rng.integers(-10**12, 10**12, 30_000)
    vals[:8] = [info.min, info.min + 1, -1, 0, 1, info.max,
                info.max - 1, -5]
    nn = rng.random(vals.size) < 0.8
    nn[:8] = True
    vals = np.where(nn, vals, 0).astype(np.int64)
    # reference encodes -> we decode
    blob_ref = refformat.serialize_reference_sv_i64(vals, nn)
    sv = ref_sv.deserialize_sv_blob(blob_ref, np.int64)
    idx = np.flatnonzero(nn).astype(np.int64)
    assert np.array_equal(np.asarray(sv.gather(idx), np.int64), vals[idx])
    # we encode -> reference decodes
    sv2 = SparseVector.from_array(vals, nullable=True, null_mask=~nn)
    rv, rm = refformat.deserialize_reference_sv_i64(
        ref_sv.serialize_sv_blob(sv2))
    assert np.array_equal(rm[:vals.size], nn)
    assert np.array_equal(rv[:vals.size][nn], vals[nn])
