"""Scanner API parity extras: find_eq_str_prefix, find_nonnegative,
set_and_mask, and the float ge/le/range family (reference
src/bmsparsevec_algo.h:920, :1001-1073, :1124), plus the mesh-scale
prefix search.  Every result is checked against a numpy brute force.
"""
import numpy as np
import pytest

import bitmagic_tpu.constants as C
from bitmagic_tpu.core.bitvector import BitVector
from bitmagic_tpu.sv.float_vector import FloatSparseVector
from bitmagic_tpu.sv.scanner import SparseVectorScanner
from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.str_vector import StrSparseVector

sc = SparseVectorScanner()


def _idx(bv):
    return set(int(i) for i in np.asarray(bv.indices()))


# ---------------------------------------------------------------------------
# find_nonnegative
# ---------------------------------------------------------------------------
def test_find_nonnegative_signed():
    rng = np.random.default_rng(7)
    vals = rng.integers(-100, 100, 3000).astype(np.int32)
    sv = SparseVector.from_array(vals)
    want = set(np.flatnonzero(vals >= 0).tolist())
    assert _idx(sc.find_nonnegative(sv)) == want


def test_find_nonnegative_unsigned_is_universe():
    vals = np.arange(500, dtype=np.uint32)
    sv = SparseVector.from_array(vals)
    assert _idx(sc.find_nonnegative(sv)) == set(range(500))


def test_find_nonnegative_includes_nulls():
    # reference find_nonnegative_no_mask does NOT null-correct: NULL
    # positions read 0 which is non-negative
    vals = np.asarray([-5, 3, -1, 7], np.int32)
    mask = np.asarray([False, True, False, False])   # position 1 is NULL
    sv = SparseVector.from_array(vals, nullable=True, null_mask=mask)
    assert _idx(sc.find_nonnegative(sv)) == {1, 3}


# ---------------------------------------------------------------------------
# find_eq_str_prefix
# ---------------------------------------------------------------------------
WORDS = ["alpha", "alp", "alpine", "beta", "al", "gamma", "alphas",
         "", "alpaca", "b", "alpha"]


def _prefix_want(words, p):
    return set(i for i, w in enumerate(words) if w.startswith(p))


@pytest.mark.parametrize("remap", [False, True])
@pytest.mark.parametrize("p", ["al", "alpha", "alp", "b", "z", "alphas",
                               "alpacaX"])
def test_find_eq_str_prefix(remap, p):
    ssv = StrSparseVector.from_strings(WORDS, max_str_size=8)
    if remap:
        ssv.remap()
    assert _idx(sc.find_eq_str_prefix(ssv, p)) == _prefix_want(WORDS, p)


def test_find_eq_str_prefix_empty_query_is_exact_empty():
    # reference routes "" to find_zero: only empty-string elements match
    ssv = StrSparseVector.from_strings(WORDS, max_str_size=8)
    assert _idx(sc.find_eq_str_prefix(ssv, "")) == {7}


def test_find_eq_str_prefix_longer_than_storable():
    ssv = StrSparseVector.from_strings(["abc", "abcd"], max_str_size=4)
    assert _idx(sc.find_eq_str_prefix(ssv, "abcde")) == set()


def test_find_eq_str_prefix_nullable():
    ssv = StrSparseVector.from_strings(["foo", "foobar"], max_str_size=8,
                                       nullable=True)
    ssv.push_back("fool")
    ssv.set_null(0)
    assert _idx(sc.find_eq_str_prefix(ssv, "foo")) == {1, 2}


# ---------------------------------------------------------------------------
# set_and_mask
# ---------------------------------------------------------------------------
def test_set_and_mask_applies_and_resets():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, 4000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    mask = BitVector(C.ID_MAX48)
    mask.set_range(1000, 2999)
    s = SparseVectorScanner()
    s.set_and_mask(mask)
    try:
        got = _idx(s.find_eq(sv, 7))
        want = set(i for i in np.flatnonzero(vals == 7).tolist()
                   if 1000 <= i <= 2999)
        assert got == want
        # composed searches mask exactly once, at the top
        got_lt = _idx(s.find_lt(sv, 5))
        want_lt = set(i for i in np.flatnonzero(vals < 5).tolist()
                      if 1000 <= i <= 2999)
        assert got_lt == want_lt
    finally:
        s.reset_and_mask()
    assert _idx(s.find_eq(sv, 7)) == set(np.flatnonzero(vals == 7).tolist())


def test_set_and_mask_str_and_counts():
    ssv = StrSparseVector.from_strings(WORDS, max_str_size=8)
    mask = BitVector(C.ID_MAX48)
    mask.set_many(np.asarray([0, 1, 2, 3], np.int64))
    s = SparseVectorScanner()
    s.set_and_mask(mask)
    assert _idx(s.find_eq_str(ssv, "alpha")) == {0}
    assert s.find_eq_str_count(ssv, "alpha") == 1
    assert _idx(s.find_eq_str_prefix(ssv, "al")) == {0, 1, 2}


# ---------------------------------------------------------------------------
# find_first_eq / find_first_eq_str (early-exit first-hit search)
# ---------------------------------------------------------------------------
def test_find_first_eq():
    rng = np.random.default_rng(23)
    vals = rng.integers(-40, 40, 5000).astype(np.int32)
    sv = SparseVector.from_array(vals)
    s = SparseVectorScanner()
    for q in [0, 7, -7, 39, -40, 1000]:
        hits = np.flatnonzero(vals == q)
        assert s.find_first_eq(sv, q) == (int(hits[0]) if hits.size else -1)
    mask = BitVector(C.ID_MAX48)
    mask.set_range(2500, 4999)
    s.set_and_mask(mask)
    hits = np.flatnonzero(vals[2500:] == 7)
    assert s.find_first_eq(sv, 7) == (2500 + int(hits[0]) if hits.size
                                      else -1)


def test_find_first_eq_str():
    ssv = StrSparseVector.from_strings(WORDS, max_str_size=8)
    ssv.remap()
    s = SparseVectorScanner()
    assert s.find_first_eq_str(ssv, "alpha") == 0
    assert s.find_first_eq_str(ssv, "alp") == 1
    assert s.find_first_eq_str(ssv, "zeta") == -1
    assert s.find_first_eq_str(ssv, "") == 7
    mask = BitVector(C.ID_MAX48)
    mask.set_range(5, 100)
    s.set_and_mask(mask)
    assert s.find_first_eq_str(ssv, "alpha") == 10


# ---------------------------------------------------------------------------
# float ge / le / range / range_unbounded
# ---------------------------------------------------------------------------
FVALS = np.asarray([0.0, -0.0, 1.5, -1.5, 2.25, -2.25, 7.0, -7.0,
                    0.125, -0.125, 3.5, 1.5], np.float32)


def _fv():
    return FloatSparseVector.from_array(FVALS)


@pytest.mark.parametrize("q", [0.0, -0.0, 1.5, -1.5, 2.25, -3.0, 10.0,
                               -10.0])
def test_float_ge_le(q):
    fv = _fv()
    assert _idx(sc.find_ge_float(fv, q)) == \
        set(np.flatnonzero(FVALS >= q).tolist())
    assert _idx(sc.find_le_float(fv, q)) == \
        set(np.flatnonzero(FVALS <= q).tolist())


@pytest.mark.parametrize("lo,hi", [(-2.25, 1.5), (1.5, -2.25), (0.0, 0.0),
                                   (-100.0, 100.0), (3.0, 5.0)])
def test_float_range_closed_and_open(lo, hi):
    fv = _fv()
    a, b = (lo, hi) if lo <= hi else (hi, lo)
    got = _idx(sc.find_range_float(fv, lo, hi))
    assert got == set(np.flatnonzero((FVALS >= a) & (FVALS <= b)).tolist())
    got_open = _idx(sc.find_range_float_unbounded(fv, lo, hi))
    assert got_open == set(
        np.flatnonzero((FVALS > a) & (FVALS < b)).tolist())


def test_float_range_nullable_and_mask():
    fv = FloatSparseVector.from_array(FVALS, nullable=True)
    fv.set_null(2)                           # 1.5 at index 2 is NULL
    got = _idx(sc.find_ge_float(fv, 1.0))
    want = set(i for i in np.flatnonzero(FVALS >= 1.0).tolist() if i != 2)
    assert got == want
    s = SparseVectorScanner()
    m = BitVector(C.ID_MAX48)
    m.set_range(0, 5)
    s.set_and_mask(m)
    got = _idx(s.find_range_float(fv, -3.0, 3.0))
    want = set(i for i in np.flatnonzero(
        (FVALS >= -3.0) & (FVALS <= 3.0)).tolist() if i <= 5 and i != 2)
    assert got == want


# ---------------------------------------------------------------------------
# mesh-scale prefix search
# ---------------------------------------------------------------------------
def test_sharded_find_eq_str_prefix():
    from bitmagic_tpu.parallel.mesh import make_mesh
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    rng = np.random.default_rng(3)
    pool = ["alpha", "alp", "alpine", "beta", "al", "gamma", "", "delta",
            "alphas", "be"]
    words = [pool[i] for i in rng.integers(0, len(pool),
                                           2 * C.BITS_PER_BLOCK + 777)]
    ssv = StrSparseVector.from_strings(words, max_str_size=8)
    ssv.remap()
    sbv = ShardedStrSparseVector.from_str_vector(ssv, make_mesh(8))
    for p in ["al", "alpha", "be", "z"]:
        got = set(np.asarray(
            sbv.find_eq_str_prefix(p).to_bitvector().indices()).tolist())
        assert got == _prefix_want(words, p), p
    # empty prefix degrades to the exact empty-string search (reference
    # ``if (*str)`` branch), matching the single-host scanner
    got = set(np.asarray(
        sbv.find_eq_str_prefix("").to_bitvector().indices()).tolist())
    assert got == set(i for i, w in enumerate(words) if w == "")
