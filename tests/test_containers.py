"""RSC / string / float vector + utility container tests (reference
TestCompressSparseVector :42052, StressTestStrSparseVector :37254, float SV
suites in tests/stress/t.cpp)."""
import numpy as np
import pytest

from bitmagic_tpu.core.bitvector import BitVector
from bitmagic_tpu.sv import (AddressResolver, CompressedCollection,
                             FloatSparseVector, RSCSparseVector,
                             SparseVector, StrSparseVector, scanner)


# ---------------------------------------------------------------- RSC
def test_rsc_from_sv_roundtrip(rng):
    vals = rng.integers(1, 1000, 500).astype(np.uint32)
    nulls = rng.random(500) < 0.6
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nulls)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    assert rsc.count() == int((~nulls).sum())
    for i in list(rng.integers(0, 500, 30)):
        assert rsc.is_null(i) == bool(nulls[i])
        want = 0 if nulls[i] else vals[i]
        assert rsc[int(i)] == want
    np.testing.assert_array_equal(rsc.to_numpy(), np.where(nulls, 0, vals))
    back = rsc.load_to()
    np.testing.assert_array_equal(back.to_numpy(), np.where(nulls, 0, vals))


def test_rsc_set_get_push(rng):
    rsc = RSCSparseVector(np.uint32)
    rsc.set(10, 100)
    rsc.set(5, 50)
    rsc.push_back(7)          # at index 11
    assert rsc[5] == 50 and rsc[10] == 100 and rsc[11] == 7
    assert rsc.is_null(6)
    assert not rsc.is_null(5)
    assert rsc.count() == 3
    assert rsc.try_get(6) == (False, 0)
    rsc.inc(5)
    assert rsc[5] == 51
    rsc.set_null(5)
    assert rsc.is_null(5)
    assert rsc.count() == 2
    assert rsc.find_rank(1) == 10
    gathered = rsc.gather(np.asarray([5, 10, 11, 3]))
    np.testing.assert_array_equal(gathered, [0, 100, 7, 0])


def test_rsc_dense_and_equal(rng):
    vals = rng.integers(0, 100, 64).astype(np.uint32)
    a = RSCSparseVector(np.uint32)
    for i, v in enumerate(vals):
        a.push_back(v)
    assert a.is_dense()
    sv = SparseVector.from_array(vals, nullable=True,
                                 null_mask=np.zeros(64, bool))
    b = RSCSparseVector.from_sparse_vector(sv)
    assert a.equal(b)


# ---------------------------------------------------------------- strings
def test_str_vector_basic(rng):
    words = ["apple", "banana", "", "cherry", "apple", "date"]
    sv = StrSparseVector.from_strings(words)
    assert sv.to_list() == words
    assert sv[1] == "banana"
    assert sv.compare(0, "apple") == 0
    assert sv.compare(0, "apricot") == -1
    assert sv.compare(3, "banana") == 1
    sv.set(2, "kiwi")
    assert sv[2] == "kiwi"
    sv.push_back("elderberry" [:sv.max_str_size])
    assert len(sv) == 7


def test_str_vector_nullable():
    words = ["aa", None, "bb"]
    sv = StrSparseVector.from_strings(words)
    assert sv.is_null(1)
    assert sv.to_list() == words
    sv.set_null(0)
    assert sv.to_list()[0] is None


def test_str_vector_remap_roundtrip(rng):
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    words = ["".join(chr(c) for c in rng.choice(alphabet, 8)) for _ in range(200)]
    sv = StrSparseVector.from_strings(words)
    sv.remap()
    assert sv.is_remap()
    assert sv.to_list() == words
    # post-remap import still round-trips
    sv.push_back(words[0])
    assert sv[200] == words[0]


def test_find_eq_str(rng):
    words = ["abc", "abd", "xyz", "abc", "", "ab"]
    sv = StrSparseVector.from_strings(words)
    got = scanner.find_eq_str(sv, "abc").indices()
    np.testing.assert_array_equal(got[got < 6], [0, 3])
    got = scanner.find_eq_str(sv, "").indices()
    np.testing.assert_array_equal(got[got < 6], [4])
    assert scanner.find_eq_str(sv, "zzz").none()
    # after remap
    sv.remap()
    got = scanner.find_eq_str(sv, "abc").indices()
    np.testing.assert_array_equal(got[got < 6], [0, 3])
    assert scanner.find_eq_str(sv, "qqq").none()


def test_sorted_str_search():
    words = sorted(["apple", "banana", "cherry", "date", "fig"])
    sv = StrSparseVector.from_strings(words)
    assert scanner.bfind_eq_str(sv, "cherry") == 2
    assert scanner.bfind_eq_str(sv, "coconut") == -1
    assert scanner.lower_bound_str(sv, "b") == 1


# ---------------------------------------------------------------- floats
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_float_vector_roundtrip(rng, dtype):
    vals = (rng.standard_normal(300) * 1000).astype(dtype)
    vals[0] = 0.0
    vals[1] = -0.0
    vals[2] = np.inf
    vals[3] = -np.inf
    fv = FloatSparseVector.from_array(vals)
    got = fv.to_numpy()
    np.testing.assert_array_equal(
        got.view(fv._uint), vals.view(fv._uint))   # bit-exact incl -0.0
    assert fv[5] == vals[5]
    fv.set(5, dtype(3.25))
    assert fv[5] == dtype(3.25)
    fv.push_back(dtype(-1.5))
    assert fv[300] == dtype(-1.5)
    fv2 = FloatSparseVector.from_array(vals)
    fv3 = FloatSparseVector.from_array(vals)
    assert fv2.equal(fv3)
    assert not fv2.equal(fv)


# ---------------------------------------------------------------- util
def test_address_resolver():
    ar = AddressResolver()
    ar.set_many([10, 100, 1000])
    ar.sync()
    assert ar.resolve(10) == 1
    assert ar.resolve(100) == 2
    assert ar.resolve(1000) == 3
    assert ar.resolve(50) == 0
    np.testing.assert_array_equal(
        ar.resolve_batch([10, 50, 1000]), [1, 0, 3])
    assert ar.count() == 3


def test_compressed_collection():
    cc = CompressedCollection()
    cc.push_back(5, "five")
    cc.push_back(100, "hundred")
    with pytest.raises(ValueError):
        cc.push_back(50, "out of order")
    cc.sync()
    assert cc[5] == "five"
    assert cc[100] == "hundred"
    assert 5 in cc and 6 not in cc
    with pytest.raises(KeyError):
        cc.get(6)
    assert len(cc) == 2
    np.testing.assert_array_equal(cc.keys(), [5, 100])


def test_str_substr_mode():
    """Substring const_iterator mode: only the selected octet slices are
    decoded (reference bmstrsparsevec const_iterator substr)."""
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    strs = ["abcdef", "xy", "hello", ""]
    ssv = StrSparseVector.from_strings(strs, nullable=True)
    ssv.set_null(3)
    assert ssv.substr(0, 1, 3) == "bcd"
    assert ssv.substr(1, 1, 3) == "y"
    assert ssv.gather_substr([0, 1, 2, 3], 0, 2) == ["abc", "xy", "hel",
                                                     None]
    ssv.remap()
    assert ssv.substr(0, 1, 3) == "bcd"
    assert ssv.gather_substr([2], 2, 4) == ["llo"]


def test_push_back_null_all_containers():
    """push_back_null(count) parity (reference src/bmsparsevec.h:498,
    src/bmstrsparsevec.h:696, src/bmsparsevec_compr.h:487)."""
    import numpy as np
    import pytest
    from bitmagic_tpu import (FloatSparseVector, RSCSparseVector,
                              SparseVector, StrSparseVector)
    sv = SparseVector(np.uint32, nullable=True)
    sv.push_back(7)
    sv.push_back_null(2)
    sv.push_back(9)
    assert len(sv) == 4
    assert sv.is_null(1) and sv.is_null(2) and not sv.is_null(3)
    assert sv.get(3) == 9
    # non-nullable vectors refuse (the reference asserts)
    with pytest.raises(ValueError):
        SparseVector(np.uint32).push_back_null()
    ssv = StrSparseVector(nullable=True)
    ssv.push_back("a")
    ssv.push_back_null()
    ssv.push_back("c")
    assert ssv.is_null(1) and ssv.get(2) == "c"
    fv = FloatSparseVector(np.float32, nullable=True)
    fv.push_back(1.5)
    fv.push_back_null(3)
    assert fv.is_null(2) and not fv.is_null(0)
    rsc = RSCSparseVector()
    rsc.push_back(4)
    rsc.push_back_null(5)
    rsc.push_back(6)
    assert rsc.at(0) == 4 and rsc.is_null(3) and rsc.at(6) == 6
    assert rsc.count() == 2
