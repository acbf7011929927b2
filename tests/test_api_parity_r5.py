"""Round-5 API-parity batch, found by a systematic sweep of the
reference's public method lists (bm.h / bmsparsevec.h /
bmsparsevec_compr.h / bmstrsparsevec.h) against our containers.

check_or_next / check_or_next_extract / init (src/bm.h:2112/2126);
container end() sentinels + ConstIterator comparisons; trivial
find_rank/sync/sync_size/is_remap parity; rsc inc_not_null/unsync
(src/bmsparsevec_compr.h:522/832); str join/merge
(src/bmstrsparsevec.h:1329); effective_slices on every container;
push_back_null (src/bmsparsevec.h:498).
"""
import numpy as np
import pytest

import bitmagic_tpu as bm


def test_check_or_next_family():
    bv = bm.BitVector.from_indices([4, 9], size=100)
    assert bv.check_or_next(4) == 4
    assert bv.check_or_next(5) == 9
    assert bv.check_or_next(10) == 0
    t = bv.copy()
    assert t.check_or_next_extract(0) == 4
    assert not t.test(4) and t.test(9)
    assert t.check_or_next_extract(0) == 9
    assert t.check_or_next_extract(0) == 0
    assert bv.init() is bv


def test_sv_end_sentinel_iteration():
    sv = bm.SparseVector(np.uint32, nullable=True)
    sv.push_back(5)
    sv.push_back(6)
    it = sv.get_const_iterator(0)
    vals = []
    while it != sv.end():
        vals.append(it.value())
        it.advance()
    assert vals == [5, 6]
    assert sv.end() == sv.end()
    assert sv.find_rank(2) == 1
    with pytest.raises(ValueError):
        sv.find_rank(0)
    assert not sv.is_remap()
    assert sv.sync() is sv and sv.sync_size() is sv


def test_rsc_inc_not_null_unsync():
    rsc = bm.RSCSparseVector()
    rsc.set(3, 10)
    rsc.sync()
    assert rsc.in_sync()
    rsc.unsync()
    assert not rsc.in_sync()
    rsc.inc_not_null(3, 5)
    assert rsc.at(3) == 15
    with pytest.raises(ValueError):
        rsc.inc_not_null(1)
    assert rsc.effective_slices() >= 4
    assert not rsc.is_remap()
    assert rsc.end() == rsc.end()


def test_str_join_merge():
    s1 = bm.StrSparseVector.from_strings(["aa", "bb"])
    s2 = bm.StrSparseVector.from_strings(["", "", "cc"])
    s1.merge(s2)                       # destructive join
    assert [s1.get(i) for i in range(3)] == ["aa", "bb", "cc"]
    assert len(s2) == 0
    assert s1.effective_slices() > 8
    assert s1.find_rank(1) == 0
    # joining across different remap tables is UB in the reference ->
    # raises here instead
    remapped = bm.StrSparseVector.from_strings(["xx"])
    remapped.remap()
    with pytest.raises(ValueError):
        s1.join(remapped)
    # nullable self absorbs a non-nullable argument as all-assigned
    n1 = bm.StrSparseVector.from_strings(["aa", None], nullable=True)
    n2 = bm.StrSparseVector.from_strings(["", "zz"])
    n1.join(n2)
    assert not n1.is_null(1) and n1.get(1) == "zz"


def test_float_parity_extras():
    fv = bm.FloatSparseVector(np.float32)
    fv.push_back(-2.5)
    fv.push_back(1.0)
    assert fv.effective_slices() > 2
    assert fv.find_rank(1) == 0 and not fv.is_remap()
    it = fv.get_const_iterator(0)
    n = 0
    while it != fv.end():
        it.advance()
        n += 1
    assert n == 2
