"""Round-4 API parity extras vs numpy golden models.

Covers the residual reference surface found by the round-4 audit:
SV-family const_iterator / back_insert_iterator (src/bmsparsevec.h:178/278,
bmstrsparsevec.h:944/959, bmsparsevec_compr.h:700/717,
bmsparsevec_float.h:161/225), small container methods (try_get, compare,
keep_range, swap, clear_all, copy_range, resize, merge_not_null,
extract/extract_range), bvector count_blocks/import_sorted/move_from
(src/bm.h:1328/2080), and the aggregator staged-execution API
(set_operation/stage/run_step, src/bmaggregator.h:595-622).
"""
import numpy as np
import pytest

from bitmagic_tpu.agg.aggregator import (Aggregator, BM_SHIFT_R_AND,
                                         OperationStatus)
from bitmagic_tpu.core.bitvector import BitVector
from bitmagic_tpu.sv.float_vector import FloatSparseVector
from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.str_vector import StrSparseVector

_I64 = np.int64


# ---------------------------------------------------------------------------
# iterators
# ---------------------------------------------------------------------------
def test_sv_const_iterator_and_back_inserter():
    rng = np.random.default_rng(41)
    vals = rng.integers(0, 1 << 20, 300).astype(np.uint32)
    sv = SparseVector(np.uint32, nullable=True)
    with sv.get_back_inserter() as bi:
        for k, v in enumerate(vals):
            if k % 7 == 3:
                bi.add_null()
            else:
                bi.add(v)
    assert sv.size == vals.size
    it = sv.get_const_iterator(0)
    out, nulls = [], []
    while it.valid():
        nulls.append(it.is_null())
        out.append(0 if it.is_null() else int(it.value()))
        it.advance()
    want_null = np.arange(vals.size) % 7 == 3
    assert np.array_equal(np.asarray(nulls), want_null)
    want = np.where(want_null, 0, vals.astype(np.int64))
    assert np.array_equal(np.asarray(out), want)
    # go_to + pos + python iteration protocol
    it.go_to(5)
    assert it.pos() == 5 and it.valid()
    assert list(sv.begin())[:10] == [None if want_null[k] else int(vals[k])
                                     for k in range(10)]


def test_str_iterator_and_back_inserter():
    words = ["alpha", "beta", None, "gamma", "delta", None, "eps"]
    sv = StrSparseVector(8, nullable=True)
    bi = sv.get_back_inserter()
    for w in words:
        bi.add_null() if w is None else bi.add(w)
    bi.flush()
    assert list(sv.begin()) == words
    it = sv.get_const_iterator(3)
    assert it.value() == "gamma" and not it.is_null()


def test_rsc_and_float_iterators():
    sv = SparseVector(np.uint32, nullable=True)
    for k in range(50):
        (sv.set_null(k) if k % 3 == 0 else sv.set(k, k * 11))
    rsc = RSCSparseVector.from_sparse_vector(sv)
    got = list(rsc.begin())
    want = [None if k % 3 == 0 else k * 11 for k in range(50)]
    assert [None if g is None else int(g) for g in got] == want

    fv = FloatSparseVector(np.float32)
    with fv.get_back_inserter() as bi:
        for k in range(20):
            bi.add(k * 0.5)
    assert np.allclose(list(fv.begin()), np.arange(20) * 0.5)


# ---------------------------------------------------------------------------
# small container methods
# ---------------------------------------------------------------------------
def test_sv_try_get_compare_swap_keep_range():
    sv = SparseVector(np.int32, nullable=True)
    sv.import_values(np.arange(-50, 50, dtype=np.int32))
    sv.set_null(7)
    found, v = sv.try_get(7)
    assert not found
    found, v = sv.try_get(8)
    assert found and v == -42
    assert sv.compare(60, 9) == 1 and sv.compare(60, 10) == 0 \
        and sv.compare(60, 11) == -1
    assert sv.is_nullable()
    # element swap incl. a NULL side
    sv.swap(7, 60)
    assert sv.is_null(60) and sv.get(7) == 10
    # container swap
    other = SparseVector(np.int32)
    other.import_values(np.asarray([1, 2, 3], np.int32))
    sv.swap(other)
    assert sv.size == 3 and other.size == 100
    other.keep_range(10, 19)
    got = other.to_numpy()
    assert np.array_equal(got[10:20], np.arange(-40, -30, dtype=np.int32))
    assert not got[:10].any() and not got[20:].any()
    assert np.array_equal(other.extract(5, offset=10), got[10:15])
    assert np.array_equal(other.extract_range(12, 14), got[12:15])
    other.optimize_gap_size()


def test_rsc_parity_methods():
    sv = SparseVector(np.uint32, nullable=True)
    for k in range(0, 100, 3):
        sv.set(k, k + 1)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    assert rsc.is_nullable()
    assert rsc.at(3) == 4
    with pytest.raises(IndexError):
        rsc.at(1000)
    found, v = rsc.try_get_sync(3)
    assert found and v == 4
    # copy_range
    cp = RSCSparseVector(np.uint32)
    cp.copy_range(rsc, 30, 60)
    assert cp.size == rsc.size
    assert cp.get(33) == 34 and cp.get(3) == 0 and cp.get(63) == 0
    # resize down drops tail assignments
    r2 = RSCSparseVector(np.uint32)
    r2.copy_range(rsc, 0, 99)
    r2.resize(50)
    assert r2.size == 50 and r2.count() == len(range(0, 50, 3))
    # merge_not_null requires disjoint assignment sets
    a = RSCSparseVector(np.uint32)
    a.set(1, 11).set(5, 55)
    b = RSCSparseVector(np.uint32)
    b.set(2, 22).set(9, 99)
    a.merge_not_null(b)
    assert a.get(1) == 11 and a.get(2) == 22 and a.get(9) == 99
    assert b.count() == 0
    c = RSCSparseVector(np.uint32)
    c.set(1, 7)
    with pytest.raises(ValueError):
        a.merge_not_null(c)
    # clear_all + freeze/is_ro
    a.clear_all()
    assert a.size == 0 and a.count() == 0
    rsc.freeze()
    assert rsc.is_ro()


def test_str_parity_methods():
    sv = StrSparseVector.from_strings(
        ["kiwi", "fig", None, "plum", "apple"], nullable=True)
    found, s = sv.try_get(2)
    assert not found
    found, s = sv.try_get(3)
    assert found and s == "plum"
    assert sv.at(0) == "kiwi"
    assert sv.is_nullable()
    assert StrSparseVector.compare_str("abc", "abd") == -1
    assert sv.compare_elements(0, 0) == 0
    assert sv.compare_elements(1, 3) == -1     # fig < plum
    sv.swap(0, 2)
    assert sv.is_null(0) and sv.get(2) == "kiwi"
    # container swap
    o = StrSparseVector.from_strings(["x"])
    sv.swap(o)
    assert sv.size == 1 and o.size == 5
    # copy_range preserves remap
    o.remap()
    cp = StrSparseVector(o.max_str_size, nullable=True)
    cp.copy_range(o, 1, 3)
    assert cp.to_list()[1:4] == o.to_list()[1:4]
    assert (cp.to_list()[0] or "") == "" and (cp.to_list()[4] or "") == ""
    # resize + clear_all + effective_size + remap_from
    o.resize(3)
    assert o.size == 3 and o.effective_size() == 3
    r = StrSparseVector(8)
    r.remap_from(StrSparseVector.from_strings(["cc", "aa", "aa", "ba"]))
    assert r.is_remap() and r.to_list() == ["cc", "aa", "aa", "ba"]
    o.clear_all(remap=True)
    assert o.size == 0 and not o.is_remap()


def test_float_parity_methods():
    vals = np.asarray([0.5, -1.25, 3e8, -0.0, 7.5], np.float32)
    fv = FloatSparseVector.from_array(vals)
    assert fv.at(2) == np.float32(3e8)
    with pytest.raises(IndexError):
        fv.at(99)
    found, v = fv.try_get(1)
    assert found and v == np.float32(-1.25)
    assert not fv.empty()
    assert np.array_equal(fv.extract(3, offset=1).view(np.uint32),
                          vals[1:4].view(np.uint32))
    assert np.array_equal(fv.extract_range(0, 2).view(np.uint32),
                          vals[:3].view(np.uint32))
    cp = FloatSparseVector(np.float32)
    cp.copy_range(fv, 1, 3)
    got = cp.to_numpy()
    assert np.array_equal(got[1:4].view(np.uint32), vals[1:4].view(np.uint32))
    assert got[0] == 0 and got[4] == 0
    o = FloatSparseVector(np.float32)
    o.push_back(9.0)
    fv.swap(o)
    assert fv.size == 1 and o.size == 5
    o.resize(2)
    assert o.size == 2 and np.array_equal(
        o.to_numpy().view(np.uint32), vals[:2].view(np.uint32))
    o.sync()
    o.freeze()
    assert o.is_ro()
    fv.clear_all()
    assert fv.empty() and not fv.is_str() and not fv.is_compressed()


# ---------------------------------------------------------------------------
# bvector extras
# ---------------------------------------------------------------------------
def test_bv_count_blocks_import_sorted_move_from():
    rng = np.random.default_rng(17)
    ids = np.unique(rng.integers(0, 1 << 22, 5000)).astype(_I64)
    bv = BitVector(1 << 22)
    bv.import_sorted(ids)
    assert bv.count() == ids.size
    # duplicates are LEGAL (reference import_sorted ORs bits); only a
    # decreasing sequence is rejected
    bv.import_sorted(np.asarray([5, 5], _I64))
    assert bv.test(5)
    with pytest.raises(ValueError):
        bv.import_sorted(np.asarray([9, 5], _I64))
    bv.set_range(3 << 16, (4 << 16) - 1)        # one FULL block
    bv.optimize()
    rc = bv.count_blocks()
    # running counts: rc[k] == count of bits in blocks [0..k]
    per = np.zeros(rc.size, np.int64)
    blocks = np.concatenate([ids >> 16,
                             np.arange(3 << 16, 4 << 16, dtype=_I64) >> 16])
    allbits = np.unique(np.concatenate(
        [ids, np.asarray([5], _I64),
         np.arange(3 << 16, 4 << 16, dtype=_I64)]))
    np.add.at(per, (allbits >> 16), 1)
    assert np.array_equal(rc, np.cumsum(per))
    del blocks
    # move_from
    dst = BitVector(1 << 22)
    dst.set(1)
    want = bv.count()
    dst.move_from(bv)
    assert dst.count() == want and bv.count() == 0 and not dst.test(1)


# ---------------------------------------------------------------------------
# aggregator staged execution
# ---------------------------------------------------------------------------
def _random_bvs(rng, n, size=1 << 20, density=2000):
    out = []
    for _ in range(n):
        ids = np.unique(rng.integers(0, size, density)).astype(_I64)
        out.append(BitVector.from_indices(ids, size))
    return out


def test_aggregator_stage_run_step_matches_fused():
    rng = np.random.default_rng(23)
    vecs = _random_bvs(rng, 5)
    # make overlaps likely: OR a common backbone into every vector
    backbone = _random_bvs(rng, 1, density=50000)[0]
    for v in vecs:
        v.bit_or(backbone)
    agg = Aggregator()
    for v in vecs:
        agg.add(v)
    agg.set_operation(BM_SHIFT_R_AND)
    assert agg.get_operation() == BM_SHIFT_R_AND
    agg.stage()
    assert agg.get_operation_status() == OperationStatus.op_prepared
    steps = 0
    while agg.get_operation_status() != OperationStatus.op_done:
        agg.run_step(0, 0)
        steps += 1
    assert steps == len(vecs)
    stepped = agg.get_target()
    fused = Aggregator().combine_shift_right_and(vecs)
    assert stepped.equal(fused)
    # run() executes the fused chain directly
    agg2 = Aggregator()
    for v in vecs:
        agg2.add(v)
    agg2.set_operation(BM_SHIFT_R_AND)
    agg2.stage()
    assert agg2.run() == OperationStatus.op_done
    assert agg2.get_target().equal(fused)
    # misuse guards
    with pytest.raises(RuntimeError):
        Aggregator().run_step()
    with pytest.raises(ValueError):
        Aggregator().set_operation(42)


# ---------------------------------------------------------------------------
# setops combine family + free-function namespace parity
# ---------------------------------------------------------------------------
def test_combine_family_vs_golden():
    import bitmagic_tpu as bm
    rng = np.random.default_rng(3)
    size = 1 << 21
    base = np.unique(rng.integers(0, size, 4000)).astype(_I64)
    seq = np.unique(rng.integers(0, size, 3000)).astype(_I64)
    gold = set(base.tolist())

    bv = BitVector.from_indices(base, size)
    bm.combine_or(bv, seq)
    gold |= set(seq.tolist())
    assert sorted(gold) == bv.indices().tolist()

    bm.combine_xor(bv, seq)
    gold ^= set(seq.tolist())
    assert sorted(gold) == bv.indices().tolist()

    bm.combine_sub(bv, seq[:1000])
    gold -= set(seq[:1000].tolist())
    assert sorted(gold) == bv.indices().tolist()

    keep = np.unique(rng.integers(0, size, 2000)).astype(_I64)
    bm.combine_and(bv, keep)
    gold &= set(keep.tolist())
    assert sorted(gold) == bv.indices().tolist()

    bm.combine_and_sorted(bv, np.asarray(sorted(gold), _I64))
    assert sorted(gold) == bv.indices().tolist()
    with pytest.raises(ValueError):
        bm.combine_and_sorted(bv, np.asarray([5, 3], _I64))

    # export_array / bit_import: raw bit images
    arr = rng.integers(0, 1 << 16, 64).astype(np.uint16)
    b2 = BitVector(arr.size * 16)
    bm.export_array(b2, arr)
    want = np.flatnonzero(np.unpackbits(
        arr.view(np.uint8), bitorder="little"))
    assert np.array_equal(b2.indices(), want)
    words = rng.integers(0, 1 << 32, 128, dtype=np.uint64).astype(np.uint32)
    b3 = BitVector(words.size * 32)
    bm.bit_import(b3, words)
    want = np.flatnonzero(np.unpackbits(
        words.view(np.uint8), bitorder="little"))
    assert np.array_equal(b3.indices(), want)

    a = BitVector.from_indices(base, size)
    b = BitVector.from_indices(seq, size)
    assert bm.distance_and_operation(a, b) == \
        len(set(base.tolist()) & set(seq.tolist()))
    m = bm.build_similarity_batch([a, b])
    assert m[0, 1] == bm.distance_and_operation(a, b)


# ---------------------------------------------------------------------------
# round-4 continuation: plane-OR join semantics, str keep/clear_range/
# import_back, float join/merge/clear_range, RSC count_range_notnull,
# is_ro flags, iterator substring mode, end() sentinels
# ---------------------------------------------------------------------------

def test_sv_join_is_plane_or(rng):
    """Reference join ORs value slices (src/bmsparsevec.h:2186) —
    overlapping assigned values combine bitwise."""
    a = SparseVector(np.uint32, nullable=True)
    b = SparseVector(np.uint32, nullable=True)
    a.set(0, 0b0101)
    a.set(2, 7)
    b.set(0, 0b0011)
    b.set(5, 9)
    a.join(b)
    assert a[0] == 0b0111          # bitwise OR, not first-wins
    assert a[2] == 7 and a[5] == 9
    assert not a.is_null(0) and not a.is_null(5)
    # joining a non-nullable argument marks its whole span assigned
    c = SparseVector(np.uint32, nullable=True)
    c.set(9, 1)
    d = SparseVector.from_array(np.arange(4, dtype=np.uint32))
    c.join(d)
    assert [c.is_null(i) for i in range(4)] == [False] * 4
    np.testing.assert_array_equal(c.to_numpy()[:4], np.arange(4))


def test_float_join_merge_clear_range():
    a = FloatSparseVector.from_array(np.asarray([1.5, 0.0, -2.25],
                                                np.float32))
    b = FloatSparseVector(np.float32)
    b.set(4, 8.5)
    a.join(b)
    np.testing.assert_array_equal(
        a.to_numpy(), np.asarray([1.5, 0.0, -2.25, 0.0, 8.5], np.float32))
    c = FloatSparseVector(np.float32)
    c.set(5, -1.0)
    a.merge(c)
    assert a[5] == -1.0 and len(c) == 0       # merge empties the source
    a.clear_range(0, 4)
    np.testing.assert_array_equal(
        a.to_numpy(), np.asarray([0, 0, 0, 0, 0, -1.0], np.float32))
    with pytest.raises(ValueError):
        a.join(FloatSparseVector(np.float64))


def test_str_keep_clear_range_import_back():
    sv = StrSparseVector.from_strings(["aa", "bb", "cc", "dd"])
    sv.import_back(["ee", "ff"])
    assert sv.to_list() == ["aa", "bb", "cc", "dd", "ee", "ff"]
    sv.clear_range(1, 2)
    assert sv.to_list() == ["aa", "", "", "dd", "ee", "ff"]
    keep = BitVector.from_indices(np.asarray([0, 3, 5], _I64), 2 ** 48)
    sv.keep(keep)
    assert sv.to_list() == ["aa", "", "", "dd", "", "ff"]
    # nullable variant: clear_range(set_null=True) unassigns
    sn = StrSparseVector.from_strings(["x", "y", "z"], nullable=True)
    sn.clear_range(1, 1, set_null=True)
    assert sn.is_null(1) and not sn.is_null(0)


def test_rsc_count_range_notnull():
    rsc = RSCSparseVector(np.uint32)
    for i, v in [(2, 10), (5, 20), (9, 30), (100, 40)]:
        rsc.set(i, v)
    rsc.sync()
    assert rsc.count_range_notnull(0, 9) == 3
    assert rsc.count_range_notnull(3, 99) == 2
    assert rsc.count_range_notnull(99, 3) == 2     # swapped bounds
    assert rsc.count_range_notnull(101, 200) == 0


def test_is_ro_flags():
    sv = SparseVector.from_array(np.arange(5, dtype=np.uint32))
    assert not sv.is_ro()
    sv.freeze()
    assert sv.is_ro()
    st = StrSparseVector.from_strings(["q"])
    assert not st.is_ro()
    st.freeze()
    assert st.is_ro()


def test_str_iterator_substr_and_view():
    sv = StrSparseVector.from_strings(["alpha", "beta", "gamma"])
    it = sv.get_const_iterator(0)
    it.set_substr(1, 3)
    assert it.value() == "lph" and it.get_string_view() == "lph"
    it.advance()
    assert it.value() == "eta"
    it.set_substr(2)                      # to end of string
    assert it.value() == "ta"


def test_bv_end_sentinel():
    bv = BitVector.from_indices(np.asarray([3, 70000], _I64), 2 ** 20)
    e = bv.end()
    assert not e.valid()
    it = bv.first()
    seen = []
    while it.valid():
        seen.append(it.value())
        it.go_up()
    assert seen == [3, 70000]


def test_scanner_set_search_range(rng):
    from bitmagic_tpu.sv.scanner import SparseVectorScanner
    vals = rng.integers(0, 5, 1000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    sc = SparseVectorScanner()
    sc.set_search_range(100, 199)
    got = sc.find_eq(sv, 3).indices()
    want = np.flatnonzero(vals == 3)
    want = want[(want >= 100) & (want <= 199)]
    np.testing.assert_array_equal(got, want)
    # composes with an AND mask
    mask = BitVector.from_indices(np.arange(0, 1000, 2, dtype=_I64), 2**48)
    sc.set_and_mask(mask)
    got = sc.find_eq(sv, 3).indices()
    np.testing.assert_array_equal(got, want[want % 2 == 0])
    sc.reset_search_range()
    sc.reset_and_mask()
    np.testing.assert_array_equal(sc.find_eq(sv, 3).indices(),
                                  np.flatnonzero(vals == 3))


def test_aggregator_range_hint_and_optimization(rng):
    size = 40 * 65536
    a = BitVector.from_indices(
        np.unique(rng.integers(0, size, 4000)).astype(_I64), size)
    b = BitVector.from_indices(
        np.unique(rng.integers(0, size, 4000)).astype(_I64), size)
    agg = Aggregator()
    full = agg.combine_and([a, b]).indices()
    one_block = agg.set_range_hint(3 * 65536, 3 * 65536 + 5)
    assert one_block
    agg.set_range_hint(2 * 65536, 5 * 65536 - 1)
    got = agg.combine_and_sub([a, b], []).indices()
    # block-granular: exactly the hits whose block is in [2, 4]
    want = full[(full >= 2 * 65536) & (full < 5 * 65536)]
    np.testing.assert_array_equal(got, want)
    p = agg.find_first_and_sub([a, b], [])
    assert p == (int(want[0]) if want.size else -1)
    agg.reset_range_hint()
    np.testing.assert_array_equal(agg.combine_and_sub([a, b], []).indices(),
                                  full)
    # optimization mode reclassifies sparse result blocks
    agg.set_optimization(True)
    out = agg.combine_and([a, b])
    assert out._gaps is not None and out._gaps.n_blocks > 0
    np.testing.assert_array_equal(out.indices(), full)
    # horizontal aliases are the same computation
    np.testing.assert_array_equal(
        agg.combine_and_horizontal([a, b]).indices(), full)
    agg.set_optimization(False)


def test_serializer_knob_accessors():
    from bitmagic_tpu.serial.serializer import Serializer
    s = Serializer(5)
    assert s.get_compression_level() == 5
    s.byte_order_serialization(False)
    s.gap_length_serialization(True)
    s.set_bookmarks(True, 128)
    bv = BitVector.from_indices(np.asarray([1, 100, 70000], _I64), 2**20)
    blob = s.serialize(bv)
    st = s.get_compression_stat()
    assert st and sum(st.values()) >= 1
    from bitmagic_tpu.serial.serializer import Deserializer
    assert Deserializer().deserialize(blob).equal(bv)


def test_count_intervals():
    from bitmagic_tpu import count_intervals
    bv = BitVector(100)
    assert count_intervals(bv) == 1                # one zero-run
    bv.set_range(0, 99)
    assert count_intervals(bv) == 1                # one ones-run
    bv2 = BitVector.from_indices(np.asarray([2, 3, 4, 10], _I64), 100)
    # 00 111 00000 1 0...  -> 0,1,0,1,0 = 5 runs
    assert count_intervals(bv2) == 5
    bv3 = BitVector.from_indices(np.asarray([0, 99], _I64), 100)
    # 1 0...0 1 = 3 runs
    assert count_intervals(bv3) == 3


def test_distance_operation_any(rng):
    import bitmagic_tpu as bm
    from bitmagic_tpu.algo.setops import (COUNT_A, COUNT_AND, COUNT_OR,
                                          COUNT_SUB_AB, COUNT_SUB_BA,
                                          COUNT_XOR)
    a = BitVector.from_indices(np.asarray([5, 70000], _I64), 2 ** 20)
    b = BitVector.from_indices(np.asarray([5], _I64), 2 ** 20)
    got = bm.distance_operation_any(
        a, b, [COUNT_AND, COUNT_OR, COUNT_XOR, COUNT_SUB_AB, COUNT_SUB_BA,
               COUNT_A])
    assert got[COUNT_AND] and got[COUNT_OR] and got[COUNT_XOR]
    assert got[COUNT_SUB_AB] and not got[COUNT_SUB_BA] and got[COUNT_A]


def test_build_jaccard_similarity_batch(rng):
    import bitmagic_tpu as bm
    vals = (rng.integers(0, 4, 3000) * 3).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    batch = bm.build_jaccard_similarity_batch(sv)
    assert batch                    # at least one plane pair
    # descriptors sorted by descending jaccard; values verified per pair
    jacs = [d[4] for d in batch]
    assert jacs == sorted(jacs, reverse=True)
    for i, j, c_and, c_or, jac in batch:
        bi, bj = sv.planes[i], sv.planes[j]
        assert c_and == bm.count_and(bi, bj)
        assert c_or == bm.count_or(bi, bj)
        assert jac == (c_and / c_or if c_or else 0.0)


def test_staged_aggregator_matches_fused(rng):
    """stage()/run_step() stepping equals the fused
    combine_shift_right_and chain, including GAP-resident operands."""
    from bitmagic_tpu.agg.aggregator import OperationStatus
    size = 8 * 65536
    vs = []
    for j in range(4):
        ids = np.unique(rng.integers(0, size, 400)).astype(_I64)
        v = BitVector.from_indices(ids, size)
        if j % 2:
            v.optimize()
        vs.append(v)
    agg = Aggregator()
    for v in vs:
        agg.add(v)
    agg.set_operation(BM_SHIFT_R_AND)
    agg.stage()
    while agg.run_step() != OperationStatus.op_done:
        pass
    fused = Aggregator().combine_shift_right_and(vs)
    assert agg.get_target().equal(fused)


def test_bitap_vs_golden_block_edges(rng):
    """combine_shift_right_and against a pure-Python golden with ids
    pinned to block boundaries (carry crossings)."""
    size = 6 * 65536
    vs, sets = [], []
    for _ in range(4):
        ids = np.unique(np.append(
            rng.integers(0, size, 300),
            [65535, 65536, 131071, size - 1])).astype(_I64)
        vs.append(BitVector.from_indices(ids, size))
        sets.append(set(ids.tolist()))
    acc = sets[0]
    for s in sets[1:]:
        acc = {x + 1 for x in acc if x + 1 < size} & s
    got = Aggregator().combine_shift_right_and(vs)
    assert sorted(acc) == got.indices().tolist()


# ---------------------------------------------------------------------------
# self-review regressions (round 4): join NULL semantics, range-hint
# precision + reset, reversed bounds, lazy scanner range, cheap end()
# ---------------------------------------------------------------------------

def test_join_null_slice_adoption():
    """Reference join_null_slice both branches (src/bmsparsevec.h:2238):
    a nullable target marks a non-nullable argument's span real; a
    non-nullable target adopts the argument's NULL slice."""
    a = FloatSparseVector(np.float32, nullable=True)
    b = FloatSparseVector.from_array(np.asarray([2.5, 3.5], np.float32))
    a.join(b)
    assert not a.is_null(1) and a[1] == 3.5
    c = SparseVector(np.uint32)                 # non-nullable target
    c.set(0, 7)
    d = SparseVector(np.uint32, nullable=True)
    d.set(2, 9)
    c.join(d)
    assert c.is_nullable() and not c.is_null(2) and c[2] == 9
    f = FloatSparseVector(np.float32)
    f.set(0, 1.0)
    g = FloatSparseVector(np.float32, nullable=True)
    g.set(1, -4.0)
    f.join(g)
    assert f.is_nullable() and not f.is_null(1) and f[1] == -4.0


def test_range_hint_one_block_bit_precise_and_reset():
    """One-block hints filter at BIT precision (reference
    gap_init_range_block, src/bmaggregator.h:974-987); reset() clears the
    hint (reference reset -> reset_range_hint, :941-946); the succinct
    run-domain fold honors the hint too."""
    v = BitVector.from_indices(np.asarray([5, 150], _I64), 2 ** 20)
    agg = Aggregator()
    assert agg.set_range_hint(100, 200)
    assert agg.find_first_and_sub([v, v], []) == 150
    assert agg.combine_and_sub([v, v], []).indices().tolist() == [150]
    agg.reset()                                  # clears the hint
    a5 = BitVector.from_indices(np.asarray([5], _I64), 2 ** 20)
    assert agg.find_first_and_sub([a5, a5], []) == 5
    # GAP-resident operands take the run-domain fold; hint still applies
    import bitmagic_tpu.constants as C
    ids = np.unique(
        np.random.default_rng(0).integers(0, 2 ** 24, 200)).astype(_I64)
    g1 = BitVector.from_indices(ids, 2 ** 24, strategy=C.BM_GAP)
    agg2 = Aggregator()
    agg2.set_range_hint(65536 * 3, 65536 * 8 - 1)
    res = agg2.combine_and_sub([g1, g1.copy()], []).indices()
    want = ids[(ids >= 65536 * 3) & (ids < 65536 * 8)]
    np.testing.assert_array_equal(res, want)


def test_reversed_bounds_swap():
    """copy_range/keep_range swap reversed bounds (reference xor_swap,
    src/bm.h:8006 / keep_range)."""
    src = BitVector.from_indices(np.asarray([3, 70000, 200000], _I64),
                                 2 ** 20)
    dst = BitVector(2 ** 20)
    dst.copy_range(src, 200000, 3)
    assert dst.indices().tolist() == [3, 70000, 200000]
    k = src.copy()
    k.keep_range(70000, 3)
    assert k.indices().tolist() == [3, 70000]


def test_scanner_search_range_is_lazy():
    """set_search_range holds (lo, hi) lazily — a 48-bit-wide range must
    not enumerate blocks-in-range (the eager range vector did)."""
    import time
    sc = __import__("bitmagic_tpu").SparseVectorScanner()
    vals = (np.arange(3000) % 7).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    t0 = time.time()
    sc.set_search_range(0, 2 ** 47)
    got = sc.find_eq(sv, 3).indices()
    assert time.time() - t0 < 10
    np.testing.assert_array_equal(got, np.flatnonzero(vals == 3))
    sc.set_search_range(10, 20)
    assert sc.find_first_eq(sv, 3) == 10
    sc.reset_search_range()


def test_end_sentinel_is_cheap():
    """end() must not decode block 0 (a sentinel costs no device fetch)."""
    from bitmagic_tpu.core.enumerator import Enumerator
    bv = BitVector.from_indices(np.asarray([1], _I64), 2 ** 20)
    called = []
    orig = Enumerator._load_entry
    Enumerator._load_entry = lambda self, k: called.append(k) or orig(self, k)
    try:
        e = bv.end()
    finally:
        Enumerator._load_entry = orig
    assert not e.valid() and called == []


def test_move_from_guards_and_self_move():
    """Reference move_from guards self-move (src/bm.h:2342) and mutators
    respect freeze(); stale end sentinels stay invalid after growth."""
    bv = BitVector(100)
    bv.set_many(np.asarray([1, 2, 3], _I64))
    bv.move_from(bv)                         # guarded no-op
    assert bv.count() == 3
    src = BitVector(100)
    src.set_many(np.asarray([4, 5], _I64))
    src.freeze()
    dst = BitVector(100)
    import bitmagic_tpu as bm
    with pytest.raises(bm.ReadOnlyError):
        dst.move_from(src)
    assert src.count() == 2 and dst.count() == 0
    frozen = BitVector(100)
    frozen.set_many(np.asarray([1, 5], _I64))
    frozen.freeze()
    with pytest.raises(bm.ReadOnlyError):
        frozen.keep_range(0, 2)
    assert frozen.count() == 2
    # count_blocks refuses an O(address-span) allocation
    huge = BitVector(2 ** 48)
    huge.set(2 ** 47)
    with pytest.raises(MemoryError):
        huge.count_blocks()
    # a stale end sentinel never resurrects
    empty = BitVector(2 ** 20)
    e = empty.end()
    empty.set(5)
    empty.set(65536 + 7)
    empty.count()                            # flush
    assert not e.go_up() and not e.valid()
