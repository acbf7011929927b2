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


def test_scanner_pipeline_knobs():
    """Reference pipeline options (src/bmsparsevec_algo.h:678-695):
    set_search_mask joins the fused operand stack, set_search_count_limit
    caps reported counts, set_or_target accumulates the union."""
    sc = bm.SparseVectorScanner()
    sv = bm.SparseVector.from_array(np.asarray([1, 2, 2, 3, 2, 1],
                                               np.uint32))
    p = sc.prepare_pipeline(sv)
    assert p.counts([2, 1, 9]) == [3, 2, 0]
    mask = bm.BitVector.from_indices([0, 1, 2], size=100)
    p.set_search_mask(mask)
    assert p.counts([2, 1, 9]) == [2, 1, 0]
    p.set_search_count_limit(1)
    assert p.counts([2, 1, 9]) == [1, 1, 0]
    tgt = bm.BitVector(100)
    p.set_or_target(tgt).set_search_count_limit(None)
    assert p.counts([2, 1]) == [2, 1]
    assert sorted(tgt.indices().tolist()) == [0, 1, 2]
    p.set_search_mask(None)            # knobs reset back to the full view
    p.set_or_target(None)
    assert p.counts([2, 1, 9]) == [3, 2, 0]


def test_scanner_bfind_reset_binding():
    sc = bm.SparseVectorScanner()
    srt = bm.SparseVector.from_array(np.asarray([10, 20, 20, 30],
                                                np.uint32))
    assert sc.bfind(srt, 20) == 1
    assert sc.bfind(srt, 25) == -1
    sc.bind(srt)
    assert sc.bfind(srt, 30) == 3
    sc.reset_binding()


def test_aggregator_pipeline_knobs():
    """AggOptions setter parity (src/bmaggregator.h:251/260/363)."""
    a = bm.BitVector.from_indices([1, 2, 3], size=100)
    b = bm.BitVector.from_indices([2, 3, 4], size=100)
    c = bm.BitVector.from_indices([3, 4, 5], size=100)
    opts = bm.AggOptions().set_compute_count(True).set_search_count_limit(1)
    res = bm.Aggregator().pipeline([([a, b],), ([b, c],)], opts)
    assert [r["count"] for r in res] == [1, 1]
    tgt = bm.BitVector(100)
    opts2 = bm.AggOptions().set_or_target(tgt)
    bm.Aggregator().pipeline([([a, b],), ([b, c],)], opts2)
    assert sorted(tgt.indices().tolist()) == [2, 3, 4]


def test_set2set_transform_class():
    tr = bm.Set2SetTransform()
    with pytest.raises(ValueError):
        tr.run(bm.BitVector(10))
    tr.attach_sv(bm.SparseVector.from_array(
        np.asarray([100, 200, 300], np.uint32)))
    out = tr.run(bm.BitVector.from_indices([0, 2], size=10))
    assert sorted(out.indices().tolist()) == [100, 300]
    assert tr.one_pass_run is tr.run or tr.one_pass_run.__func__ is not None
    tr.attach_sv(None)
    assert tr.attached() is None


def test_free_function_parity_extras():
    """bit_import_u32 (src/bmbvimport.h:46) and
    aggregator_pipeline_execute (src/bmaggregator.h:874)."""
    from bitmagic_tpu.agg.aggregator import BM_SHIFT_R_AND
    bv = bm.BitVector(64)
    bm.bit_import_u32(bv, np.asarray([0b101, 0], np.uint32), optimize=True)
    assert sorted(bv.indices().tolist()) == [0, 2]
    aggs = []
    for _ in range(2):
        a = bm.Aggregator()
        a.set_operation(BM_SHIFT_R_AND)
        a.add(bm.BitVector.from_indices([10, 20], size=100))
        a.add(bm.BitVector.from_indices([11, 50], size=100))
        aggs.append(a)
    bm.aggregator_pipeline_execute(aggs)
    for a in aggs:
        assert a.get_operation_status().name == "op_done"
        assert sorted(a.get_target().indices().tolist()) == [11]


def test_serializer_knob_parity():
    """reset_compression_stats / allow_stat_reset /
    optimize_serialize_destroy (src/bmserial.h:189/207) + recorded BIC
    knobs."""
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer
    ser = bm.Serializer(6)
    bv = bm.BitVector.from_indices([1, 70000], size=1 << 18)
    ser.serialize(bv)
    s1 = ser.get_compression_stat()
    assert s1
    ser.allow_stat_reset(False)
    ser.serialize(bv)
    s2 = ser.get_compression_stat()
    assert all(s2[k] == 2 * v for k, v in s1.items())   # accumulated
    ser.allow_stat_reset(True)
    ser.reset_compression_stats()
    assert ser.get_compression_stat() == {}
    ser.set_bic_coeff(64)
    ser.set_bic_dynamic_range_reduce(True)
    t = bv.copy()
    blob = ser.optimize_serialize_destroy(t)
    assert t.count() == 0                      # destroyed
    assert Deserializer().deserialize(blob).equal(bv)


def test_deserializer_set_range_and_ref_format():
    """Deserializer set_range/unset_range (src/bmserial.h:647) + drop-in
    decode of reference-format BLOBs (sniffed by magic) with
    set_ref_vectors."""
    from bitmagic_tpu.serial.refcodec import RefSerializer, ref_serialize
    bv = bm.BitVector.from_indices([5, 100, 200000], size=1 << 18)
    blob = bm.serialize(bv)
    d = bm.Deserializer()
    d.set_range(50, 150000)
    got = d.deserialize(blob)
    assert sorted(got.indices().tolist()) == [100]
    d.unset_range()
    assert d.deserialize(blob).equal(bv)
    # reference-format blob through the same entry point
    rblob = ref_serialize(bv, level=6)
    assert d.deserialize(rblob).equal(bv)
    # XOR-ref-compressed reference blob via set_ref_vectors
    ref = bm.BitVector.from_indices([5, 100, 200000, 300000], size=1 << 19)
    rs = RefSerializer(6)
    rs.set_ref_vectors([(0, bv), (1, ref)])
    rs.set_curr_ref_idx(0)
    model = rs.compute_sim_model()
    rs.set_sim_model(model)
    xblob = rs.serialize(bv)
    d2 = bm.Deserializer()
    d2.set_ref_vectors([(0, bv), (1, ref)])
    assert d2.deserialize(xblob).equal(bv)
    assert rs.get_compression_level() == 6
    rs.reset_compression_stats()
    assert rs.get_compression_stat() == {}


def test_opdeser_deserialize_range():
    """operation_deserializer::deserialize_range semantics
    (src/bmserial.h:8142): target &= windowed decode; empty target
    adopts the window."""
    from bitmagic_tpu import constants as C
    src = bm.BitVector.from_indices([5, 100, 70000, 200000], size=1 << 18)
    blob = bm.serialize(src)
    od = bm.OperationDeserializer()
    empty = bm.BitVector(1 << 18)
    od.deserialize_range(empty, blob, 50, 100000)
    assert sorted(empty.indices().tolist()) == [100, 70000]
    tgt = bm.BitVector.from_indices([100, 300], size=1 << 18)
    od.deserialize_range(tgt, blob, 50, 100000)
    assert sorted(tgt.indices().tolist()) == [100]
    od.set_compression_level(5)


def test_sv_serializer_knobs():
    """sparse_vector_serializer XOR knobs + deserializer finalization
    (src/bmsparsevec_serial.h)."""
    import bitmagic_tpu.serial as serial
    s = serial.SparseVectorSerializer()
    assert s.is_xor_ref()
    s.disable_xor_compression()
    sv = bm.SparseVector.from_array(np.arange(1000, dtype=np.uint32))
    blob_plain = s.serialize(sv)
    s.enable_xor_compression()
    blob_xor = s.serialize(sv)
    d = serial.SparseVectorDeserializer()
    assert d.deserialize(blob_plain).equal(sv)
    assert d.deserialize(blob_xor).equal(sv)
    s.set_xor_ref(None)
    assert not s.is_xor_ref()
    s.set_xor_ref(True)
    assert s.is_xor_ref()
    d.set_finalization("READONLY")
    ro = d.deserialize(blob_xor)
    assert ro.is_ro()
    with pytest.raises(Exception):
        ro.set(0, 5)
    d.set_finalization("open")
    assert not d.deserialize(blob_xor).is_ro()


def test_counted_enumerator_count_and_go_first():
    """counted_enumerator::count() (src/bm.h:760) is 1-based-inclusive;
    go_first rewinds."""
    bv = bm.BitVector.from_indices([4, 9, 70000], size=1 << 18)
    cen = bv.get_counted_enumerator()
    assert cen.count() == 1 and cen.value() == 4
    cen.go_up()
    assert cen.count() == 2 and cen.value() == 9
    cen.go_up()
    assert cen.count() == 3 and cen.value() == 70000
    assert not cen.go_up() and cen.count() == 3      # exhausted
    en = bv.get_enumerator(0)
    en.go_to(9)
    assert en.value() == 9
    en.go_first()
    assert en.value() == 4
    # consumed-bit semantics preserved for the iteration protocol
    cen2 = bv.get_counted_enumerator()
    for _ in range(3):
        next(cen2)
    assert cen2.bit_count == 3


def test_review2_regressions():
    """Second self-review pass findings, pinned."""
    # bit_import_u32 honors size (reference bits_size clip)
    bv = bm.BitVector(64)
    bm.bit_import_u32(bv, np.asarray([0xFFFFFFFF, 0xFFFFFFFF], np.uint32),
                      size=4)
    assert sorted(bv.indices().tolist()) == [0, 1, 2, 3]
    # counted enumerator: go_to/go_first recompute the rank; past-end ++
    # does not inflate
    v = bm.BitVector.from_indices([4, 9, 70000], size=1 << 18)
    cen = v.get_counted_enumerator()
    cen.go_up()
    cen.go_up()
    assert cen.count() == 3
    assert not cen.go_up() and cen.count() == 3
    cen.go_first()
    assert cen.count() == 1 and cen.value() == 4
    cen.go_to(9)
    assert cen.count() == 2 and cen.value() == 9
    # finalization applies to range/gather deserialization too
    import bitmagic_tpu.serial as serial
    sv = bm.SparseVector.from_array(np.arange(1000, dtype=np.uint32))
    blob = serial.sparse_vector_serialize(sv)
    d = serial.SparseVectorDeserializer().set_finalization("READONLY")
    assert d.deserialize_range(blob, 10, 20).is_ro()
    assert d.deserialize_gather(blob, np.asarray([5])).is_ro()
    # wide-run AND through the plain aggregator (no arena) is symbolic
    a = bm.BitVector(1 << 48)
    a.set_range(0, (1 << 40) - 1)
    b = bm.BitVector.from_indices([7, (1 << 39) + 3, (1 << 41) + 5],
                                  size=1 << 48)
    res = bm.Aggregator().combine_and([a, b])
    assert sorted(res.indices().tolist()) == [7, (1 << 39) + 3]
    # run-coded OR keeps spans interval-coded (no MemoryError)
    res_or = bm.Aggregator().combine_or([a, b])
    assert res_or.count() == (1 << 40) + 1
    assert res_or._struct.has_runs
    # and-sub with run operand
    res_as = bm.Aggregator().combine_and_sub([a, b], [bm.BitVector
                                            .from_indices([7], 1 << 48)])
    assert sorted(res_as.indices().tolist()) == [(1 << 39) + 3]


def test_interval_enumerator_class_and_random_subset_class():
    """bm::interval_enumerator<BV> (src/bmintervals.h:52) and
    bm::random_subset<BV> (src/bmrandom.h:58) class shapes."""
    bv = bm.BitVector(1000)
    bv.set_range(10, 20)
    bv.set_range(100, 110)
    ie = bm.IntervalEnumerator(bv)
    assert ie.valid() and (ie.start(), ie.end()) == (10, 20)
    assert ie.advance() and (ie.start(), ie.end()) == (100, 110)
    assert not ie.advance() and not ie.valid()
    assert (bm.IntervalEnumerator(bv, 15, extend_start=False).start()
            == 15)
    assert bm.IntervalEnumerator(bv, 15, extend_start=True).start() == 10
    assert bm.IntervalEnumerator(bv, 21).start() == 100  # next interval
    assert not bm.IntervalEnumerator(bv, 111).valid()
    assert list(bm.IntervalEnumerator(bv)) == [(10, 20), (100, 110)]
    src = bm.BitVector.from_indices(list(range(0, 5000, 5)), size=10000)
    rs = bm.RandomSubset(seed=3)
    out = bm.BitVector(10000)
    rs.sample(out, src, 50)
    assert out.count() == 50 and (out & src).equal(out)


def test_bmatrix_column_ops():
    """basic_bmatrix column/copy parity (src/bmbmatrix.h:207-239/990)."""
    from bitmagic_tpu.sv.bmatrix import BitMatrix
    m = BitMatrix(8, 1000)
    m.set_octet(5, 0, 0xA5)
    assert m.get_octet(5, 0) == 0xA5
    m2 = BitMatrix(8, 1000).copy_from(m)
    assert m2.is_same_structure(m)
    m.insert_column(5, 0x0F)
    assert m.get_octet(5, 0) == 0x0F and m.get_octet(6, 0) == 0xA5
    m.erase_column(5)
    assert m.get_octet(5, 0) == 0xA5
    m.clear_column(5)
    assert m.get_octet(5, 0) == 0
    assert m2.get_octet(5, 0) == 0xA5      # deep copy unaffected
    m.clear_all()
    assert all(r is None for r in m.rows)


def test_review3_regressions():
    """Third self-review pass findings, pinned."""
    # counted enumerator: advance/skip keep the rank honest
    v = bm.BitVector.from_indices([4, 9, 70000], size=1 << 18)
    cen = v.get_counted_enumerator()
    cen.advance()
    assert cen.count() == 2 and cen.value() == 9
    cen2 = v.get_counted_enumerator()
    cen2.skip(2)
    assert cen2.count() == 3 and cen2.value() == 70000
    # BitMatrix.set_octet grows planes on demand
    from bitmagic_tpu.sv.bmatrix import BitMatrix
    m = BitMatrix(8, 1000)
    m.set_octet(5, 1, 0x01)                  # needs plane 8
    assert m.get_octet(5, 1) == 0x01
    # all-run-coded AND group: symbolic fold instead of MemoryError
    a = bm.BitVector(1 << 48)
    a.set_range(0, (1 << 40) - 1)
    b = bm.BitVector(1 << 48)
    b.set_range(0, (1 << 39) - 1)
    res = bm.Aggregator().combine_and([a, b])
    assert res.count() == 1 << 39 and res._struct.has_runs
    s = bm.BitVector.from_indices([3], size=1 << 48)
    res2 = bm.Aggregator().combine_and_sub([a, b], [s])
    assert res2.count() == (1 << 39) - 1
    assert bm.Aggregator().find_first_and_sub([a, b], [s]) == 0
    z = bm.BitVector.from_indices([0], size=1 << 48)
    assert bm.Aggregator().find_first_and_sub([a, b], [z]) == 1
    # run-aware intervals: O(structure), and count_intervals agrees
    w = bm.BitVector(1 << 48)
    w.set_range(100, (1 << 40) - 1)
    ie = bm.IntervalEnumerator(w)
    assert (ie.start(), ie.end()) == (100, (1 << 40) - 1)
    assert not ie.advance()
    assert bm.count_intervals(w) == 3        # 0s, 1s, 0s
