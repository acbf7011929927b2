"""48-bit address-space boundary suite — the stress64 analog.

The reference compiles its whole stress suite a second time with BM64ADDR
(tests/stress64/t64.cpp) because address-width bugs hide at the borders:
ids straddling 2^32, the top of the 48-bit space, and block/sub-block
edges far above the int32 range.  This framework's convention is int64
ids on the host and int32 (row, offset) on device, so the same borders
are where truncation bugs would live.  Every test here cross-checks
against plain Python int/set arithmetic.
"""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.core.bitvector import BitVector

_I64 = np.int64
TOP = C.ID_MAX48                       # 2**48
B32 = 1 << 32

# ids deliberately straddling every interesting border: block edges around
# 2^32, the rs3 sub-block borders high up, and the last addressable bits
BORDER_IDS = np.asarray(sorted({
    0, 1, 65535, 65536,
    B32 - 65537, B32 - 65536, B32 - 1, B32, B32 + 1, B32 + 65536,
    (1 << 40) + 21824, (1 << 40) + 43648,          # rs3 borders in a block
    TOP - 65537, TOP - 65536, TOP - 2, TOP - 1,
}), _I64)


@pytest.fixture(scope="module")
def border_bv():
    return BitVector.from_indices(BORDER_IDS, TOP)


def test_set_test_count_at_borders(border_bv):
    bv = border_bv
    assert bv.count() == len(BORDER_IDS)
    for i in BORDER_IDS:
        assert bv.test(int(i)), i
        assert not bv.test(int(i) - 1) or (int(i) - 1) in BORDER_IDS
    np.testing.assert_array_equal(bv.indices(), BORDER_IDS)
    # single-bit mutations at the very top
    w = bv.copy()
    w.set(TOP - 3, True)
    w.clear_bit(TOP - 1)
    assert w.test(TOP - 3) and not w.test(TOP - 1)
    assert w.count() == len(BORDER_IDS)


def test_find_family_at_top(border_bv):
    bv = border_bv
    assert bv.get_first() == 0
    assert bv.find_reverse() == TOP - 1
    assert bv.get_next(B32 - 1) == B32
    assert bv.get_next(TOP - 2) == TOP - 1
    # find in an empty tail region
    lo, hi = (1 << 41), (1 << 42)
    assert bv.count_range(lo, hi) == 0
    w = bv.copy()
    assert w.extract_next(TOP - 3) == TOP - 2
    assert not w.test(TOP - 2)


def test_logic_ops_high_ids():
    rng = np.random.default_rng(48)
    base = (1 << 47)
    ia = np.unique(rng.integers(base, TOP, 5000)).astype(_I64)
    ib = np.unique(rng.integers(base, TOP, 5000)).astype(_I64)
    # force some overlap and the extreme bit
    ib[:100] = ia[:100]
    ib = np.unique(np.append(ib, [TOP - 1]))
    ia = np.unique(np.append(ia, [TOP - 1]))
    a = BitVector.from_indices(ia, TOP)
    b = BitVector.from_indices(ib, TOP)
    sa, sb = set(ia.tolist()), set(ib.tolist())
    assert sorted(sa & sb) == (a & b).indices().tolist()
    assert sorted(sa | sb) == (a | b).indices().tolist()
    assert sorted(sa ^ sb) == (a ^ b).indices().tolist()
    assert sorted(sa - sb) == (a - b).indices().tolist()
    assert bm.count_and(a, b) == len(sa & sb)
    assert bm.any_and(a, b)


def test_set_range_straddling_2_32():
    bv = BitVector(TOP)
    lo, hi = B32 - 70_000, B32 + 70_000
    bv.set_range(lo, hi)
    assert bv.count() == hi - lo + 1
    assert bv.count_range(lo, hi) == hi - lo + 1
    assert bv.test(B32 - 1) and bv.test(B32) and not bv.test(hi + 1)
    bv.optimize()          # interval classifies FULL/GAP, never truncates
    assert bv.count() == hi - lo + 1
    assert bv.find_reverse() == hi
    # intervals view agrees
    assert bm.is_interval(bv, lo, hi)
    assert bm.find_interval_start(bv, B32) == lo
    assert bm.find_interval_end(bv, B32) == hi


def test_rank_select_48bit(border_bv):
    bv = border_bv.copy()
    bv.build_rs_index()
    ids = BORDER_IDS
    # rank: count_to at every border id is its 1-based position
    for k, i in enumerate(ids, start=1):
        assert bv.count_to(int(i)) == k, i
    # select is 1-based: select(k) == ids[k-1]
    for k in (1, 2, len(ids) // 2, len(ids) - 1, len(ids)):
        assert bv.select(k) == int(ids[k - 1]), k
    assert bv.find_rank(len(ids), 0) == int(ids[-1])
    # rank(p) == count_to(p) and rank_corrected == rank - test
    for probe in (B32, (1 << 45) + 12345, TOP - 3, TOP - 1):
        want = int((ids <= probe).sum())
        assert bv.count_to(probe) == want
        assert bv.rank_corrected(probe) == want - int(bv.test(probe))


def test_enumerator_and_traversal_high(border_bv):
    got = []
    it = border_bv.first()
    while it.valid():
        got.append(it.value())
        it.go_up()
    assert got == BORDER_IDS.tolist()
    it = border_bv.get_enumerator(0)
    it.go_to(B32)
    assert it.value() == B32
    it.skip(2)
    assert it.value() == BORDER_IDS[BORDER_IDS.tolist().index(B32) + 2]
    # visit_each_bit sees the same ids
    seen = []
    bm.visit_each_bit(border_bv, lambda i: seen.append(i))
    assert seen == BORDER_IDS.tolist()


@pytest.mark.parametrize("fmt", ["bmt1", "ref"])
def test_serialize_roundtrip_48bit(border_bv, fmt):
    bv = border_bv.copy()
    bv.set_range(B32 - 70_000, B32 + 70_000)
    bv.optimize()
    if fmt == "bmt1":
        blob = bm.Serializer(6).serialize(bv)
        back = bm.Deserializer().deserialize(blob)
    else:
        from bitmagic_tpu.serial.refcodec import ref_deserialize, ref_serialize
        blob = ref_serialize(bv, level=5)
        back = ref_deserialize(blob)
    assert back.equal(bv)
    assert back.find_reverse() == TOP - 1


def test_range_deserialize_high_window(border_bv):
    bv = border_bv
    blob = bm.Serializer(6).serialize(bv)
    lo, hi = (1 << 40), TOP - 1
    win = bm.Deserializer().deserialize_range(blob, lo, hi)
    want = BORDER_IDS[(BORDER_IDS >= lo) & (BORDER_IDS <= hi)]
    np.testing.assert_array_equal(win.indices(), want)


def test_opdeser_counts_48bit(border_bv):
    from bitmagic_tpu.serial.opdeser import OperationDeserializer
    rng = np.random.default_rng(7)
    other = BitVector.from_indices(
        np.unique(np.append(rng.integers(TOP - (1 << 20), TOP, 2000),
                            BORDER_IDS[-4:])).astype(_I64), TOP)
    blob = bm.Serializer(6).serialize(other)
    od = OperationDeserializer()
    sa = set(BORDER_IDS.tolist())
    sb = set(other.indices().tolist())
    assert od.deserialize(border_bv.copy(), blob, C.SET_COUNT_AND) == \
        len(sa & sb)
    assert od.deserialize(border_bv.copy(), blob, C.SET_COUNT_OR) == \
        len(sa | sb)
    tgt = border_bv.copy()
    od.deserialize(tgt, blob, C.SET_OR)
    assert sorted(sa | sb) == tgt.indices().tolist()


def test_sparse_vector_48bit_positions():
    sv = bm.SparseVector(np.uint64, nullable=True)
    pos = [0, B32 - 1, B32, (1 << 44) + 7, TOP - 2]
    vals = [1, (1 << 63) | 5, 7, 1 << 40, 2**64 - 1]
    for p, v in zip(pos, vals):
        sv.set(p, np.uint64(v))
    for p, v in zip(pos, vals):
        assert int(sv[p]) == v, p
    got = sv.gather(np.asarray(pos, _I64)).astype(np.uint64)
    np.testing.assert_array_equal(got, np.asarray(vals, np.uint64))
    assert not sv.is_null(B32) and sv.is_null(B32 + 1)
    # scanner over a huge-but-sparse element space
    sc = bm.SparseVectorScanner()
    hits = sc.find_eq(sv, np.uint64(7)).indices()
    assert hits.tolist() == [B32]


def test_gap_residency_48bit():
    """A sparse vector spanning the full 2^48 space stays succinct."""
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, TOP, 20_000)).astype(_I64)
    bv = BitVector.from_indices(ids, TOP, strategy=C.BM_GAP)
    assert bv._gaps is not None and bv._gaps.n_blocks > 10_000
    st = bv.calc_stat()
    # succinct: ~a level-0 GAP block (256 B) per touched block, nowhere
    # near the dense cost (8 KB/block)
    n_blocks = bv._gaps.n_blocks
    assert st["memory_used"] < n_blocks * 512
    assert st["memory_used"] < n_blocks * C.SET_BLOCK_SIZE * 4 // 8
    np.testing.assert_array_equal(bv.indices(), ids)
    assert bv.count() == ids.size
    bv.build_rs_index()
    k = ids.size // 2
    assert bv.select(k) == int(ids[k - 1])


def test_shift_insert_erase_block_boundaries():
    """Shift helpers stitch carries across ABSENT neighbor blocks: the old
    contiguous-span formulation dropped a bit crossing the lowest present
    block's boundary (erase/shift_left data loss) and was O(address span)
    on sparse 48-bit vectors."""
    bv = BitVector.from_indices(np.asarray([65536], _I64), 2 ** 20)
    bv.erase(0)
    assert bv.indices().tolist() == [65535]
    bv2 = BitVector.from_indices(np.asarray([65536, 200000], _I64), 2 ** 20)
    bv2.erase(5)
    assert bv2.indices().tolist() == [65535, 199999]
    b = BitVector.from_indices(np.asarray([65536], _I64), 2 ** 20)
    b.shift_left()
    assert b.indices().tolist() == [65535]
    # far-apart blocks stay O(own blocks) and carry correctly both ways
    b3 = BitVector.from_indices(np.asarray([0, B32, TOP - 2], _I64), TOP)
    b3.shift_right()
    assert b3.indices().tolist() == [1, B32 + 1, TOP - 1]
    b3.shift_left()
    assert b3.indices().tolist() == [0, B32, TOP - 2]
    b4 = BitVector.from_indices(np.asarray([7, 1 << 40], _I64), TOP)
    b4.insert(3, True)
    assert b4.indices().tolist() == [3, 8, (1 << 40) + 1]
    b4.erase(3)
    assert b4.indices().tolist() == [7, 1 << 40]
    # bit shifted past the end of the space is dropped
    b5 = BitVector.from_indices(np.asarray([TOP - 1], _I64), TOP)
    b5.shift_right()
    assert b5.indices().tolist() == []


def test_sv_serialization_48bit_positions():
    """Both wire formats round-trip SVs whose assigned positions span the
    48-bit element space (NULL planes + value slices at huge block ids)."""
    from bitmagic_tpu.serial.ref_sv import (deserialize_sv_blob,
                                            deserialize_str_blob,
                                            serialize_sv_blob,
                                            serialize_str_blob)
    from bitmagic_tpu.serial.sv_serial import (sparse_vector_deserialize,
                                               sparse_vector_serialize)
    sv = bm.SparseVector(np.uint32, nullable=True)
    pos = [0, B32 - 1, B32, (1 << 44) + 7, TOP - 2]
    vals = [9, 12345, 7, 42, 2 ** 31]
    for p, v in zip(pos, vals):
        sv.set(p, v)
    back = sparse_vector_deserialize(sparse_vector_serialize(sv))
    rback = deserialize_sv_blob(serialize_sv_blob(sv), np.uint32)
    for p, v in zip(pos, vals):
        assert int(back[p]) == v and int(rback[p]) == v, p
        assert not back.is_null(p)
    assert back.is_null(5)
    st = bm.StrSparseVector(8, nullable=True)
    st.set(1 << 40, "hello")
    st.set(3, "abc")
    stb = deserialize_str_blob(serialize_str_blob(st))
    assert stb.get(1 << 40) == "hello" and stb.get(3) == "abc"
