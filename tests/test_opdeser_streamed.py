"""Streamed operation_deserializer (VERDICT round-1 item 5).

AND/OR/XOR/SUB and every COUNT_* apply block-record-by-block-record against
the BLOB — the BLOB is never materialized into a BitVector (reference
operation_deserializer, src/bmserial.h:1006).  Payloads that cannot affect
the result are skipped without decoding.
"""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.serial import opdeser as od_mod
from bitmagic_tpu.serial import native
from bitmagic_tpu.serial.opdeser import OperationDeserializer
from bitmagic_tpu.serial.serializer import Deserializer, Serializer

SIZE = 30_000_000


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    ids_a = np.unique(rng.integers(0, SIZE, 40_000)).astype(np.int64)
    ids_b = np.unique(rng.integers(0, SIZE, 50_000)).astype(np.int64)
    a = bm.BitVector.from_indices(ids_a, SIZE)
    a.set_range(500_000, 700_000)
    a.optimize()                       # GAP + FULL mix in the target
    b = bm.BitVector.from_indices(ids_b, SIZE)
    b.set_range(600_000, 800_000)
    blob = Serializer(6).serialize(b)
    bref = Deserializer().deserialize(blob)
    return a, b, blob, bref


_SET_OPS = [(C.SET_AND, "__and__"), (C.SET_OR, "__or__"),
            (C.SET_XOR, "__xor__"), (C.SET_SUB, "__sub__")]
_COUNT_OPS = [
    (C.SET_COUNT_AND, lambda a, b: (a & b).count()),
    (C.SET_COUNT_OR, lambda a, b: (a | b).count()),
    (C.SET_COUNT_XOR, lambda a, b: (a ^ b).count()),
    (C.SET_COUNT_SUB_AB, lambda a, b: (a - b).count()),
    (C.SET_COUNT_SUB_BA, lambda a, b: (b - a).count()),
    (C.SET_COUNT_B, lambda a, b: b.count()),
    (C.SET_COUNT_A, lambda a, b: a.count()),
]


def _no_materialize(monkeypatch):
    """Make any attempt to materialize the BLOB into a BitVector fail."""
    def boom(self, data, range_=None):
        raise AssertionError("streamed op materialized the BLOB")
    monkeypatch.setattr(Deserializer, "deserialize", boom)


@pytest.mark.parametrize("use_native", [True, False])
def test_set_ops_streamed_bit_equal(setup, monkeypatch, use_native):
    a, b, blob, bref = setup
    wants = {op: getattr(a, pyop)(bref) for op, pyop in _SET_OPS}
    if not use_native:
        monkeypatch.setattr(native, "bmt1_stream_op",
                            lambda *a_, **k_: None)
    _no_materialize(monkeypatch)
    od = OperationDeserializer()
    for op, pyop in _SET_OPS:
        t = a.copy()
        od.deserialize(t, blob, op)
        assert t == wants[op], f"op {op}"


@pytest.mark.parametrize("use_native", [True, False])
def test_count_ops_streamed(setup, monkeypatch, use_native):
    a, b, blob, bref = setup
    wants = {op: fn(a, bref) for op, fn in _COUNT_OPS}
    if not use_native:
        monkeypatch.setattr(native, "bmt1_stream_op",
                            lambda *a_, **k_: None)
    _no_materialize(monkeypatch)
    od = OperationDeserializer()
    for op, _ in _COUNT_OPS:
        assert od.deserialize(a.copy(), blob, op) == wants[op], f"op {op}"


def test_and_skips_payloads_outside_target(monkeypatch):
    """AND against a target covering few blocks must not decode payloads of
    the other blocks (the record-length skip = bookmark role)."""
    rng = np.random.default_rng(3)
    big = bm.BitVector.from_indices(
        np.unique(rng.integers(0, SIZE, 60_000)), SIZE)
    blob = Serializer(6).serialize(big)
    target = bm.BitVector.from_indices([5, 100, 70_000], SIZE)  # 2 blocks
    calls = []
    orig = od_mod._decode_payload
    monkeypatch.setattr(od_mod, "_decode_payload",
                        lambda *a_: calls.append(1) or orig(*a_))
    monkeypatch.setattr(native, "bmt1_stream_op", lambda *a_, **k_: None)
    od = OperationDeserializer()
    got = od.deserialize(target.copy(), blob, C.SET_COUNT_AND)
    assert got == (target & big).count()
    n_blob_blocks = len(big._struct.nb)
    assert len(calls) <= 2 < n_blob_blocks


def test_assign_and_ref_format(setup):
    a, b, blob, bref = setup
    t = a.copy()
    OperationDeserializer().deserialize(t, blob, C.SET_ASSIGN)
    assert t == bref
    # reference-format BLOB path still applies correctly
    from bitmagic_tpu.serial import ref_serialize
    rblob = ref_serialize(b)
    t2 = a.copy()
    OperationDeserializer().deserialize(t2, rblob, C.SET_AND)
    assert t2 == (a & bref)


def test_streamed_result_sizes(setup):
    a, b, blob, bref = setup
    t = a.copy()
    OperationDeserializer().deserialize(t, blob, C.SET_OR)
    assert t.size == max(a.size, bref.size)


def test_ref_format_streamed(setup, monkeypatch):
    """Reference-format BLOBs stream through RefDeserializer's sink mode:
    set and count ops never materialize the BLOB (VERDICT item 5, both
    formats)."""
    from bitmagic_tpu.serial import ref_serialize, ref_deserialize
    import bitmagic_tpu.serial.refcodec as rc
    a, b, _, _ = setup
    blob = ref_serialize(b, level=6)
    bref = ref_deserialize(blob)
    orig = rc.RefDeserializer.deserialize

    def guard(self, data, range_=None, sink=None):
        assert sink is not None, "ref-format op materialized the BLOB"
        return orig(self, data, range_=range_, sink=sink)

    monkeypatch.setattr(rc.RefDeserializer, "deserialize", guard)
    od = OperationDeserializer()
    for op, pyop in _SET_OPS:
        t = a.copy()
        od.deserialize(t, blob, op)
        assert t == getattr(a, pyop)(bref), op
    for op, fn in _COUNT_OPS:
        assert od.deserialize(a.copy(), blob, op) == fn(a, bref), op


def test_count_shortcut_matrix_all_ops_tstates_records():
    """The positions/run-domain COUNT_* shortcuts must agree with the
    materialized goldens for every op x target-state (absent/FULL/dense
    rows) x record family (ARR16/ARR_BIC at L6, GAP_GAMMA at L4,
    GAP_BIC for run-structured data)."""
    rng = np.random.default_rng(5)
    size = 64 * C.BITS_PER_BLOCK

    # run-structured source (GAP records) and random source (ARR records)
    runs = bm.BitVector(size)
    p = 0
    while p < size - 2000:
        ln = int(rng.integers(1, 1500))
        runs.set_range(p, min(p + ln - 1, size - 1))
        p += ln + int(rng.integers(1, 4000))
    runs.optimize()
    rand = bm.BitVector.from_indices(
        np.unique(rng.integers(0, size, 40_000)), size)
    blobs = [Serializer(6).serialize(runs), Serializer(4).serialize(runs),
             Serializer(6).serialize(rand), Serializer(1).serialize(rand)]

    od = OperationDeserializer()
    ops = ((C.SET_COUNT_AND, lambda a, b: (a & b).count()),
           (C.SET_COUNT_OR, lambda a, b: (a | b).count()),
           (C.SET_COUNT_XOR, lambda a, b: (a ^ b).count()),
           (C.SET_COUNT_SUB_AB, lambda a, b: (a - b).count()),
           (C.SET_COUNT_SUB_BA, lambda a, b: (b - a).count()))
    for src, blob in zip((runs, runs, rand, rand), blobs):
        for tseed in (1, 2):
            r2 = np.random.default_rng(tseed)
            t = bm.BitVector.from_indices(
                np.unique(r2.integers(0, size, 60_000)), size)
            t.set_range(3 * C.BITS_PER_BLOCK, 5 * C.BITS_PER_BLOCK - 1)
            t.clear_range(8 * C.BITS_PER_BLOCK, 11 * C.BITS_PER_BLOCK - 1)
            t.optimize()     # mixes FULL, absent and dense target blocks
            for op, gold in ops:
                got = od.deserialize(t.copy(), blob, op)
                want = gold(t.copy(), src)
                assert got == want, (tseed, op, got, want)


def test_opdeser_xor_ref_blob():
    """VERDICT #5 (round 4): reference-format BLOBs compressed with XOR
    references stream through OperationDeserializer given a ref collection
    (reference deserialize_xor + set_ref_vectors, src/bmserial.h:1060-1093),
    bit-equal to materialize-then-op."""
    from bitmagic_tpu.serial import refcodec
    from tests.test_refcodec import _xor_pair
    rng = np.random.default_rng(31)
    size = 3_000_000
    tgt_ids, ref_ids = _xor_pair(rng, size)
    bv_x = bm.BitVector.from_indices(tgt_ids, size)
    bv_r = bm.BitVector.from_indices(ref_ids, size)
    ser = refcodec.RefSerializer(6, ref_vectors=[(0, bv_r)])
    blob = ser.serialize(bv_x)
    assert ser.compression_stat.get("xor_ref")      # XOR records present
    od = OperationDeserializer(ref_vectors=[(0, bv_r)])
    t = bm.BitVector.from_indices(
        np.unique(rng.integers(0, size, 50_000)), size)
    t.set_range(9 * C.BITS_PER_BLOCK, 12 * C.BITS_PER_BLOCK - 1)
    t.optimize()
    count_ops = ((C.SET_COUNT_AND, lambda a, b: (a & b).count()),
                 (C.SET_COUNT_OR, lambda a, b: (a | b).count()),
                 (C.SET_COUNT_XOR, lambda a, b: (a ^ b).count()),
                 (C.SET_COUNT_SUB_AB, lambda a, b: (a - b).count()),
                 (C.SET_COUNT_SUB_BA, lambda a, b: (b - a).count()))
    for op, gold in count_ops:
        assert od.deserialize(t.copy(), blob, op) == gold(t, bv_x), op
    set_ops = ((C.SET_AND, lambda a, b: a & b),
               (C.SET_OR, lambda a, b: a | b),
               (C.SET_XOR, lambda a, b: a ^ b),
               (C.SET_SUB, lambda a, b: a - b))
    for op, gold in set_ops:
        t2 = t.copy()
        od.deserialize(t2, blob, op)
        assert t2.equal(gold(t, bv_x)), op
    # set_ref_vectors after construction (reference API shape)
    od2 = OperationDeserializer().set_ref_vectors([(0, bv_r)])
    assert od2.deserialize(t.copy(), blob, C.SET_COUNT_AND) == \
        (t & bv_x).count()
    # without the collection the op must fail loudly, not corrupt
    import pytest
    with pytest.raises(ValueError):
        OperationDeserializer().deserialize(t.copy(), blob, C.SET_COUNT_AND)
