"""Target-side streaming of BLOB ops (round-2 VERDICT item 4).

A GAP-resident target must stay succinct during AND/COUNT_AND/... on a
BLOB: no _dense_snapshot, GAP expansion bounded by the streaming window
(O(chunk), not O(target)), and the result of a set op on a succinct
target comes back succinct.  Results stay bit-equal to the materialized
path.
"""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.core.bitvector import BitVector
from bitmagic_tpu.core.gapstore import GapStore
from bitmagic_tpu.serial import opdeser as od_mod
from bitmagic_tpu.serial.opdeser import OperationDeserializer
from bitmagic_tpu.serial.serializer import Deserializer, Serializer

SIZE = 100_000_000


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    # GAP-resident sparse target spanning the full 100M-bit range
    ids_a = np.unique(rng.integers(0, SIZE, 30_000)).astype(np.int64)
    a = BitVector.from_indices(ids_a, SIZE, strategy=C.BM_GAP)
    assert a._gaps is not None and a._gaps.n_blocks > 1000
    # BLOB covering the whole range too (the worst case for snapshots)
    ids_b = np.unique(rng.integers(0, SIZE, 40_000)).astype(np.int64)
    b = BitVector.from_indices(ids_b, SIZE)
    b.set_range(1_000_000, 1_200_000)
    blob = Serializer(6).serialize(b)
    bref = Deserializer().deserialize(blob)
    return a, blob, bref


class _Guard:
    """Forbids _dense_snapshot and meters GAP expansion width."""

    def __init__(self, monkeypatch):
        self.max_expand = 0
        orig = GapStore.to_dense

        def boom(bv):
            raise AssertionError("BLOB op took a dense target snapshot")

        def metered(store, sel=None):
            k = store.n_blocks if sel is None else len(np.asarray(sel))
            self.max_expand = max(self.max_expand, k)
            return orig(store, sel)

        monkeypatch.setattr(BitVector, "_dense_snapshot", boom)
        monkeypatch.setattr(GapStore, "to_dense", metered)


@pytest.mark.parametrize("op,metric", [
    (C.SET_COUNT_AND, lambda a, b: (a & b).count()),
    (C.SET_COUNT_OR, lambda a, b: (a | b).count()),
    (C.SET_COUNT_XOR, lambda a, b: (a ^ b).count()),
    (C.SET_COUNT_SUB_AB, lambda a, b: (a - b).count()),
    (C.SET_COUNT_SUB_BA, lambda a, b: (b - a).count()),
])
@pytest.mark.parametrize("use_native", [True, False])
def test_count_ops_bounded_expansion(setup, monkeypatch, op, metric,
                                     use_native):
    a, blob, bref = setup
    want = metric(a.copy(), bref)
    if use_native and od_mod.native.load() is None:
        pytest.skip("native codec library unavailable")
    if not use_native:
        monkeypatch.setattr(od_mod.native, "load", lambda: None)
        monkeypatch.setattr(od_mod.native, "bmt1_record_index",
                            lambda *_: None)
        monkeypatch.setattr(od_mod.native, "bmt1_stream_op",
                            lambda *a_, **k: None)
    g = _Guard(monkeypatch)
    got = OperationDeserializer().deserialize(a.copy(), blob, op)
    assert got == want
    if use_native:
        # run-coded target view: COUNT_* never expand the GAP side at all
        # (the native engine folds counts in the run domain / one scratch
        # block); the Python fallback streams with the bounded window
        assert g.max_expand == 0
    else:
        assert 0 < g.max_expand <= od_mod._CHUNK


@pytest.mark.parametrize("op,pyop", [
    (C.SET_AND, "__and__"), (C.SET_OR, "__or__"),
    (C.SET_XOR, "__xor__"), (C.SET_SUB, "__sub__"),
])
@pytest.mark.parametrize("use_native", [True, False])
def test_set_ops_bounded_and_succinct_result(setup, monkeypatch, op, pyop,
                                             use_native):
    a, blob, bref = setup
    want = getattr(a.copy(), pyop)(bref)
    if use_native and od_mod.native.load() is None:
        pytest.skip("native codec library unavailable")
    if not use_native:
        monkeypatch.setattr(od_mod.native, "load", lambda: None)
        monkeypatch.setattr(od_mod.native, "bmt1_record_index",
                            lambda *_: None)
        monkeypatch.setattr(od_mod.native, "bmt1_stream_op",
                            lambda *a_, **k: None)
    g = _Guard(monkeypatch)
    tgt = a.copy()
    OperationDeserializer().deserialize(tgt, blob, op)
    assert g.max_expand <= od_mod._CHUNK
    # succinct target -> succinct result: the dense pool must stay a
    # fraction of the block count (sparse AND/OR results re-classify to GAP)
    n_dense = int((tgt._struct.cls == C.CLS_BIT).sum())
    assert n_dense <= od_mod._CHUNK, \
        f"{n_dense} dense rows leaked into a succinct result"
    assert tgt.equal(want)


def test_ref_format_blob_bounded(setup, monkeypatch):
    """Reference-format BLOBs stream against the succinct target too."""
    pytest.importorskip("numpy")
    from bitmagic_tpu.serial.refcodec import ref_serialize
    a, _, bref = setup
    rblob = ref_serialize(bref, level=5)
    want_cnt = (a.copy() & bref).count()
    want_or = a.copy() | bref
    g = _Guard(monkeypatch)
    od = OperationDeserializer()
    assert od.deserialize(a.copy(), rblob, C.SET_COUNT_AND) == want_cnt
    tgt = a.copy()
    od.deserialize(tgt, rblob, C.SET_OR)
    assert g.max_expand <= od_mod._CHUNK
    assert tgt.equal(want_or)
    assert int((tgt._struct.cls == C.CLS_BIT).sum()) <= od_mod._CHUNK


@pytest.mark.parametrize("gap_target", [True, False])
def test_mixed_target_full_op_matrix(gap_target):
    """Run-coded target plumbing (cls 3 in the native engine): every
    count + set op over a target that mixes GAP, dense and FULL blocks,
    cross-checked against a numpy golden.  gap_target=False pins the
    dense-row path through the same plumbing."""
    rng = np.random.default_rng(1234)
    size = 64 * C.BITS_PER_BLOCK
    idx_b = np.unique(rng.integers(0, size, size // 120))
    bv_b = BitVector.from_indices(idx_b, size)
    bv_b.set_range(2 * C.BITS_PER_BLOCK, 4 * C.BITS_PER_BLOCK - 1)
    bv_b.optimize()
    blob = Serializer(6).serialize(bv_b)

    idx_a = np.unique(rng.integers(0, size, size // 180))
    tgt0 = BitVector.from_indices(idx_a, size)
    tgt0.set_range(3 * C.BITS_PER_BLOCK, 5 * C.BITS_PER_BLOCK - 1)
    # one genuinely dense block so the target mixes classes
    dense_ids = np.arange(0, C.BITS_PER_BLOCK, 2, dtype=np.int64) \
        + 7 * C.BITS_PER_BLOCK
    tgt0.set_many(dense_ids)

    a = np.zeros(size, bool)
    a[idx_a] = True
    a[3 * C.BITS_PER_BLOCK:5 * C.BITS_PER_BLOCK] = True
    a[dense_ids] = True
    b = np.zeros(size, bool)
    b[idx_b] = True
    b[2 * C.BITS_PER_BLOCK:4 * C.BITS_PER_BLOCK] = True

    od = OperationDeserializer()
    counts = {C.SET_COUNT_AND: (a & b), C.SET_COUNT_OR: (a | b),
              C.SET_COUNT_XOR: (a ^ b), C.SET_COUNT_SUB_AB: (a & ~b),
              C.SET_COUNT_SUB_BA: (b & ~a)}
    for op, ref in counts.items():
        t = tgt0.copy()
        if gap_target:
            t.optimize()
            assert t._gaps is not None and t._gaps.n_blocks > 0
        assert od.deserialize(t, blob, op) == int(ref.sum()), op
    sets = {C.SET_AND: (a & b), C.SET_OR: (a | b),
            C.SET_XOR: (a ^ b), C.SET_SUB: (a & ~b)}
    for op, ref in sets.items():
        t = tgt0.copy()
        if gap_target:
            t.optimize()
        od.deserialize(t, blob, op)
        assert np.array_equal(np.asarray(t.indices()),
                              np.flatnonzero(ref)), op
