"""GAP succinct in-memory residency (VERDICT round-1 item 1).

After optimize(), GAP-classified blocks leave the device pool and live as
host run buffers (core/gapstore.py) — the analog of the reference's D-GAP
block storage (src/bmblocks.h:1245 set_gap_block).  Content must be
identical through every API, and sparse vectors must cost runs, not 8 KB
dense rows.
"""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.algo import setops
from bitmagic_tpu.agg import Aggregator
from bitmagic_tpu.serial.serializer import deserialize, serialize

SIZE = 50_000_000


def _sparse_ids(rng, n=30_000):
    return np.unique(rng.integers(0, SIZE, n)).astype(np.int64)


@pytest.fixture(scope="module")
def gap_bv():
    rng = np.random.default_rng(42)
    ids = _sparse_ids(rng)
    bv = bm.BitVector.from_indices(ids, SIZE)
    bv.optimize()
    return bv, ids


def test_residency_shrinks_device_pool(gap_bv):
    bv, ids = gap_bv
    st = bv.calc_stat()
    assert st["gap_blocks"] > 0
    # sparse data: nearly every block must be GAP-resident
    assert st["gap_blocks"] >= 0.9 * (st["gap_blocks"] + st["bit_blocks"])
    # device HBM cost is only the (few) dense rows
    assert st["device_memory_used"] <= st["bit_blocks"] * 8192 + 4096 \
        + 16 * (st["gap_blocks"] + st["bit_blocks"])


def test_memory_within_reference_model(gap_bv):
    """VERDICT done-criterion: memory within ~1.5x of the reference's GAP
    cost model (gap buffers at level capacity) on sparse data."""
    bv, ids = gap_bv
    st = bv.calc_stat()
    # reference cost: gap blocks at capacity*2 bytes + dense blocks 8KB
    ref_model = sum(
        st["gaps_by_level"][lv] * st["gap_levels"][lv] * 2
        for lv in range(4)) + st["bit_blocks"] * 8192
    assert st["memory_used"] <= 1.5 * ref_model + (1 << 16)


def test_content_identical_through_all_apis(gap_bv):
    bv, ids = gap_bv
    np.testing.assert_array_equal(bv.indices(), ids)
    assert bv.count() == ids.size
    # point queries
    rng = np.random.default_rng(0)
    probe = np.concatenate([ids[:500], rng.integers(0, SIZE, 500)])
    np.testing.assert_array_equal(bv.get_bits(probe), np.isin(probe, ids))
    # ranges
    for lo, hi in [(0, SIZE - 1), (ids[10], ids[-10]),
                   (int(ids[5]), int(ids[5]))]:
        want = int(((ids >= lo) & (ids <= hi)).sum())
        assert bv.count_range(lo, hi) == want
    # find family
    assert bv.find(0) == ids[0]
    assert bv.find(int(ids[7]) + 1) == int(ids[np.searchsorted(ids, ids[7] + 1)])
    assert bv.find_reverse() == ids[-1]


def test_rank_select_on_gap(gap_bv):
    bv, ids = gap_bv
    bv.build_rs_index()
    rng = np.random.default_rng(3)
    ranks = np.concatenate([[1, ids.size], rng.integers(1, ids.size, 300)])
    got = bv._rs_index().select_batch(ranks)
    np.testing.assert_array_equal(got, ids[ranks - 1])
    qs = ids[rng.integers(0, ids.size, 200)]
    got_r = bv._rs_index().rank_batch(qs)
    want_r = np.searchsorted(ids, qs, side="right")
    np.testing.assert_array_equal(got_r, want_r)


def test_binary_ops_preserve_content(gap_bv):
    bv, ids = gap_bv
    other = bm.BitVector.from_indices(ids[::3], SIZE)
    other.optimize()      # both operands GAP-resident
    np.testing.assert_array_equal((bv & other).indices(), ids[::3])
    np.testing.assert_array_equal((bv - other).indices(),
                                  np.setdiff1d(ids, ids[::3]))
    assert (bv ^ bv).none()
    u = bv | other
    assert u == bv
    assert setops.count_and(bv, other) == ids[::3].size
    assert setops.count_sub(bv, other) == ids.size - ids[::3].size


def test_aggregator_and_arena_on_gap(gap_bv):
    bv, ids = gap_bv
    v2 = bm.BitVector.from_indices(ids[::2], SIZE)
    v2.optimize()
    v3 = bm.BitVector.from_indices(ids[1::2], SIZE)
    agg = Aggregator()
    r = agg.combine_and_sub([bv, v2], [v3])
    want = np.setdiff1d(ids[::2], ids[1::2])
    np.testing.assert_array_equal(r.indices(), want)
    # arena path expands GAP rows without mutating the owners
    from bitmagic_tpu.agg.arena import OperandArena
    arena = OperandArena([bv, v2, v3])
    assert bv._gaps is not None and v2._gaps is not None
    r2 = agg.combine_and_sub_arena(arena, [0, 1], [2])
    r2.optimize()
    np.testing.assert_array_equal(r2.indices(), want)


def test_serialize_bytes_representation_independent(gap_bv):
    bv, ids = gap_bv
    raw = bm.BitVector.from_indices(ids, SIZE)     # dense-resident twin
    assert serialize(bv) == serialize(raw)
    assert deserialize(serialize(bv)) == bv


def test_deoptimize_roundtrip(gap_bv):
    bv, ids = gap_bv
    twin = bv.copy()
    assert twin._gaps is not None
    twin._deoptimize_gaps()
    assert twin._gaps is None
    assert (twin._struct.cls == C.CLS_GAP).sum() == 0
    np.testing.assert_array_equal(twin.indices(), ids)
    twin.optimize()
    assert twin._gaps is not None
    assert twin == bv


def test_mutation_on_gap_resident(gap_bv):
    bv, ids = gap_bv
    twin = bv.copy()
    newbit = int(ids[0]) + 1 if int(ids[0]) + 1 not in set(ids[:3]) else 7
    twin.set(newbit, True)
    assert twin.test(newbit)
    assert twin.count() == ids.size + 1
    twin.set(newbit, False)
    assert twin == bv


def test_set_gap_levels_reexpands():
    ids = np.arange(0, 1_000_000, 211).astype(np.int64)  # ~311 runs/block
    bv = bm.BitVector.from_indices(ids, SIZE)
    bv.optimize()
    assert bv.calc_stat()["gap_blocks"] > 0
    # a table too small for these lengths forces blocks back to dense
    bv.set_gap_levels((8, 16, 32, 64))
    bv.optimize()
    assert bv.calc_stat()["gap_blocks"] == 0
    np.testing.assert_array_equal(bv.indices(), ids)


def test_sharded_ingest_from_gap(gap_bv):
    bv, ids = gap_bv
    words = bv.to_words()
    got = np.flatnonzero(
        np.unpackbits(words.view(np.uint8), bitorder="little"))
    np.testing.assert_array_equal(got, ids)


def test_gap_domain_binary_ops(gap_bv):
    """Sparse x sparse ops run in the run domain (gap_buff_op analog):
    no device kernel, results stay succinct."""
    import bitmagic_tpu.core.bitvector as bvmod
    bv, ids = gap_bv
    rng = np.random.default_rng(77)
    ids2 = np.unique(rng.integers(0, SIZE, 25_000)).astype(np.int64)
    other = bm.BitVector.from_indices(ids2, SIZE)
    other.optimize()
    calls = []
    orig = bvmod._binary_kernel
    bvmod._binary_kernel = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        checks = [((bv & other), np.intersect1d(ids, ids2)),
                  ((bv | other), np.union1d(ids, ids2)),
                  ((bv ^ other), np.setxor1d(ids, ids2)),
                  ((bv - other), np.setdiff1d(ids, ids2))]
        for r, want in checks:
            np.testing.assert_array_equal(r.indices(), want)
            assert (r._struct.cls == C.CLS_BIT).sum() == 0
    finally:
        bvmod._binary_kernel = orig
    assert not calls, "sparse x sparse op touched the device kernel"


def test_gap_identity_passthrough(gap_bv):
    bv, ids = gap_bv
    full = bm.BitVector(SIZE)
    full.set_range(0, SIZE - 1)
    empty = bm.BitVector(SIZE)
    assert (bv & full) == bv
    assert (bv | empty) == bv
    assert (bv - empty) == bv
    x = bv ^ full                      # complement pass-through
    assert x.count() == SIZE - ids.size
    assert not x.get_bits(ids[:100]).any()
    assert (full - bv).count() == SIZE - ids.size


def test_setops_run_domain(gap_bv):
    """Distance metrics over gap-resident pairs compute in the run domain:
    no device metric kernel engages."""
    import bitmagic_tpu.algo.setops as so
    bv, ids = gap_bv
    rng = np.random.default_rng(88)
    ids2 = np.unique(rng.integers(0, SIZE, 20_000)).astype(np.int64)
    other = bm.BitVector.from_indices(ids2, SIZE)
    other.optimize()
    calls = []
    orig = so._metric_kernel
    so._metric_kernel = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        res = so.distance_operation(bv, other, list(so._METRICS))
    finally:
        so._metric_kernel = orig
    sa, sb = set(ids.tolist()), set(ids2.tolist())
    assert res["count_and"] == len(sa & sb)
    assert res["count_or"] == len(sa | sb)
    assert res["count_xor"] == len(sa ^ sb)
    assert res["count_sub_ab"] == len(sa - sb)
    assert res["count_sub_ba"] == len(sb - sa)
    assert res["count_a"] == len(sa) and res["count_b"] == len(sb)
    assert not calls


def test_aggregator_sparse_group_fold(gap_bv):
    """Group AND / AND-SUB over all-succinct operands folds in the run
    domain: no device aggregator kernel, succinct result."""
    import sys
    am = sys.modules["bitmagic_tpu.agg.aggregator"]
    bv, ids = gap_bv
    rng = np.random.default_rng(99)
    vs, sets = [bv], [set(ids.tolist())]
    for _ in range(3):
        i2 = np.unique(rng.integers(0, SIZE, 15_000)).astype(np.int64)
        v = bm.BitVector.from_indices(i2, SIZE)
        v.optimize()
        vs.append(v)
        sets.append(set(i2.tolist()))
    agg = Aggregator()
    calls = []
    orig = am._agg_kernel
    am._agg_kernel = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        r = agg.combine_and(vs[:3])
        assert set(r.indices().tolist()) == (sets[0] & sets[1] & sets[2])
        r2 = agg.combine_and_sub(vs[:2], vs[2:])
        assert set(r2.indices().tolist()) == \
            (sets[0] & sets[1]) - sets[2] - sets[3]
        assert (r2._struct.cls == C.CLS_BIT).sum() == 0
    finally:
        am._agg_kernel = orig
    assert not calls
    # aliasing guard: single-operand fold returns a copy
    r4 = agg.combine_and_sub([vs[0]], [])
    assert r4 is not vs[0] and r4 == vs[0]


def test_bm_gap_strategy_direct_build():
    """BM_GAP strategy builds blocks directly as succinct runs (reference
    check_allocate_block under BM_GAP): no dense materialization, overflow
    blocks fall back to dense, bulk mutations stay in the run domain."""
    import bitmagic_tpu.core.bitvector as bvmod
    rng = np.random.default_rng(55)
    ids = np.unique(np.concatenate(
        [rng.integers(0, SIZE, 25_000),
         np.arange(1_000_000, 1_000_000 + 2 * C.BITS_PER_BLOCK),
         rng.integers(3_000_000, 3_200_000, 60_000),   # run-overflow block
         [0, SIZE - 1]])).astype(np.int64)
    calls = []
    orig = bvmod._binary_kernel
    bvmod._binary_kernel = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        bv = bm.BitVector.from_indices(ids, SIZE, strategy=C.BM_GAP)
    finally:
        bvmod._binary_kernel = orig
    assert not calls                       # construction is device-free
    st = bv.calc_stat()
    assert st["gap_blocks"] > 0
    assert bv.get_new_blocks_strat() == C.BM_GAP
    np.testing.assert_array_equal(np.asarray(bv.indices()), ids)
    assert bv.count() == ids.size
    # parity with the dense-built twin
    twin = bm.BitVector.from_indices(ids, SIZE)
    assert bv == twin
    from bitmagic_tpu.serial.serializer import serialize
    assert serialize(bv) == serialize(twin)
    # bulk mutations keep the strategy + correctness
    more = np.unique(rng.integers(0, SIZE, 4_000)).astype(np.int64)
    bv.set_many(more)
    want = np.union1d(ids, more)
    np.testing.assert_array_equal(np.asarray(bv.indices()), want)
    bv.clear_many(more)
    np.testing.assert_array_equal(np.asarray(bv.indices()),
                                  np.setdiff1d(want, more))


def test_combine_or_sparse_fold(gap_bv):
    import sys
    am = sys.modules["bitmagic_tpu.agg.aggregator"]
    bv, ids = gap_bv
    rng = np.random.default_rng(101)
    i2 = np.unique(rng.integers(0, SIZE, 12_000)).astype(np.int64)
    v2 = bm.BitVector.from_indices(i2, SIZE, strategy=C.BM_GAP)
    calls = []
    orig = am._agg_kernel
    am._agg_kernel = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        r = Aggregator().combine_or([bv, v2])
        np.testing.assert_array_equal(np.asarray(r.indices()),
                                      np.union1d(ids, i2))
    finally:
        am._agg_kernel = orig
    assert not calls


def test_deserialize_gap_direct_residency():
    """Decode-side GAP residency (round 5): a GAP-heavy BLOB
    deserializes with D-GAP records kept in run form — succinct GapStore
    residency, ZERO dense rows for gap blocks (the reference likewise
    reads gap blocks as gap blocks, src/bmserial.h read_gap_block)."""
    import numpy as np
    from bitmagic_tpu import BitVector, constants as C
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer
    rng = np.random.default_rng(11)
    size = 64 * C.BITS_PER_BLOCK
    starts = rng.integers(0, size - 400, 500)
    ids = np.unique(np.concatenate(
        [np.arange(s, s + l)
         for s, l in zip(starts, rng.integers(30, 300, 500))]))
    bv = BitVector.from_indices(ids, size)
    bv.optimize()
    assert (bv._struct.cls == C.CLS_GAP).any()
    blob = Serializer(6).serialize(bv)
    back = Deserializer().deserialize(blob)
    assert back.equal(bv)
    n_gap = int((back._struct.cls == C.CLS_GAP).sum())
    n_bit = int((back._struct.cls == C.CLS_BIT).sum())
    assert n_gap > 0 and back._gaps is not None
    assert back._gaps.n_blocks == n_gap
    # gap records decoded without any dense row for them
    assert (back._pool_np is None
            or back._pool_np.shape[0] == n_bit)
    # GAP-direct round trip is byte-stable
    assert Serializer(6).serialize(back) == blob


def test_range_deserialize_gap_direct_residency():
    """The Python record loop (range path + no-native fallback) also
    keeps D-GAP records succinct (round-5: previously the last path that
    expanded gap payloads to dense rows)."""
    import numpy as np
    from bitmagic_tpu import BitVector, constants as C
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer
    rng = np.random.default_rng(21)
    size = 64 * C.BITS_PER_BLOCK
    starts = rng.integers(0, size - 400, 600)
    ids = np.unique(np.concatenate(
        [np.arange(s, s + l)
         for s, l in zip(starts, rng.integers(30, 300, 600))]))
    bv = BitVector.from_indices(ids, size)
    bv.optimize()
    blob = Serializer(6).serialize(bv)
    lo, hi = 3 * C.BITS_PER_BLOCK + 17, 40 * C.BITS_PER_BLOCK - 5
    win = Deserializer().deserialize_range(blob, lo, hi)
    g = bv.copy()
    g.keep_range(lo, hi)
    assert win.equal(g)
    assert (win._struct.cls == C.CLS_GAP).sum() > 0   # stayed succinct
    # pure-python fallback path too
    import pytest
    from bitmagic_tpu.serial import native
    if native.load() is not None:
        import unittest.mock as mock
        with mock.patch.object(native, "bmt1_decode_gap",
                               lambda *a, **k: None), \
             mock.patch.object(native, "bmt1_decode",
                               lambda *a, **k: None):
            full = Deserializer().deserialize(blob)
        assert full.equal(bv)
        assert (full._struct.cls == C.CLS_GAP).sum() > 0
