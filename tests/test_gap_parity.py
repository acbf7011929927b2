"""GAP classification parity (core/gaps.py).

The device keeps GAP-classified blocks dense (SURVEY.md §7 decision 3),
but optimize()/calc_stat()/level tables must classify exactly like the
reference (optimize_bit_block src/bmblocks.h:1414, gap_calc_level
src/bmfunc.h:5409, improve_gap_levels :10170, bv_statistics :56).
"""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.core import gaps
from bitmagic_tpu.serial import refformat

SIZE = 20_000_000


def _cases(rng):
    yield "sparse", np.unique(rng.integers(0, SIZE, 3000))
    yield "gappy", np.unique(np.concatenate(
        [np.arange(0, 2_000_000, 137), np.arange(1, 2_000_000, 137)]))
    yield "dense", np.unique(rng.integers(0, 500_000, 350_000))
    starts = rng.integers(0, SIZE - 4000, 80)
    yield "clustered", np.unique(np.concatenate(
        [np.arange(s, s + rng.integers(1, 3000)) for s in starts]))
    yield "mixed", np.unique(np.concatenate(
        [np.arange(100_000, 400_000), rng.integers(0, SIZE, 50_000)]))


def test_gap_calc_level():
    tbl = (128, 256, 512, 1280)
    assert gaps.gap_calc_level(10, tbl) == 0
    assert gaps.gap_calc_level(124, tbl) == 0
    assert gaps.gap_calc_level(125, tbl) == 1
    assert gaps.gap_calc_level(1276, tbl) == 3
    assert gaps.gap_calc_level(1277, tbl) == -1
    lv = gaps.gap_calc_level_arr([10, 125, 1276, 1277], tbl)
    np.testing.assert_array_equal(lv, [0, 1, 3, -1])


def test_best_representation():
    blk = 8192
    # tiny popcount -> array of 1s
    assert gaps.best_representation(3, 65536, 7, blk) == gaps.SET_ARRAY1
    # few runs, many bits -> GAP
    assert gaps.best_representation(30000, 65536, 5, blk) == gaps.SET_GAP
    # near-full -> array of 0s
    assert gaps.best_representation(65530, 65536, 200, blk) == \
        gaps.SET_ARRAY0
    # random dense -> bitset
    assert gaps.best_representation(30000, 65536, 20000, blk) == \
        gaps.SET_BITSET


def test_optimize_classifies_and_stats():
    rng = np.random.default_rng(1)
    ids = np.unique(np.concatenate(
        [np.arange(0, 500_000, 97), rng.integers(600_000, 700_000, 50)]))
    bv = BitVector.from_indices(ids.astype(np.int64), SIZE)
    bv.optimize()
    st = bv.calc_stat()
    assert st["gap_blocks"] > 0
    assert sum(st["gaps_by_level"]) == st["gap_blocks"]
    assert st["memory_used"] >= st["device_memory_used"]
    # content untouched by classification
    np.testing.assert_array_equal(bv.indices(), ids)


def test_set_gap_levels_and_optimize_gap_size():
    ids = np.arange(0, 1_000_000, 211).astype(np.int64)  # ~311/block len
    bv = BitVector.from_indices(ids, SIZE)
    bv.optimize()
    st0 = bv.calc_stat()
    assert st0["gap_blocks"] > 0
    bv.optimize_gap_size()
    st1 = bv.calc_stat()
    # tuned table wastes no more than the default
    assert st1["gap_cap_overhead"] <= st0["gap_cap_overhead"]
    np.testing.assert_array_equal(bv.indices(), ids)
    # explicit table
    bv.set_gap_levels((64, 128, 256, 1280))
    assert bv.get_gap_levels() == (64, 128, 256, 1280)
    bv.optimize()
    assert sum(bv.calc_stat()["gaps_by_level"]) == \
        bv.calc_stat()["gap_blocks"]
    with pytest.raises(ValueError):
        bv.set_gap_levels((1, 2, 3))


def test_strategy_knob():
    bv = BitVector(SIZE)
    import bitmagic_tpu.constants as C
    assert bv.set_new_blocks_strat(C.BM_GAP) == C.BM_BIT
    assert bv.get_new_blocks_strat() == C.BM_GAP


@pytest.mark.skipif(not refformat.available(),
                    reason="reference bridge unavailable")
def test_classification_matches_reference_exactly():
    rng = np.random.default_rng(5)
    for name, ids in _cases(rng):
        ids = ids.astype(np.int64)
        want = refformat.reference_gap_stat(ids, SIZE)
        bv = BitVector.from_indices(ids, SIZE)
        bv.optimize()
        got = bv.calc_stat()
        assert got["gap_blocks"] == want["gap_blocks"], name
        assert got["bit_blocks"] == want["bit_blocks"], name
        assert got["gaps_by_level"] == want["gaps_by_level"], name
        assert got["gap_cap_overhead"] == want["gap_cap_overhead"], name
