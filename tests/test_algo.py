"""Algorithm layer tests: set-op counts/distances, traversal splits, rank
compression, intervals, 3VL, sampling (reference suites in
tests/stress/t.cpp: distance/count ops, interval tests :21100, 3VL :8842)."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector, algo
from bitmagic_tpu.algo import kleene
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.utils.golden import GoldenBitSet, random_indices

SIZE = 4 * BITS_PER_BLOCK + 99


def pair(rng, density=0.02, style="uniform"):
    idx = random_indices(rng, SIZE, density, style)
    return BitVector.from_indices(idx, SIZE), GoldenBitSet.from_indices(idx, SIZE)


def test_count_ops(rng):
    a, ga = pair(rng)
    b, gb = pair(rng, 0.05)
    aa, bb = ga._aligned(gb)
    assert algo.count_and(a, b) == int((aa & bb).sum())
    assert algo.count_or(a, b) == int((aa | bb).sum())
    assert algo.count_xor(a, b) == int((aa ^ bb).sum())
    assert algo.count_sub(a, b) == int((aa & ~bb).sum())
    assert algo.any_and(a, b) == bool((aa & bb).any())
    assert algo.any_sub(a, b) == bool((aa & ~bb).any())


def test_distance_batch_with_full_blocks(rng):
    a, ga = pair(rng)
    a.set_range(0, 2 * BITS_PER_BLOCK - 1)
    ga.set_range(0, 2 * BITS_PER_BLOCK - 1)
    a.optimize()
    b, gb = pair(rng, 0.05)
    metrics = [algo.COUNT_AND, algo.COUNT_OR, algo.COUNT_XOR,
               algo.COUNT_SUB_AB, algo.COUNT_SUB_BA, algo.COUNT_A, algo.COUNT_B]
    res = algo.distance_operation(a, b, metrics)
    aa, bb = ga._aligned(gb)
    want = {
        algo.COUNT_AND: int((aa & bb).sum()),
        algo.COUNT_OR: int((aa | bb).sum()),
        algo.COUNT_XOR: int((aa ^ bb).sum()),
        algo.COUNT_SUB_AB: int((aa & ~bb).sum()),
        algo.COUNT_SUB_BA: int((bb & ~aa).sum()),
        algo.COUNT_A: int(aa.sum()),
        algo.COUNT_B: int(bb.sum()),
    }
    assert res == want


def test_similarity_batch(rng):
    vs = [pair(rng, 0.03)[0] for _ in range(4)]
    m = algo.similarity_batch(vs, algo.COUNT_AND)
    for i in range(4):
        assert m[i, i] == vs[i].count()
        for j in range(4):
            if i != j:
                assert m[i, j] == algo.count_and(vs[i], vs[j])


def test_for_each_bit(rng):
    bv, g = pair(rng, 0.001)
    seen = []
    algo.for_each_bit(bv, seen.append)
    np.testing.assert_array_equal(np.asarray(seen), g.indices())
    seen2 = []
    algo.for_each_bit_range(bv, 100, SIZE // 2, seen2.append)
    gi = g.indices()
    np.testing.assert_array_equal(
        np.asarray(seen2, np.int64), gi[(gi >= 100) & (gi <= SIZE // 2)])


def test_rank_range_split(rng):
    bv, g = pair(rng, 0.02)
    parts = algo.rank_range_split(bv, 100)
    total = 0
    prev_end = -1
    for lo, hi in parts:
        assert lo > prev_end
        c = bv.count_range(lo, hi)
        assert c <= 100
        total += c
        prev_end = hi
    assert total == g.count()


def test_rank_compress_roundtrip(rng):
    src, _ = pair(rng, 0.02)
    index, _ = pair(rng, 0.05)
    comp = algo.compress(src, index)
    # golden: positions of src bits within index's set-bit list
    si = set(src.indices().tolist())
    ii = index.indices()
    want = np.flatnonzero([int(x) in si for x in ii])
    np.testing.assert_array_equal(comp.indices(), want)
    # decompress recovers src & index
    dec = algo.decompress(comp, index)
    both = src & index
    assert dec.equal(both)


def test_intervals(rng):
    bv = BitVector(SIZE)
    runs = [(5, 10), (12, 12), (100, 300), (BITS_PER_BLOCK - 2, BITS_PER_BLOCK + 2)]
    for lo, hi in runs:
        bv.set_range(lo, hi)
    got = algo.intervals(bv)
    np.testing.assert_array_equal(got, np.asarray(runs))
    assert algo.is_interval(bv, 5, 10)
    assert not algo.is_interval(bv, 5, 9)       # not flanked by 0 on right
    assert not algo.is_interval(bv, 6, 10)
    assert algo.find_interval_start(bv, 200) == 100
    assert algo.find_interval_end(bv, 200) == 300
    assert algo.find_interval_start(bv, 11) is None
    assert algo.find_interval_start(bv, BITS_PER_BLOCK) == BITS_PER_BLOCK - 2
    assert algo.find_interval_end(bv, BITS_PER_BLOCK) == BITS_PER_BLOCK + 2


def test_kleene(rng):
    v1 = BitVector(SIZE); k1 = BitVector(SIZE)
    v2 = BitVector(SIZE); k2 = BitVector(SIZE)
    # positions: 0 true&true, 1 true&false, 2 true&unknown, 3 false&unknown,
    # 4 false&false, 5 unknown&unknown
    kleene.set_value_kleene(v1, k1, 0, 1); kleene.set_value_kleene(v2, k2, 0, 1)
    kleene.set_value_kleene(v1, k1, 1, 1); kleene.set_value_kleene(v2, k2, 1, -1)
    kleene.set_value_kleene(v1, k1, 2, 1); kleene.set_value_kleene(v2, k2, 2, 0)
    kleene.set_value_kleene(v1, k1, 3, -1); kleene.set_value_kleene(v2, k2, 3, 0)
    kleene.set_value_kleene(v1, k1, 4, -1); kleene.set_value_kleene(v2, k2, 4, -1)
    av, ak = kleene.and_kleene(v1, k1, v2, k2)
    want_and = {0: 1, 1: -1, 2: 0, 3: -1, 4: -1, 5: 0}
    for i, w in want_and.items():
        assert kleene.get_value_kleene(av, ak, i) == w, i
    ov, ok_ = kleene.or_kleene(v1, k1, v2, k2)
    want_or = {0: 1, 1: 1, 2: 1, 3: 0, 4: -1, 5: 0}
    for i, w in want_or.items():
        assert kleene.get_value_kleene(ov, ok_, i) == w, i
    # NOT
    nv = v1.copy()
    kleene.invert_kleene(nv, k1)
    assert kleene.get_value_kleene(nv, k1, 0) == -1
    assert kleene.get_value_kleene(nv, k1, 3) == 1
    assert kleene.get_value_kleene(nv, k1, 5) == 0


def test_random_subset(rng):
    bv, g = pair(rng, 0.02)
    sub = algo.random_subset(bv, 50, seed=7)
    assert sub.count() == 50
    assert (sub & bv).equal(sub)          # subset property
    sub2 = algo.random_subset(bv, 10**9, seed=7)
    assert sub2.equal(bv)                  # n >= total -> whole set
    assert algo.random_subset(bv, 0).none()


def test_kleene_value_tables_and_visit_range(rng):
    from bitmagic_tpu.algo.kleene import and_values_kleene, or_values_kleene
    from bitmagic_tpu.algo.traversal import visit_each_bit_range
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            wa = -1 if (a == -1 or b == -1) else \
                (1 if (a == 1 and b == 1) else 0)
            wo = 1 if (a == 1 or b == 1) else \
                (-1 if (a == -1 and b == -1) else 0)
            assert and_values_kleene(a, b) == wa
            assert or_values_kleene(a, b) == wo
    bv = BitVector.from_indices([5, 50, 500, 5000], 10_000)
    seen = []
    visit_each_bit_range(bv, 10, 600, seen.append)
    assert seen == [50, 500]
