"""BitVector vs golden-model property tests.

Shape mirrors the reference stress strategy (tests/stress/t.cpp): randomized
fills in several distributions, every operation mirrored into a naive golden
bitset, exhaustive comparison after each step.
"""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.utils.golden import GoldenBitSet, random_indices

SIZE = 4 * BITS_PER_BLOCK + 777   # multi-block with ragged tail


def make_pair(rng, size=SIZE, density=0.02, style="uniform"):
    idx = random_indices(rng, size, density, style)
    return BitVector.from_indices(idx, size), GoldenBitSet.from_indices(idx, size)


def check_same(bv: BitVector, g: GoldenBitSet):
    assert bv.count() == g.count()
    np.testing.assert_array_equal(bv.indices(), g.indices())


@pytest.mark.parametrize("style", ["uniform", "intervals", "borders"])
def test_construction(rng, style):
    bv, g = make_pair(rng, style=style)
    check_same(bv, g)


def test_set_get_single(rng):
    bv = BitVector(SIZE)
    g = GoldenBitSet(SIZE)
    for i in rng.integers(0, SIZE, 200):
        bv.set(int(i))
        g.set(int(i))
    for i in rng.integers(0, SIZE, 50):
        bv.set(int(i), False)
        g.set(int(i), False)
    check_same(bv, g)
    probe = rng.integers(0, SIZE, 100)
    np.testing.assert_array_equal(bv.get_bits(probe), g.bits[probe])


def test_set_bit_conditional_and_inc(rng):
    bv = BitVector(SIZE)
    assert bv.set_bit_conditional(10, True, False) is True
    assert bv.test(10)
    assert bv.set_bit_conditional(10, True, False) is False
    assert bv.inc(11) is False        # was 0
    assert bv.test(11)
    assert bv.inc(11) is True         # was 1
    assert not bv.test(11)
    assert bv.set_bit_and(10, True) is True
    assert bv.set_bit_and(10, False) is False
    assert not bv.test(10)


@pytest.mark.parametrize("op", ["and", "or", "xor", "sub"])
@pytest.mark.parametrize("style", ["uniform", "intervals"])
def test_logic_ops(rng, op, style):
    bva, ga = make_pair(rng, style=style)
    bvb, gb = make_pair(rng, style=style, density=0.05)
    res = {"and": bva & bvb, "or": bva | bvb,
           "xor": bva ^ bvb, "sub": bva - bvb}[op]
    getattr(ga, op + "_")(gb)
    check_same(res, ga)


@pytest.mark.parametrize("op", ["and", "or", "xor", "sub"])
def test_logic_inplace_and_3op(rng, op):
    bva, ga = make_pair(rng)
    bvb, gb = make_pair(rng, density=0.05)
    c = BitVector(SIZE)
    getattr(c, "bit_" + op)(bva, bvb)          # 3-operand form
    a2 = bva.copy()
    getattr(a2, "bit_" + op)(bvb)              # 2-operand form
    getattr(ga, op + "_")(gb)
    check_same(c, ga)
    check_same(a2, ga)


def test_logic_with_full_blocks(rng):
    bva, ga = make_pair(rng)
    bva.set_range(BITS_PER_BLOCK, 3 * BITS_PER_BLOCK - 1)   # 2 FULL blocks
    ga.set_range(BITS_PER_BLOCK, 3 * BITS_PER_BLOCK - 1)
    bva.optimize()
    assert bva.calc_stat()["full_blocks"] >= 1
    bvb, gb = make_pair(rng, density=0.05)
    for op in ["and", "or", "xor", "sub"]:
        res = {"and": bva & bvb, "or": bva | bvb,
               "xor": bva ^ bvb, "sub": bva - bvb}[op]
        g2 = ga.copy()
        getattr(g2, op + "_")(gb)
        check_same(res, g2)


def test_bit_or_and(rng):
    bva, ga = make_pair(rng)
    bvb, gb = make_pair(rng)
    bvc, gc = make_pair(rng)
    bva.bit_or_and(bvb, bvc)
    t = gb.copy(); t.and_(gc); ga.or_(t)
    check_same(bva, ga)


def test_count_range_and_rank(rng):
    bv, g = make_pair(rng, density=0.03)
    for _ in range(20):
        lo = int(rng.integers(0, SIZE))
        hi = int(rng.integers(lo, SIZE))
        assert bv.count_range(lo, hi) == g.count_range(lo, hi), (lo, hi)
    for i in rng.integers(0, SIZE, 20):
        assert bv.count_to(int(i)) == g.count_to(int(i))
        assert bv.rank_corrected(int(i)) == g.count_to(int(i)) - g.test(int(i))


def test_set_range(rng):
    bv, g = make_pair(rng)
    for _ in range(10):
        lo = int(rng.integers(0, SIZE))
        hi = int(rng.integers(lo, SIZE))
        val = bool(rng.integers(0, 2))
        bv.set_range(lo, hi, val)
        g.set_range(lo, hi, val)
    check_same(bv, g)


def test_invert(rng):
    bv, g = make_pair(rng, size=2 * BITS_PER_BLOCK + 100)
    bv.invert()
    g.invert()
    check_same(bv, g)
    bv.invert()
    g.invert()
    check_same(bv, g)


def test_find_family(rng):
    bv, g = make_pair(rng, density=0.001)
    assert bv.find() == g.find()
    assert bv.find_reverse() == g.find_reverse()
    for _ in range(20):
        frm = int(rng.integers(0, SIZE))
        assert bv.find(frm) == g.find(frm), frm
    fr = bv.find_range()
    assert fr == (g.find(), g.find_reverse())
    empty = BitVector(SIZE)
    assert empty.find() == -1
    assert empty.find_reverse() == -1
    assert empty.find_range() is None


def test_equal_compare_mismatch(rng):
    bva, _ = make_pair(rng)
    bvb = bva.copy()
    assert bva.equal(bvb)
    assert bva.compare(bvb) == 0
    assert bva.find_first_mismatch(bvb) == -1
    i = int(bva.find())
    bvb.set(i, False)
    assert not bva.equal(bvb)
    assert bva.find_first_mismatch(bvb) == i
    assert bva.compare(bvb) == 1
    assert bvb.compare(bva) == -1


def test_shift_insert_erase(rng):
    size = BITS_PER_BLOCK + 500
    bv, g = make_pair(rng, size=size, density=0.01)
    bv.shift_right()
    gb = np.zeros(size, bool); gb[1:] = g.bits[:-1]; g.bits = gb
    check_same(bv, g)
    bv.shift_left()
    gb = np.zeros(size, bool); gb[:-1] = g.bits[1:]; g.bits = gb
    check_same(bv, g)
    for _ in range(5):
        i = int(rng.integers(0, size - 1))
        val = bool(rng.integers(0, 2))
        bv.insert(i, val)
        g.bits = np.concatenate([g.bits[:i], [val], g.bits[i:-1]])
        check_same(bv, g)
        bv.erase(i)
        g.bits = np.concatenate([g.bits[:i], g.bits[i + 1:], [False]])
        check_same(bv, g)


def test_resize_and_tail(rng):
    bv, g = make_pair(rng)
    new_size = SIZE // 2 + 13
    bv.resize(new_size)
    g.resize(new_size)
    check_same(bv, g)
    bv.resize(SIZE * 2)
    g.resize(SIZE * 2)
    check_same(bv, g)


def test_bulk_keep_clear(rng):
    bv, g = make_pair(rng, density=0.05)
    ids = random_indices(rng, SIZE, 0.03)
    bv2 = bv.copy(); bv2.keep(ids)
    mask = np.zeros(SIZE, bool); mask[ids] = True
    g2 = g.copy(); g2.bits &= mask
    check_same(bv2, g2)
    bv3 = bv.copy(); bv3.clear_many(ids)
    g3 = g.copy(); g3.bits &= ~mask
    check_same(bv3, g3)


def test_merge_and_swap(rng):
    bva, ga = make_pair(rng)
    bvb, gb = make_pair(rng)
    keep_b = bvb.copy()
    bva.merge(bvb)
    ga.or_(gb)
    check_same(bva, ga)
    assert bvb.none()
    x, y = make_pair(rng)[0], keep_b
    xi, yi = x.indices(), y.indices()
    x.swap(y)
    np.testing.assert_array_equal(x.indices(), yi)
    np.testing.assert_array_equal(y.indices(), xi)


def test_freeze(rng):
    bv, _ = make_pair(rng)
    bv.freeze()
    assert bv.is_ro()
    with pytest.raises(Exception):
        bv.set(0)
    c = bv.copy()        # copy of frozen is writable
    c.set(0)


def test_from_words_roundtrip(rng):
    bv, g = make_pair(rng)
    words = bv.to_words()
    bv2 = BitVector.from_words(words, SIZE)
    check_same(bv2, g)
    g2 = GoldenBitSet.from_words(words, SIZE)
    np.testing.assert_array_equal(g2.indices(), g.indices())


def test_copy_range(rng):
    bv, g = make_pair(rng, density=0.05)
    lo, hi = BITS_PER_BLOCK // 2, 3 * BITS_PER_BLOCK
    dst = BitVector(SIZE)
    dst.copy_range(bv, lo, hi)
    g2 = GoldenBitSet(SIZE)
    g2.bits[lo:hi + 1] = g.bits[lo:hi + 1]
    check_same(dst, g2)


def test_optimize_stats(rng):
    bv = BitVector(SIZE)
    bv.set_range(0, BITS_PER_BLOCK * 2 - 1)
    bv.set(BITS_PER_BLOCK * 3 + 5)
    bv.set(BITS_PER_BLOCK * 3 + 5, False)
    bv.optimize()
    st = bv.calc_stat()
    assert st["full_blocks"] == 2
    assert st["bit_blocks"] == 0
    assert bv.count() == BITS_PER_BLOCK * 2


def test_optimize_to_full_keeps_later_blocks_aligned(rng):
    """Regression: optimize() reclassifying dense all-ones BIT rows to FULL
    must remove their pool rows with the OLD slot mapping, or every later
    block reads a shifted row (caught on-chip via ref-format round-trip)."""
    big = 10 * BITS_PER_BLOCK + 777
    bv = BitVector(big)
    ids = np.concatenate([
        rng.integers(0, BITS_PER_BLOCK, 500),             # partial block 0
        np.arange(BITS_PER_BLOCK * 2, BITS_PER_BLOCK * 5),  # blocks 2-4 ones
        rng.integers(BITS_PER_BLOCK * 7, BITS_PER_BLOCK * 8, 700),
        [big - 3],
    ]).astype(np.int64)
    ids = np.unique(ids)
    bv.set_many(ids)
    before = bv.indices()
    np.testing.assert_array_equal(before, ids)
    bv.optimize()
    st = bv.calc_stat()
    assert st["full_blocks"] == 3
    np.testing.assert_array_equal(bv.indices(), ids)
    assert bv.count() == len(ids)


def test_48bit_addressing():
    big = 1 << 40
    ids = np.asarray([0, BITS_PER_BLOCK, big - 1, big - BITS_PER_BLOCK], np.int64)
    bv = BitVector.from_indices(ids, big)
    assert bv.count() == 4
    np.testing.assert_array_equal(bv.indices(), np.sort(ids))
    assert bv.test(big - 1)
    assert not bv.test(big - 2)
    assert bv.count_range(big - BITS_PER_BLOCK, big - 1) == 2


def test_any_range_and_is_all_one_range(rng):
    bv = BitVector(10_000_000)
    bv.set_range(100_000, 200_000)          # FULL + partial blocks
    bv.set(5_000_000)
    assert bv.any_range(0, 99_999) is False
    assert bv.any_range(0, 100_000) is True
    assert bv.any_range(150_000, 150_000) is True
    assert bv.any_range(200_001, 4_999_999) is False
    assert bv.any_range(4_999_999, 5_000_001) is True
    assert bv.any_range(5_000_001, 9_999_999) is False
    assert bv.is_all_one_range(100_000, 200_000) is True
    assert bv.is_all_one_range(100_000, 200_001) is False
    assert bv.is_all_one_range(99_999, 200_000) is False
    assert bv.is_all_one_range(131_072, 196_607) is True   # pure FULL blocks
    # degenerate / out-of-range
    assert bv.any_range(50, 10) is False
    assert bv.is_all_one_range(9_999_999, 10_000_005) is False


def test_reference_api_aliases(rng):
    bv = BitVector(1_000_000)
    bv.set_range(100, 200)
    bv.clear_range(150, 160)
    assert bv.count() == 101 - 11
    assert bv.get_first() == 100
    assert bv.get_next(149) == 161
    assert bv.extract_next(199) == 200
    assert bv.test(200) is False or not bv.test(200)
    bv.flip(100)
    assert not bv.test(100)
    inv = bv.copy()
    inv.flip()
    assert inv.count() == 1_000_000 - bv.count()
    # optimize_range only reclassifies blocks inside the range
    w = BitVector(10_000_000)
    w.set_range(0, 131_071)              # blocks 0-1 become full-bit content
    x = BitVector(10_000_000)
    x.set(5_000_000)
    w |= x
    w -= x                               # op leaves a zero-content BIT block
    w.optimize_range(0, 131_071)
    st = w.calc_stat()
    assert st["full_blocks"] == 2
    # the zero block at 5M was outside the range: still present as BIT
    assert st["bit_blocks"] == 1
    w.optimize()
    assert w.calc_stat()["bit_blocks"] == 0
