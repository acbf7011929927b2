"""Randomized stress test in the reference's style (tests/stress/t.cpp
StressTest :11378): long random operation sequences, every op mirrored into
the golden model, full comparison + serialization round-trip at checkpoints.
"""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.serial import Deserializer, Serializer
from bitmagic_tpu.utils.golden import GoldenBitSet, random_indices

SIZE = 3 * BITS_PER_BLOCK + 4321
N_STEPS = 60


def check(bv, g, step):
    assert bv.count() == g.count(), f"count mismatch at step {step}"
    np.testing.assert_array_equal(bv.indices(), g.indices(),
                                  err_msg=f"step {step}")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_stress_random_ops(seed):
    rng = np.random.default_rng(seed)
    bv = BitVector(SIZE)
    g = GoldenBitSet(SIZE)
    others = []
    for step in range(N_STEPS):
        op = rng.integers(0, 13)
        if op == 0:       # bulk set
            ids = random_indices(rng, SIZE, 0.01)
            bv.set_many(ids); g.bits[ids] = True
        elif op == 1:     # bulk clear
            ids = random_indices(rng, SIZE, 0.01)
            bv.clear_many(ids); g.bits[ids] = False
        elif op == 2:     # range set/clear
            lo = int(rng.integers(0, SIZE)); hi = int(rng.integers(lo, SIZE))
            val = bool(rng.integers(0, 2))
            bv.set_range(lo, hi, val); g.set_range(lo, hi, val)
        elif op == 3:     # single bits
            for i in rng.integers(0, SIZE, 5):
                v = bool(rng.integers(0, 2))
                bv.set(int(i), v); g.set(int(i), v)
        elif op == 4:     # logic with a random operand
            idx = random_indices(rng, SIZE, 0.02)
            other = BitVector.from_indices(idx, SIZE)
            og = GoldenBitSet.from_indices(idx, SIZE)
            which = rng.integers(0, 4)
            [bv.bit_and, bv.bit_or, bv.bit_xor, bv.bit_sub][which](other)
            [g.and_, g.or_, g.xor_, g.sub_][which](og)
            others.append((other, og))
        elif op == 5:     # invert
            bv.invert(); g.invert()
        elif op == 6:     # optimize must not change content
            bv.optimize()
        elif op == 7:     # serialization round-trip mid-stream
            level = int(rng.integers(0, 7))
            blob = Serializer(level).serialize(bv)
            bv = Deserializer().deserialize(blob)
        elif op == 8:     # shift
            if rng.integers(0, 2):
                bv.shift_right()
                nb_ = np.zeros(SIZE, bool); nb_[1:] = g.bits[:-1]; g.bits = nb_
            else:
                bv.shift_left()
                nb_ = np.zeros(SIZE, bool); nb_[:-1] = g.bits[1:]; g.bits = nb_
        elif op == 9:     # rank/select spot checks
            if g.count():
                i = int(rng.integers(0, SIZE))
                assert bv.count_to(i) == g.count_to(i)
                r = int(rng.integers(1, g.count() + 1))
                assert bv.select(r) == g.select(r)
        elif op == 10:    # clear_range + single-bit flip
            lo = int(rng.integers(0, SIZE)); hi = int(rng.integers(lo, SIZE))
            bv.clear_range(lo, hi); g.set_range(lo, hi, False)
            i = int(rng.integers(0, SIZE))
            bv.flip(i); g.set(i, not g.bits[i])
        elif op == 11:    # REFERENCE-format round-trip mid-stream
            from bitmagic_tpu.serial import refcodec
            level = int(rng.integers(0, 7))
            bv = refcodec.ref_deserialize(refcodec.ref_serialize(bv, level))
            bv.resize(SIZE)
        else:             # range predicates vs golden
            lo = int(rng.integers(0, SIZE)); hi = int(rng.integers(lo, SIZE))
            assert bv.any_range(lo, hi) == bool(g.bits[lo:hi + 1].any())
            assert bv.is_all_one_range(lo, hi) == bool(
                g.bits[lo:hi + 1].all())
            assert bv.count_range(lo, hi) == int(g.bits[lo:hi + 1].sum())
        if step % 10 == 9:
            check(bv, g, step)
    check(bv, g, "final")
    # final serialization round-trip at max compression
    blob = Serializer(6).serialize(bv)
    assert Deserializer().deserialize(blob).equal(bv)


@pytest.mark.parametrize("seed", [11, 12])
def test_stress_insert_erase_and_refcodec(seed):
    """Bit-shifting insert/erase plus reference-format round-trips mixed
    into the op stream (reference stress mixes serialization the same
    way, t.cpp:11378)."""
    from bitmagic_tpu.serial import refcodec
    rng = np.random.default_rng(seed)
    bv = BitVector(SIZE)
    g = GoldenBitSet(SIZE)
    ids = random_indices(rng, SIZE, 0.02)
    bv.set_many(ids)
    g.bits[ids] = True
    for step in range(30):
        op = rng.integers(0, 4)
        if op == 0:       # insert a bit (shifts everything up)
            i = int(rng.integers(0, SIZE))
            v = bool(rng.integers(0, 2))
            bv.insert(i, v)
            nb_ = np.zeros(SIZE, bool)
            nb_[:i] = g.bits[:i]
            nb_[i] = v
            nb_[i + 1:] = g.bits[i:-1]
            g.bits = nb_
        elif op == 1:     # erase a bit (shifts everything down)
            i = int(rng.integers(0, SIZE))
            bv.erase(i)
            nb_ = np.zeros(SIZE, bool)
            nb_[:i] = g.bits[:i]
            nb_[i:-1] = g.bits[i + 1:]
            g.bits = nb_
        elif op == 2:     # reference-format round-trip mid-stream
            level = int(rng.integers(0, 7))
            blob = refcodec.ref_serialize(bv, level)
            bv = refcodec.ref_deserialize(blob)
            bv.resize(SIZE)
        else:             # bulk mutation
            ids = random_indices(rng, SIZE, 0.01)
            bv.set_many(ids)
            g.bits[ids] = True
        if step % 5 == 4:
            check(bv, g, step)
    check(bv, g, "final")


@pytest.mark.parametrize("seed", [7])
def test_stress_48bit_borders(seed):
    """t64-style stress: operations around the 2^32 and 2^48 borders
    (reference tests/stress64, gena.h distribution mixes)."""
    rng = np.random.default_rng(seed)
    big = 1 << 48
    borders = np.asarray([0, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
                          (1 << 40), big - 2, big - 1], np.int64)
    scatter = rng.integers(0, big, 2000).astype(np.int64)
    ids = np.unique(np.concatenate([borders, scatter]))
    bv = BitVector.from_indices(ids, big)
    np.testing.assert_array_equal(bv.indices(), ids)
    assert bv.count() == len(ids)
    assert bv.test(big - 1) and bv.test(1 << 32)
    assert bv.count_range(1 << 32, big - 1) == int(
        ((ids >= (1 << 32)) & (ids <= big - 1)).sum())
    # rank/select across the 2^32 border
    bv.build_rs_index()
    for r in (1, len(ids) // 2, len(ids)):
        assert bv.select(r) == ids[r - 1]
    # logic with a second 48-bit vector
    ids2 = np.unique(rng.integers(0, big, 2000)).astype(np.int64)
    other = BitVector.from_indices(ids2, big)
    both = bv & other
    np.testing.assert_array_equal(both.indices(),
                                  np.intersect1d(ids, ids2))
    # serialization round-trips (both formats, 64-bit headers)
    blob = Serializer(6).serialize(bv)
    assert Deserializer().deserialize(blob).equal(bv)
    from bitmagic_tpu.serial import refcodec
    rblob = refcodec.ref_serialize(bv, 6)
    assert refcodec.ref_deserialize(rblob).equal(bv)


@pytest.mark.parametrize("seed", [21, 22])
def test_stress_gap_residency_walk(seed):
    """Random walk with aggressive optimize(): gap/dense/identity/run-merge
    paths interleave freely; content checked against the golden model
    throughout (round-2 GAP residency + run-domain algebra)."""
    big = 40 * BITS_PER_BLOCK
    rng = np.random.default_rng(seed)
    bv = BitVector(big)
    g = GoldenBitSet(big)
    ids = random_indices(rng, big, 0.001)
    bv.set_many(ids); g.bits[ids] = True
    bv.optimize()
    for step in range(25):
        op = rng.integers(0, 7)
        if op == 0:       # run-domain logic with an optimized operand
            idx = random_indices(rng, big, float(rng.choice([0.0005, 0.02])))
            other = BitVector.from_indices(idx, big)
            if rng.integers(0, 2):
                other.optimize()
            og = GoldenBitSet.from_indices(idx, big)
            which = rng.integers(0, 4)
            [bv.bit_and, bv.bit_or, bv.bit_xor, bv.bit_sub][which](other)
            [g.and_, g.or_, g.xor_, g.sub_][which](og)
        elif op == 1:     # re-optimize (dense -> gap movement)
            bv.optimize()
        elif op == 2:     # range ops (identity pass-through on gap blocks)
            lo = int(rng.integers(0, big)); hi = int(rng.integers(lo, big))
            val = bool(rng.integers(0, 2))
            bv.set_range(lo, hi, val); g.set_range(lo, hi, val)
        elif op == 3:     # point mutations on gap-resident blocks
            for i in rng.integers(0, big, 4):
                v = bool(rng.integers(0, 2))
                bv.set(int(i), v); g.set(int(i), v)
        elif op == 4:     # serialization round-trip from gap residency
            blob = Serializer(int(rng.integers(0, 7))).serialize(bv)
            bv = Deserializer().deserialize(blob)
        elif op == 5:     # rank/select through the gap-aware index
            if g.count():
                r = int(rng.integers(1, g.count() + 1))
                assert bv.select(r) == g.select(r)
                i = int(rng.integers(0, big))
                assert bv.count_to(i) == g.count_to(i)
        else:             # queries across representations
            i = int(rng.integers(0, big))
            assert bv.test(i) == bool(g.bits[i])
            lo = int(rng.integers(0, big)); hi = int(rng.integers(lo, big))
            assert bv.count_range(lo, hi) == int(g.bits[lo:hi + 1].sum())
        if step % 8 == 7:
            check(bv, g, step)
    check(bv, g, "final")
