"""rank/select vs golden model (reference RSIndexTest/SelectTest/RankFindTest
analogs, tests/stress/t.cpp:2597, 25740, 4914)."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.utils.golden import GoldenBitSet, random_indices

SIZE = 5 * BITS_PER_BLOCK + 321


@pytest.mark.parametrize("style", ["uniform", "intervals", "borders"])
def test_rank_batch(rng, style):
    idx = random_indices(rng, SIZE, 0.02, style)
    bv = BitVector.from_indices(idx, SIZE)
    g = GoldenBitSet.from_indices(idx, SIZE)
    rs = bv.build_rs_index()
    assert rs.count() == g.count()
    probes = np.unique(rng.integers(0, SIZE, 200))
    golden_ranks = np.cumsum(g.bits)[probes]
    np.testing.assert_array_equal(rs.rank_batch(probes), golden_ranks)


@pytest.mark.parametrize("style", ["uniform", "intervals"])
def test_select_batch(rng, style):
    idx = random_indices(rng, SIZE, 0.02, style)
    bv = BitVector.from_indices(idx, SIZE)
    g = GoldenBitSet.from_indices(idx, SIZE)
    rs = bv.build_rs_index()
    total = g.count()
    ranks = np.unique(rng.integers(1, total + 1, 200))
    got = rs.select_batch(ranks)
    want = g.indices()[ranks - 1]
    np.testing.assert_array_equal(got, want)
    # out-of-range ranks
    assert rs.select(0) == -1
    assert rs.select(total + 1) == -1
    assert rs.select(total) == g.indices()[-1]


def test_select_with_full_blocks(rng):
    bv = BitVector(SIZE)
    bv.set_range(BITS_PER_BLOCK, 3 * BITS_PER_BLOCK - 1)
    bv.set(7)
    bv.set(4 * BITS_PER_BLOCK + 11)
    bv.optimize()
    g = GoldenBitSet(SIZE)
    g.set_range(BITS_PER_BLOCK, 3 * BITS_PER_BLOCK - 1)
    g.set(7)
    g.set(4 * BITS_PER_BLOCK + 11)
    rs = bv.build_rs_index()
    idx = g.indices()
    ranks = np.asarray([1, 2, 100, idx.size - 1, idx.size])
    np.testing.assert_array_equal(rs.select_batch(ranks), idx[ranks - 1])
    probes = np.asarray([0, 7, BITS_PER_BLOCK, 2 * BITS_PER_BLOCK + 5, SIZE - 1])
    np.testing.assert_array_equal(rs.rank_batch(probes), np.cumsum(g.bits)[probes])


def test_bv_select_find_rank(rng):
    idx = random_indices(rng, SIZE, 0.01)
    bv = BitVector.from_indices(idx, SIZE)
    g = GoldenBitSet.from_indices(idx, SIZE)
    gi = g.indices()
    assert bv.select(1) == gi[0]
    assert bv.select(len(gi)) == gi[-1]
    assert bv.select(len(gi) + 5) == -1
    # find_rank(r, frm): r-th set bit counting from frm
    frm = int(gi[len(gi) // 2])
    want = gi[gi >= frm]
    assert bv.find_rank(1, frm) == want[0]
    assert bv.find_rank(3, frm) == want[2]


def test_rank_select_invalidation(rng):
    bv = BitVector.from_indices([10, 20, 30], SIZE)
    assert bv.select(2) == 20
    bv.set(15)
    assert bv.select(2) == 15       # index must rebuild after mutation
    bv.clear_bit(10)
    assert bv.select(1) == 15


def test_rs_index_int32_bound_enforced(rng, monkeypatch):
    """A pool holding >= 2^31 set bits must refuse to build an rs_index
    (the select descent carries pool-global ranks as device int32) —
    loudly, not by wrapping.  Simulated via patched block counts."""
    from bitmagic_tpu.core import rs_index as rsmod
    idx = random_indices(rng, 4 * BITS_PER_BLOCK, 0.01)
    bv = BitVector.from_indices(idx, 4 * BITS_PER_BLOCK)
    bv._flush()
    n_rows = bv._pool.shape[0]
    monkeypatch.setattr(
        rsmod.blockops, "block_counts",
        lambda pool: np.full(pool.shape[0], 2**31 // max(n_rows, 1) + 1,
                             np.int64))
    with pytest.raises(ValueError, match="2\\^31"):
        rsmod.RSIndex.build(bv)
