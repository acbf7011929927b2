"""core/gapstore.py: D-GAP host store vs dense golden model."""
import numpy as np
import pytest

from bitmagic_tpu import constants as C
from bitmagic_tpu.core.gapstore import GapStore

BPB = C.BITS_PER_BLOCK


def _random_blocks(rng, n):
    """Dense rows with varied run structure + edge cases."""
    rows = []
    for k in range(n):
        kind = k % 5
        bits = np.zeros(BPB, np.uint8)
        if kind == 0:        # few scattered bits
            bits[rng.integers(0, BPB, 5)] = 1
        elif kind == 1:      # long runs
            for s in rng.integers(0, BPB - 1000, 4):
                bits[s:s + int(rng.integers(1, 900))] = 1
        elif kind == 2:      # starts with 1, ends with 1
            bits[0:100] = 1
            bits[BPB - 7:] = 1
            bits[rng.integers(0, BPB, 50)] = 1
        elif kind == 3:      # single bit at edge
            bits[BPB - 1] = 1
        else:                # dense-ish alternating
            bits[::3] = 1
            bits[: int(rng.integers(0, 200))] = 0
        rows.append(np.packbits(bits, bitorder="little").view(np.uint32))
    return np.stack(rows)


@pytest.fixture(scope="module")
def store_and_rows():
    rng = np.random.default_rng(7)
    rows = _random_blocks(rng, 25)
    return GapStore.from_dense(rows), rows


def test_roundtrip(store_and_rows):
    store, rows = store_and_rows
    np.testing.assert_array_equal(store.to_dense(), rows)
    # subset round-trip
    sel = np.asarray([0, 3, 24, 7])
    np.testing.assert_array_equal(store.to_dense(sel), rows[sel])


def test_popcounts_and_runs(store_and_rows):
    store, rows = store_and_rows
    want_bc = np.bitwise_count(rows.astype(np.uint32)).sum(axis=1)
    np.testing.assert_array_equal(store.popcounts(), want_bc)
    bits = np.unpackbits(rows.view(np.uint8),
                         bitorder="little").reshape(rows.shape[0], BPB)
    want_runs = (bits[:, 1:] != bits[:, :-1]).sum(axis=1) + 1
    np.testing.assert_array_equal(store.n_runs(), want_runs)


def test_point_queries(store_and_rows):
    store, rows = store_and_rows
    rng = np.random.default_rng(8)
    n = rows.shape[0]
    bits = np.unpackbits(rows.view(np.uint8),
                         bitorder="little").reshape(n, BPB)
    blk = rng.integers(0, n, 500)
    pos = rng.integers(0, BPB, 500)
    pos[:4] = [0, BPB - 1, 0, BPB - 1]
    np.testing.assert_array_equal(store.test_bits(blk, pos),
                                  bits[blk, pos] == 1)
    want_rank = np.asarray([bits[b, : p + 1].sum() for b, p in zip(blk, pos)])
    np.testing.assert_array_equal(store.rank_in_block(blk, pos), want_rank)
    # rank at -1 is 0
    np.testing.assert_array_equal(
        store.rank_in_block(blk[:3], [-1, -1, -1]), [0, 0, 0])


def test_count_range(store_and_rows):
    store, rows = store_and_rows
    rng = np.random.default_rng(9)
    n = rows.shape[0]
    bits = np.unpackbits(rows.view(np.uint8),
                         bitorder="little").reshape(n, BPB)
    blk = rng.integers(0, n, 200)
    lo = rng.integers(0, BPB, 200)
    hi = np.minimum(lo + rng.integers(0, BPB, 200), BPB - 1)
    want = np.asarray([bits[b, l:h + 1].sum()
                       for b, l, h in zip(blk, lo, hi)])
    np.testing.assert_array_equal(store.count_range(blk, lo, hi), want)


def test_select_and_find(store_and_rows):
    store, rows = store_and_rows
    rng = np.random.default_rng(10)
    n = rows.shape[0]
    bits = np.unpackbits(rows.view(np.uint8),
                         bitorder="little").reshape(n, BPB)
    bc = store.popcounts()
    blk = np.flatnonzero(bc > 0)
    blk = np.repeat(blk, 20)
    rank = (rng.random(blk.size) * bc[blk]).astype(np.int64) + 1
    got = store.select_in_block(blk, rank)
    for b, r, g in zip(blk, rank, got):
        pos = np.flatnonzero(bits[b])
        assert g == pos[r - 1]
    # find
    frm = rng.integers(0, BPB, blk.size)
    got = store.find_in_block(blk, frm)
    for b, f, g in zip(blk, frm, got):
        pos = np.flatnonzero(bits[b][f:])
        want = f + pos[0] if pos.size else -1
        assert g == want


def test_indices_concat(store_and_rows):
    store, rows = store_and_rows
    n = rows.shape[0]
    bases = np.arange(n, dtype=np.int64) * BPB * 3
    bits = np.unpackbits(rows.view(np.uint8),
                         bitorder="little").reshape(n, BPB)
    want = np.concatenate(
        [np.flatnonzero(bits[k]) + bases[k] for k in range(n)])
    np.testing.assert_array_equal(store.indices_concat(bases), want)


def test_empty():
    s = GapStore.empty()
    assert s.n_blocks == 0
    assert s.to_dense().shape == (0, C.SET_BLOCK_SIZE)
    assert s.popcounts().size == 0
    assert s.indices_concat(np.zeros(0, np.int64)).size == 0


def test_all_ones_block():
    row = np.full((1, C.SET_BLOCK_SIZE), 0xFFFFFFFF, np.uint32)
    s = GapStore.from_dense(row)
    assert s.n_runs()[0] == 1
    assert s.popcounts()[0] == BPB
    np.testing.assert_array_equal(s.to_dense(), row)
    assert s.select_in_block([0], [BPB])[0] == BPB - 1


def test_gap_binary_op_fuzz():
    """Adversarial run structures through the run-domain merge: edge bits,
    adjacent boundaries, identical blocks, complements, full/zero."""
    from bitmagic_tpu.core.gapstore import gap_binary_op
    rng = np.random.default_rng(123)
    rows_a, rows_b = [], []
    for k in range(40):
        for rows in (rows_a, rows_b):
            bits = np.zeros(BPB, np.uint8)
            kind = rng.integers(0, 8)
            if kind == 0:
                bits[rng.integers(0, BPB, rng.integers(1, 50))] = 1
            elif kind == 1:
                for s in rng.integers(0, BPB - 100, 8):
                    bits[s:s + int(rng.integers(1, 90))] = 1
            elif kind == 2:
                bits[:] = 1
            elif kind == 3:
                bits[0] = 1
            elif kind == 4:
                bits[BPB - 1] = 1
            elif kind == 5:
                bits[0] = bits[BPB - 1] = 1
                bits[::2][: rng.integers(1, 100)] = 1
            elif kind == 6:
                bits[: rng.integers(1, BPB)] = 1
            else:
                bits[rng.integers(0, BPB):] = 1
            rows.append(np.packbits(bits, bitorder="little").view(np.uint32))
    # make some pairs identical and some complementary
    rows_b[3] = rows_a[3].copy()
    rows_b[7] = ~rows_a[7]
    wa, wb = np.stack(rows_a), np.stack(rows_b)
    A, B = GapStore.from_dense(wa), GapStore.from_dense(wb)
    sel = np.arange(wa.shape[0])
    for op, fn in [("and", lambda a, b: a & b), ("or", lambda a, b: a | b),
                   ("xor", lambda a, b: a ^ b),
                   ("sub", lambda a, b: a & ~b)]:
        R, zm, fm = gap_binary_op(op, A, sel, B, sel)
        np.testing.assert_array_equal(R.to_dense(), fn(wa, wb), err_msg=op)
        bc = R.popcounts()
        np.testing.assert_array_equal(zm, bc == 0, err_msg=op)
        np.testing.assert_array_equal(fm, bc == BPB, err_msg=op)


def test_gap_metric_counts_fuzz():
    from bitmagic_tpu.core.gapstore import gap_metric_counts, const_extended
    rng = np.random.default_rng(321)
    rows = []
    for k in range(20):
        bits = np.zeros(BPB, np.uint8)
        bits[rng.integers(0, BPB, rng.integers(1, 300))] = 1
        if k % 4 == 0:
            s = int(rng.integers(0, BPB - 9000))
            bits[s:s + 8000] = 1
        rows.append(np.packbits(bits, bitorder="little").view(np.uint32))
    wa = np.stack(rows[:10])
    wb = np.stack(rows[10:])
    A, B = GapStore.from_dense(wa), GapStore.from_dense(wb)
    m = gap_metric_counts(A, np.arange(10), B, np.arange(10))
    pc = lambda x: np.bitwise_count(x).sum(axis=1)
    np.testing.assert_array_equal(m["and_"], pc(wa & wb))
    np.testing.assert_array_equal(m["sub_ba"], pc(wb & ~wa))
    # const-extended: FULL and ZERO as synthetic blocks
    ext, z, f = const_extended(A)
    m2 = gap_metric_counts(ext, np.asarray([0, z, f]),
                           ext, np.asarray([f, 0, z]))
    np.testing.assert_array_equal(
        m2["and_"], [pc(wa[:1])[0], 0, 0])
    np.testing.assert_array_equal(m2["or_"], [BPB, pc(wa[:1])[0], BPB])
