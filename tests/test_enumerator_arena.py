"""Enumerator / insert-iterator / arena-path tests."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.agg.arena import OperandArena
from bitmagic_tpu.agg import Aggregator
from bitmagic_tpu.config import config
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.scanner import scanner
from bitmagic_tpu.utils.golden import random_indices

SIZE = 4 * BITS_PER_BLOCK + 100


def test_enumerator(rng):
    idx = random_indices(rng, SIZE, 0.005)
    bv = BitVector.from_indices(idx, SIZE)
    bv.set_range(BITS_PER_BLOCK, BITS_PER_BLOCK + 100)  # mixed content
    want = bv.indices()
    en = bv.get_enumerator()
    np.testing.assert_array_equal(np.asarray(list(en)), want)
    # go_to / skip / skip_to_rank
    en = bv.get_enumerator(int(want[10]))
    assert en.value() == want[10]
    en.go_to(int(want[20]) + 1)
    assert en.value() == want[21]
    en.skip(5)
    assert en.value() == want[26]
    en2 = bv.get_enumerator()
    en2.skip_to_rank(7)
    assert en2.value() == want[6]
    # counted
    cen = bv.get_counted_enumerator()
    for _ in range(9):
        next(cen)
    assert cen.bit_count == 9


def test_bulk_insert_iterator(rng):
    bv = BitVector(SIZE)
    ids = random_indices(rng, SIZE, 0.01)
    with bv.get_bulk_insert_iterator(buffer_size=64) as it:
        for i in ids:
            it.add(int(i))
    np.testing.assert_array_equal(bv.indices(), ids)


def test_arena_and_sub_matches_plain(rng):
    config.use_pallas = True          # force the pallas path (interpret on CPU)
    try:
        vs = [BitVector.from_indices(random_indices(rng, SIZE, 0.5), SIZE)
              for _ in range(5)]
        vs[1].set_range(0, BITS_PER_BLOCK - 1)
        vs[1].optimize()              # include a FULL block operand
        arena = OperandArena(vs)
        agg = Aggregator()
        got = agg.combine_and_sub_arena(arena, [0, 1, 2], [3, 4])
        want = agg.combine_and_sub([vs[0], vs[1], vs[2]], [vs[3], vs[4]])
        assert got.equal(want)
    finally:
        config.use_pallas = None


def test_pipeline_find_eq_arena(rng):
    config.use_pallas = True
    try:
        vals = rng.integers(0, 30, 20000).astype(np.uint32)
        sv = SparseVector.from_array(vals)
        counts = scanner.pipeline_find_eq(sv, list(range(32)), counts_only=True)
        want = [int((vals == v).sum()) for v in range(32)]
        assert counts == want
    finally:
        config.use_pallas = None


def test_timer_and_debug(rng, capsys):
    from bitmagic_tpu.utils import timer, debug
    bv = BitVector.from_indices(random_indices(rng, SIZE, 0.01), SIZE)
    with timer.ChronoTaker("count", repeats=3):
        bv.count()
    timer.print_statistics()
    debug.print_bvector_stat(bv)
    debug.print_stat(bv, blocks=2)
    sv = SparseVector.from_array(rng.integers(0, 100, 100).astype(np.uint32))
    debug.print_svector_stat(sv)
    assert "count" in capsys.readouterr().out
    timer.reset_statistics()


def test_save_load_files(rng, tmp_path):
    from bitmagic_tpu.utils import debug
    bv = BitVector.from_indices(random_indices(rng, SIZE, 0.01), SIZE)
    p = tmp_path / "bv.blob"
    debug.save_bvector(p, bv)
    assert debug.load_bvector(p).equal(bv)
    assert debug.compute_serialization_size(bv) == p.stat().st_size
    sv = SparseVector.from_array(rng.integers(0, 1000, 500).astype(np.uint32))
    p2 = tmp_path / "sv.blob"
    debug.file_save_svector(p2, sv)
    np.testing.assert_array_equal(debug.file_load_svector(p2).to_numpy(),
                                  sv.to_numpy())
