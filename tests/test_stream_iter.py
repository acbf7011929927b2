"""Public pull-parser API (round-2 VERDICT missing #4): the reusable
serial_stream_iterator / iterator_deserializer pair (src/bmserial.h:847,
:788) over the native BMT1 format."""
import numpy as np
import pytest

import bitmagic_tpu as bm
from bitmagic_tpu import constants as C
from bitmagic_tpu.serial import (IteratorDeserializer, Serializer,
                                 SerialStreamIterator)
from bitmagic_tpu.serial.stream_iter import E_BLOCK, E_END, E_FULL

SIZE = 20_000_000


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    ids_b = np.unique(rng.integers(0, SIZE, 30_000))
    b = bm.BitVector.from_indices(ids_b, SIZE)
    b.set_range(500_000, 700_000)
    blob = Serializer(6).serialize(b)
    return b, blob


def test_pull_walk_matches_content(setup):
    b, blob = setup
    it = SerialStreamIterator(blob)
    assert it.size == SIZE
    got = {}
    full = []
    while it.next():
        if it.state == E_FULL:
            full.append(it.block_idx)
        else:
            assert it.state == E_BLOCK
            got[it.block_idx] = it.get_block_words()
    assert it.state == E_END and not it.next()
    # reconstructed content matches the source vector
    rebuilt = bm.BitVector(SIZE)
    for nb in full:
        rebuilt.set_range(nb << C.SET_BLOCK_SHIFT,
                          ((nb + 1) << C.SET_BLOCK_SHIFT) - 1)
    for nb, w in got.items():
        pos = np.flatnonzero(np.unpackbits(
            w.view(np.uint8), bitorder="little")).astype(np.int64)
        rebuilt.set_many((nb << C.SET_BLOCK_SHIFT) + pos)
    assert rebuilt.equal(b)


def test_pull_skip_without_decode(setup):
    _, blob = setup
    it = SerialStreamIterator(blob)
    n = 0
    while it.next():
        it.skip()                      # never decodes a payload
        n += 1
    assert n > 10


@pytest.mark.parametrize("op,pyop", [
    (C.SET_AND, "__and__"), (C.SET_OR, "__or__"),
    (C.SET_XOR, "__xor__"), (C.SET_SUB, "__sub__"),
])
def test_iterator_deserializer_set_ops(setup, op, pyop):
    b, blob = setup
    rng = np.random.default_rng(5)
    a = bm.BitVector.from_indices(
        np.unique(rng.integers(0, SIZE, 20_000)), SIZE, strategy=C.BM_GAP)
    want = getattr(a.copy(), pyop)(b)
    tgt = a.copy()
    IteratorDeserializer().deserialize_streamed(
        tgt, SerialStreamIterator(blob), op)
    assert tgt.equal(want)
    # facade entry point accepts the iterator too
    tgt2 = a.copy()
    IteratorDeserializer().deserialize(tgt2, SerialStreamIterator(blob), op)
    assert tgt2.equal(want)


@pytest.mark.parametrize("op,metric", [
    (C.SET_COUNT_AND, lambda a, b: (a & b).count()),
    (C.SET_COUNT_OR, lambda a, b: (a | b).count()),
    (C.SET_COUNT_SUB_BA, lambda a, b: (b - a).count()),
])
def test_iterator_deserializer_counts(setup, op, metric):
    b, blob = setup
    rng = np.random.default_rng(6)
    a = bm.BitVector.from_indices(
        np.unique(rng.integers(0, SIZE, 20_000)), SIZE)
    want = metric(a.copy(), b)
    got = IteratorDeserializer().deserialize_streamed(
        a.copy(), SerialStreamIterator(blob), op)
    assert got == want
