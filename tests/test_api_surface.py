"""Top-level namespace parity: everything a reference user reaches through
the single ``bm::`` namespace (bm.h, bmsparsevec.h, bmaggregator.h,
bmserial.h) is importable directly from ``bitmagic_tpu`` — the canonical
subpackage paths stay the source of truth; these are aliases."""

import bitmagic_tpu as bm


def test_top_level_aliases_resolve():
    # container family (reference bm::bvector, bm::sparse_vector, ...)
    assert bm.BitVector is bm.core.bitvector.BitVector
    assert bm.SparseVector is bm.sv.SparseVector
    assert bm.RSCSparseVector is bm.sv.RSCSparseVector
    assert bm.StrSparseVector is bm.sv.StrSparseVector
    assert bm.FloatSparseVector is bm.sv.FloatSparseVector
    assert bm.BitMatrix is bm.sv.BitMatrix
    # algorithms / serialization (bm::aggregator, bm::serializer, ...)
    assert bm.Aggregator is bm.agg.Aggregator
    assert bm.SparseVectorScanner is bm.sv.SparseVectorScanner
    assert bm.Serializer is bm.serial.Serializer
    assert bm.Deserializer is bm.serial.Deserializer
    assert bm.OperationDeserializer is bm.serial.OperationDeserializer
    assert bm.SerialStreamIterator is bm.serial.SerialStreamIterator
    assert bm.IteratorDeserializer is bm.serial.IteratorDeserializer
    # error surface
    assert issubclass(bm.ReadOnlyError, RuntimeError)


def test_all_names_importable():
    for name in bm.__all__:
        assert getattr(bm, name, None) is not None, name
