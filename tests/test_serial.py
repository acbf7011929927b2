"""Serialization tests: codec round-trips + BLOB round-trips at all levels
(reference SerializationCompressionLevelsTest :17427,
InterpolativeCodingTest :26197, GammaEncoderTest :26811)."""
import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.serial.encoding import (BitReader, BitWriter, bic_decode,
                                          bic_encode)
from bitmagic_tpu.serial.serializer import Deserializer, Serializer
from bitmagic_tpu.utils.golden import random_indices

SIZE = 6 * BITS_PER_BLOCK + 12345


def test_bitstream_roundtrip(rng):
    w = BitWriter()
    vals = [(1, 1), (0, 1), (12345, 17), (0xDEADBEEF, 32), (7, 3)]
    for v, n in vals:
        w.put_bits(v, n)
    r = BitReader(w.getvalue())
    for v, n in vals:
        assert r.get_bits(n) == v


def test_bitstream_large(rng):
    """Many writes must stay fast and correct (incremental flush path)."""
    vals = rng.integers(1, 2**20, 20000)
    w = BitWriter()
    for v in vals:
        w.put_gamma(int(v))
    r = BitReader(w.getvalue())
    got = [r.get_gamma() for _ in range(vals.size)]
    np.testing.assert_array_equal(got, vals)


def test_gamma_roundtrip(rng):
    vals = np.concatenate([[1, 2, 3, 2**16, 2**31 - 1],
                           rng.integers(1, 10**6, 500)])
    w = BitWriter()
    w.put_gamma_array(vals.astype(np.uint64))
    r = BitReader(w.getvalue())
    got = [r.get_gamma() for _ in vals]
    np.testing.assert_array_equal(got, vals)


def test_bic_roundtrip(rng):
    for n in [0, 1, 2, 100, 5000]:
        arr = np.unique(rng.integers(0, 65536, n)).astype(np.int64)
        w = BitWriter()
        bic_encode(w, arr, 0, 65535)
        r = BitReader(w.getvalue())
        got = bic_decode(r, arr.size, 0, 65535)
        np.testing.assert_array_equal(got, arr)


def test_bic_dense(rng):
    arr = np.arange(0, 60000, dtype=np.int64)      # consecutive run
    w = BitWriter()
    bic_encode(w, arr, 0, 65535)
    assert len(w.getvalue()) < 1000                 # BIC collapses runs
    r = BitReader(w.getvalue())
    np.testing.assert_array_equal(bic_decode(r, arr.size, 0, 65535), arr)


@pytest.mark.parametrize("level", [0, 1, 4, 5, 6])
@pytest.mark.parametrize("style", ["uniform", "intervals"])
def test_blob_roundtrip(rng, level, style):
    idx = random_indices(rng, SIZE, 0.01, style)
    bv = BitVector.from_indices(idx, SIZE)
    bv.set_range(BITS_PER_BLOCK, 2 * BITS_PER_BLOCK + 100)  # mixed classes
    bv.optimize()
    blob = Serializer(level).serialize(bv)
    back = Deserializer().deserialize(blob)
    assert back.size == bv.size
    assert back.equal(bv), (level, style)


def test_blob_compression_effect(rng):
    """higher levels must not be larger on sparse data."""
    idx = random_indices(rng, SIZE, 0.002)
    bv = BitVector.from_indices(idx, SIZE)
    sizes = {lv: len(Serializer(lv).serialize(bv)) for lv in (0, 1, 6)}
    assert sizes[1] <= sizes[0]
    assert sizes[6] <= sizes[1]
    # dense interval data: gap coding wins big
    bv2 = BitVector(SIZE)
    for lo in range(0, SIZE - 3000, 10007):
        bv2.set_range(lo, lo + 2500)
    s0 = len(Serializer(0).serialize(bv2))
    s6 = len(Serializer(6).serialize(bv2))
    assert s6 < s0 // 20


def test_empty_and_full(rng):
    e = BitVector(SIZE)
    blob = Serializer(6).serialize(e)
    assert Deserializer().deserialize(blob).none()
    f = BitVector(SIZE)
    f.set_range(0, SIZE - 1)
    f.optimize()
    back = Deserializer().deserialize(Serializer(6).serialize(f))
    assert back.equal(f)
    assert back.count() == SIZE


def test_range_deserialize(rng):
    idx = random_indices(rng, SIZE, 0.01)
    bv = BitVector.from_indices(idx, SIZE)
    blob = Serializer(6).serialize(bv)
    lo, hi = BITS_PER_BLOCK + 5, 3 * BITS_PER_BLOCK
    part = Deserializer().deserialize_range(blob, lo, hi)
    want = idx[(idx >= lo) & (idx <= hi)]
    np.testing.assert_array_equal(part.indices(), want)


def test_compression_stat(rng):
    bv = BitVector(SIZE)
    bv.set_range(0, BITS_PER_BLOCK - 1)            # full block
    bv.set_many(np.arange(BITS_PER_BLOCK, BITS_PER_BLOCK + 100))  # sparse arr
    bv.optimize()
    s = Serializer(6)
    s.serialize(bv)
    assert s.compression_stat.get("full", 0) == 1
    assert sum(s.compression_stat.values()) == 2


def test_native_and_python_paths_interchange(rng, monkeypatch):
    """Blobs from the native whole-BLOB encoder must decode through the
    pure-Python record loop and vice versa (payload bitstreams are
    byte-compatible; record layout is self-describing)."""
    from bitmagic_tpu.serial import native as nat
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer

    size = 40 * BITS_PER_BLOCK
    ids = np.unique(rng.integers(0, size, 60_000))
    bv = BitVector.from_indices(ids, size)
    bv.set_range(5 * BITS_PER_BLOCK, 7 * BITS_PER_BLOCK + 17)
    bv.optimize()

    if nat.load() is None:
        pytest.skip("native codecs unavailable")
    blob_native = Serializer(6).serialize(bv)

    # force the pure-Python paths
    monkeypatch.setattr(nat, "load", lambda: None)
    monkeypatch.setattr(nat, "bmt1_encode", lambda *a, **k: None)
    monkeypatch.setattr(nat, "bmt1_decode", lambda *a, **k: None)
    blob_python = Serializer(6).serialize(bv)
    assert Deserializer().deserialize(blob_native).equal(bv)   # py decode
    monkeypatch.undo()
    assert Deserializer().deserialize(blob_python).equal(bv)   # native-ish


def test_xor_group_serialization(rng):
    """Cross-vector XOR deltas (serial/xor_group.py, bmxor.h equivalent):
    related vectors compress far better as a group, and round-trip."""
    from bitmagic_tpu.serial import serialize
    from bitmagic_tpu.serial.xor_group import (deserialize_group,
                                               serialize_group)
    size = 64 * BITS_PER_BLOCK
    base_ids = np.unique(rng.integers(0, size, 200_000))
    vectors = [BitVector.from_indices(base_ids, size)]
    for k in range(4):
        flip = rng.choice(base_ids, 300, replace=False)
        extra = np.unique(rng.integers(0, size, 300))
        ids = np.union1d(np.setdiff1d(base_ids, flip), extra)
        vectors.append(BitVector.from_indices(ids, size))

    blob = serialize_group(vectors)
    solo = sum(len(serialize(v)) for v in vectors)
    assert len(blob) < 0.5 * solo       # the deltas must actually pay off

    back = deserialize_group(blob)
    assert len(back) == len(vectors)
    for got, want in zip(back, vectors):
        assert got.equal(want)


def test_xor_group_unrelated_vectors(rng):
    """Unrelated vectors must not regress (XOR records only when they
    shrink the payload)."""
    from bitmagic_tpu.serial.xor_group import (deserialize_group,
                                               serialize_group)
    size = 16 * BITS_PER_BLOCK
    vectors = [BitVector.from_indices(
        np.unique(rng.integers(0, size, 5_000)), size) for _ in range(3)]
    back = deserialize_group(serialize_group(vectors))
    for got, want in zip(back, vectors):
        assert got.equal(want)


def test_xor_group_full_reference_blocks(rng):
    """XOR patches must reconstruct correctly when the reference block is
    FULL (all-ones) or absent."""
    from bitmagic_tpu.serial.xor_group import (deserialize_group,
                                               serialize_group)
    size = 8 * BITS_PER_BLOCK
    base = BitVector(size)
    base.set_range(0, 3 * BITS_PER_BLOCK - 1)      # FULL blocks
    base.set_many(rng.integers(4 * BITS_PER_BLOCK, size, 2000))
    base.optimize()
    # near-complement of a FULL region: XOR vs base is sparse
    v2 = BitVector(size)
    v2.set_range(0, 3 * BITS_PER_BLOCK - 1)
    v2.clear_many(rng.integers(0, 3 * BITS_PER_BLOCK, 500))
    v2.set_many(rng.integers(4 * BITS_PER_BLOCK, size, 100))
    vectors = [base, v2]
    back = deserialize_group(serialize_group(vectors, gain=0.9))
    for got, want in zip(back, vectors):
        assert got.equal(want)


def test_python_native_choosers_byte_identical():
    """The Python fallback chooser mirrors the native bm_bmt1_encode
    (same candidate order, cost formulas, strict-< tie-breaking): blobs
    are byte-identical whichever path runs."""
    from bitmagic_tpu.serial import native
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    size = 10_000_000
    B = BITS_PER_BLOCK
    cases = [
        np.unique(rng.integers(0, size, 3000)),
        np.unique(rng.integers(0, 600_000, 200_000)),
        np.unique(np.concatenate(
            [np.arange(s, s + int(rng.integers(50, 2000)))
             for s in rng.integers(0, size - 3000, 80)])),
        # adversarial block shapes for the fused boundary scan:
        # alternating bits (maximal run count), single bits at block
        # edges, one long run, dense-but-not-full (inverted-array codes)
        np.concatenate([
            np.arange(0, B, 2),                      # alternating from bit 0
            np.arange(B + 1, 2 * B, 2),              # alternating from bit 1
            [2 * B, 3 * B - 1],                      # first/last bit only
            np.arange(3 * B, 3 * B + 777),           # single run at start
            np.arange(5 * B - 321, 5 * B),           # single run at end
            np.setdiff1d(np.arange(6 * B, 7 * B),    # full minus a few
                         6 * B + rng.integers(0, B, 40)),
        ]).astype(np.int64),
    ]
    orig = native.bmt1_encode
    for ids in cases:
        bv = BitVector.from_indices(ids.astype(np.int64), size)
        bv.set_range(1_000_000, 1_050_000)
        for lvl in range(7):
            nat = Serializer(lvl).serialize(bv)
            native.bmt1_encode = lambda *a, **k: None
            try:
                py = Serializer(lvl).serialize(bv)
            finally:
                native.bmt1_encode = orig
            assert nat == py, lvl


def test_compact_blob_corruption_rejected():
    """Truncated / corrupted compact blobs must raise or return None from
    the native engines — never crash or silently succeed."""
    import pytest
    from bitmagic_tpu.serial import native
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer
    rng = np.random.default_rng(3)
    bv = BitVector.from_indices(
        np.unique(rng.integers(0, 3_000_000, 5000)), 3_000_000)
    blob = Serializer(6).serialize(bv)
    de = Deserializer()
    assert de.deserialize(blob).equal(bv)
    # truncations at many byte offsets: native decode returns None ->
    # python fallback raises (or errors in native scan)
    for cut in (14, len(blob) // 3, len(blob) - 2, len(blob) - 1):
        bad = blob[:cut]
        with pytest.raises(Exception):
            de.deserialize(bad)
    # flipped bytes inside record headers
    for pos in (13, 15, 20):
        bad = bytearray(blob)
        bad[pos] ^= 0xFF
        try:
            got = de.deserialize(bytes(bad))
            # if it decodes, it must at least be a well-formed vector
            got.count()
        except Exception:
            pass
    # the record-index scanner rejects truncation
    assert native.bmt1_record_index(blob[: len(blob) - 1], 13) is None \
        or native.load() is None


def test_deserialize_accepts_uint8_ndarray(tmp_path):
    """The np.fromfile path: a plain uint8 ndarray (no padding, not a
    PaddedBlob) must decode identically to bytes — ByteDecoder views
    arrays through a zero-copy memoryview (round-5 fix; the header magic
    compare previously raised on ndarray slices)."""
    from bitmagic_tpu import BitVector, deserialize, serialize
    bv = BitVector.from_indices([5, 70000, (1 << 22) + 3], size=1 << 23)
    bv.set_range(100000, 300000)
    blob = serialize(bv)
    p = tmp_path / "bv.blob"
    p.write_bytes(bytes(blob))
    arr = np.fromfile(p, np.uint8)
    assert deserialize(arr).equal(bv)
    # and through the range deserializer (python record walk)
    from bitmagic_tpu.serial.serializer import Deserializer
    d = Deserializer().deserialize_range(arr, 100000, 200000)
    g = bv.copy()
    g.keep_range(100000, 200000)
    assert d.equal(g)


def test_gap_blob_corruption_rejected():
    """GAP-direct decode (bm_bmt1_decode_gap) must reject truncated /
    corrupted D-GAP payloads instead of writing out of bounds."""
    from bitmagic_tpu import BitVector
    from bitmagic_tpu.serial.serializer import Deserializer, Serializer
    import bitmagic_tpu.constants as C
    rng = np.random.default_rng(3)
    size = 32 * C.BITS_PER_BLOCK
    starts = rng.integers(0, size - 400, 300)
    ids = np.unique(np.concatenate(
        [np.arange(s, s + l)
         for s, l in zip(starts, rng.integers(30, 200, 300))]))
    bv = BitVector.from_indices(ids, size)
    bv.optimize()
    assert (bv._struct.cls == C.CLS_GAP).any()
    blob = Serializer(6).serialize(bv)
    de = Deserializer()
    assert de.deserialize(blob).equal(bv)
    for cut in (20, len(blob) // 2, len(blob) - 2):
        with pytest.raises(Exception):
            de.deserialize(blob[:cut])
    for pos in range(14, min(len(blob), 64)):
        for flip in (0xFF, 0x80):
            bad = bytearray(blob)
            bad[pos] ^= flip
            try:
                got = de.deserialize(bytes(bad))
            except Exception:
                continue
            # an ACCEPTED decode must be internally consistent — a
            # corrupted GAP first-byte used to produce count() > size
            # (review finding, round 5)
            c = got.count()
            assert 0 <= c <= got.size, (pos, flip, c)
            if c <= 1 << 22:
                assert c == got.indices().size, (pos, flip)


def test_native_engine_rejects_malformed_records():
    """Round-5 C-engine hardening, pinned: truncation on a varint
    continuation byte is an error (not a silent clean EOF), descending
    classic records are rejected, and a FULL_RUN span that would wrap
    the 48-bit space is rejected."""
    from bitmagic_tpu import BitVector, deserialize, serialize
    from bitmagic_tpu.serial import native
    if native.load() is None:
        pytest.skip("native engine unavailable")
    bv = BitVector.from_indices([5, 70000, 200000], size=1 << 18)
    blob = bytes(serialize(bv))
    # cut the blob and append a lone continuation byte: the engine used
    # to parse delta=0 from the zero pad and report success
    bad = blob[:20] + b"\x80"
    with pytest.raises(Exception):
        deserialize(bad)
    # truncated mid-records must not silently succeed either
    res = native.bmt1_decode(blob[:len(blob) - 3], 13)
    assert res is None
    # gamma decoder: truncated payload returns a clean error
    with pytest.raises(ValueError):
        native.gamma_decode_bytes(b"\x00\x00", 50)
