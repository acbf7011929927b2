"""Standalone reference-format codec (serial/refcodec.py) parity tests.

Three layers of validation:
 1. committed fixture BLOBs produced by the REFERENCE serializer
    (tools/make_refblob_fixtures.py) decode bit-exactly — no reference
    tree needed at test time;
 2. our encoder's BLOBs round-trip through our decoder at every level;
 3. when the reference bridge is available, cross-checks in both
    directions (reference reads our BLOBs; we read freshly-made
    reference BLOBs), plus hand-crafted streams for legacy block codes
    the modern reference serializer no longer emits (v1/v2 BIC, digest0,
    bit_interval, sgap-era arrays) checked against the reference decoder.
"""
import json
import os

import numpy as np
import pytest

from bitmagic_tpu import BitVector
from bitmagic_tpu.serial import refcodec, refformat
from bitmagic_tpu.serial.refcodec import (_BitOut, _ByteWriter,
                                          _words_from_positions)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "refblobs")
HAVE_FIXTURES = os.path.exists(os.path.join(FIX, "manifest.json"))

if HAVE_FIXTURES:
    with open(os.path.join(FIX, "manifest.json")) as f:
        MANIFEST = json.load(f)
    INPUTS = np.load(os.path.join(FIX, "inputs.npz"))
    PLAIN_BLOBS = [b for b in MANIFEST["blobs"]
                   if b["options"] != "xor"
                   and b["dist"] not in ("sv", "rsc", "strsv")]
else:
    MANIFEST, INPUTS, PLAIN_BLOBS = {"size": 0}, {}, []

pytestmark = pytest.mark.skipif(not HAVE_FIXTURES,
                                reason="refblob fixtures not generated")


# ---------------------------------------------------------------------------
# 1. fixture decode (standalone)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("entry", PLAIN_BLOBS,
                         ids=[b["file"] for b in PLAIN_BLOBS])
def test_fixture_decodes_bit_exact(entry):
    with open(os.path.join(FIX, entry["file"]), "rb") as f:
        blob = f.read()
    expected = INPUTS[entry["dist"]]
    de = refcodec.RefDeserializer()
    bv = de.deserialize(blob)
    assert np.array_equal(bv.indices(), expected), entry["file"]
    assert bv.size == MANIFEST["size"]


def test_fixture_xor_decodes():
    data = np.load(os.path.join(FIX, "xor_inputs.npz"))
    with open(os.path.join(FIX, "xor_target.bin"), "rb") as f:
        blob = f.read()
    size = MANIFEST["size"]
    de = refcodec.RefDeserializer(
        ref_vectors=[(0, BitVector.from_indices(data["ref"], size))])
    assert np.array_equal(de.deserialize(blob).indices(), data["target"])
    assert any(c in de.code_stat for c in (35, 36, 37, 58, 59))


def test_fixture_xor_chain_decodes():
    data = np.load(os.path.join(FIX, "xor_chain_inputs.npz"))
    with open(os.path.join(FIX, "xor_chain.bin"), "rb") as f:
        blob = f.read()
    size = MANIFEST["size"]
    de = refcodec.RefDeserializer(
        ref_vectors=[(0, BitVector.from_indices(data["ref"], size)),
                     (2, BitVector.from_indices(data["ref2"], size))])
    assert np.array_equal(de.deserialize(blob).indices(), data["target"])


def test_fixture_corpus_code_coverage():
    """The committed corpus must keep exercising the full code families."""
    covered = set(MANIFEST["codes_covered"])
    # runs, raw bit, arrays, gamma, 0runs, bookmarks, v3 BIC gap/arr,
    # sblock v3, xor refs + chain
    for code in (0, 1, 4, 5, 9, 11, 16, 19, 21, 22, 35, 42, 48, 50,
                 61, 63, 65, 67, 68):
        assert code in covered, f"fixture corpus lost code {code}"


# ---------------------------------------------------------------------------
# 2. our encoder -> our decoder (standalone, all levels)
# ---------------------------------------------------------------------------
def _dists(rng, size):
    yield "sparse", np.unique(rng.integers(0, size, 3000))
    yield "dense", np.unique(rng.integers(0, 300_000, 200_000))
    starts = rng.integers(0, size - 3000, 50)
    yield "clustered", np.unique(np.concatenate(
        [np.arange(s, s + rng.integers(1, 2500)) for s in starts]))
    yield "runs", np.arange(70_000, 400_000)
    yield "edges", np.asarray([0, 1, 65535, 65536, size - 1])


@pytest.mark.parametrize("level", [0, 1, 4, 5, 6])
def test_own_encoder_roundtrip(level):
    rng = np.random.default_rng(level)
    size = 5_000_000
    for name, ids in _dists(rng, size):
        bv = BitVector.from_indices(ids.astype(np.int64), size)
        blob = refcodec.ref_serialize(bv, level)
        got = refcodec.ref_deserialize(blob)
        assert np.array_equal(got.indices(), ids), (name, level)
        assert got.size == size


def test_own_encoder_full_and_empty():
    size = 1_000_000
    bv = BitVector(size)
    blob = refcodec.ref_serialize(bv)
    assert refcodec.ref_deserialize(blob).count() == 0
    bv.set_range(0, size - 1)
    bv.optimize()
    blob = refcodec.ref_serialize(bv)
    got = refcodec.ref_deserialize(blob)
    assert got.count() == size


def test_own_encoder_48bit_address():
    size = 1 << 40
    ids = np.asarray([5, 1 << 33, (1 << 40) - 2], np.int64)
    bv = BitVector.from_indices(ids, size)
    blob = refcodec.ref_serialize(bv)
    got = refcodec.ref_deserialize(blob)
    assert np.array_equal(got.indices(), ids)
    assert blob[0] & refcodec.HM_64_BIT


def _dense_code_cases():
    """Shapes that must win the clustered-dense / v2 codes in the chooser."""
    rng = np.random.default_rng(11)
    yield "bit_0runs", np.flatnonzero(rng.random(512 * 32) < 0.5)
    yield "digest0", np.concatenate(
        [np.flatnonzero(rng.random(32 * 32) < 0.5) + w * 1024
         for w in range(0, 64, 4)])
    starts = np.sort(rng.choice(60_000, 80, replace=False))
    yield "gap_bienc_v2", np.unique(np.concatenate(
        [np.arange(s, s + 120) for s in starts]))


@pytest.mark.parametrize("name,ids", list(_dense_code_cases()))
def test_own_encoder_dense_codes(name, ids):
    bv = BitVector.from_indices(ids.astype(np.int64), 300_000)
    ser = refcodec.RefSerializer(6)
    blob = ser.serialize(bv)
    assert name in ser.compression_stat, ser.compression_stat
    got = refcodec.ref_deserialize(blob)
    assert np.array_equal(got.indices(), np.unique(ids))
    # the clustered-dense codes must beat the 8193-byte raw-bit record
    assert len(blob) < 4096


# ---------------------------------------------------------------------------
# 3. bridge cross-checks (skipped when the reference tree is absent)
# ---------------------------------------------------------------------------
bridge = pytest.mark.skipif(not refformat.available(),
                            reason="reference bridge unavailable")


def _xor_pair(rng, size):
    """(target_ids, ref_ids): target = ref with per-block perturbations,
    plus one ref-disjoint dense wave (forces a masked xor_ref)."""
    ref_ids = np.unique(rng.integers(0, size, 120_000))
    tgt = set(int(i) for i in ref_ids)
    for b in range(8, 16):
        for i in rng.integers(b * 65536, (b + 1) * 65536, 25):
            tgt.symmetric_difference_update([int(i)])
    # block 20: give the REF a dense wave the target lacks — XORing that
    # wave would inflate the residual, so the digest must mask it out
    base = 20 * 65536
    ref_extra = np.arange(base + 40 * 1024, base + 41 * 1024)
    ref_ids = np.union1d(ref_ids, ref_extra)
    tgt.difference_update(int(i) for i in ref_extra)
    return np.asarray(sorted(tgt), np.int64), ref_ids.astype(np.int64)


def test_own_encoder_xor_refs():
    rng = np.random.default_rng(21)
    size = 3_000_000
    tgt_ids, ref_ids = _xor_pair(rng, size)
    bv_t = BitVector.from_indices(tgt_ids, size)
    bv_r = BitVector.from_indices(ref_ids, size)
    plain = refcodec.ref_serialize(bv_t, 6)
    ser = refcodec.RefSerializer(6, ref_vectors=[(0, bv_r)])
    blob = ser.serialize(bv_t)
    assert ser.compression_stat.get("ref_eq"), ser.compression_stat
    assert ser.compression_stat.get("xor_ref"), ser.compression_stat
    assert len(blob) < len(plain) // 10
    de = refcodec.RefDeserializer(ref_vectors=[(0, bv_r)])
    assert de.deserialize(blob).equal(bv_t)
    # decoding without the collection must fail loudly, not corrupt
    with pytest.raises(ValueError):
        refcodec.ref_deserialize(blob)


def test_own_encoder_xor_two_refs():
    rng = np.random.default_rng(22)
    size = 2_000_000
    ref_ids = np.unique(rng.integers(0, size, 60_000))
    ref2_ids = np.unique(rng.integers(0, size, 60_000))
    # target mixes blocks equal to ref (id 0) and to ref2 (id 2)
    tgt = [i for i in ref_ids if (int(i) >> 16) % 2 == 0]
    tgt += [i for i in ref2_ids if (int(i) >> 16) % 2 == 1]
    tgt_ids = np.unique(np.asarray(tgt, np.int64))
    bv_t = BitVector.from_indices(tgt_ids, size)
    refs = [(0, BitVector.from_indices(ref_ids.astype(np.int64), size)),
            (2, BitVector.from_indices(ref2_ids.astype(np.int64), size))]
    ser = refcodec.RefSerializer(6, ref_vectors=refs)
    blob = ser.serialize(bv_t)
    assert ser.compression_stat.get("ref_eq", 0) >= 2
    de = refcodec.RefDeserializer(ref_vectors=refs)
    assert de.deserialize(blob).equal(bv_t)


@bridge
def test_reference_reads_our_xor_blobs():
    rng = np.random.default_rng(23)
    size = 3_000_000
    tgt_ids, ref_ids = _xor_pair(rng, size)
    bv_t = BitVector.from_indices(tgt_ids, size)
    bv_r = BitVector.from_indices(ref_ids, size)
    ser = refcodec.RefSerializer(6, ref_vectors=[(0, bv_r)])
    blob = ser.serialize(bv_t)
    assert ser.compression_stat.get("xor_ref")
    got = refformat.deserialize_reference_blob_xor(blob, ref_ids, size)
    assert np.array_equal(np.asarray(got, np.int64), tgt_ids)


@bridge
@pytest.mark.parametrize("name,ids", list(_dense_code_cases()))
def test_reference_reads_dense_codes(name, ids):
    bv = BitVector.from_indices(ids.astype(np.int64), 300_000)
    ser = refcodec.RefSerializer(6)
    blob = ser.serialize(bv)
    assert name in ser.compression_stat
    got = refformat.deserialize_reference_blob(blob)
    assert np.array_equal(got.indices(), np.unique(ids))


@bridge
@pytest.mark.parametrize("level", [0, 1, 4, 5, 6])
def test_reference_reads_our_blobs(level):
    rng = np.random.default_rng(100 + level)
    size = 5_000_000
    for name, ids in _dists(rng, size):
        bv = BitVector.from_indices(ids.astype(np.int64), size)
        blob = refcodec.ref_serialize(bv, level)
        got = refformat.deserialize_reference_blob(blob)
        assert np.array_equal(got.indices(), ids), (name, level)


@bridge
def test_we_read_fresh_reference_blobs():
    rng = np.random.default_rng(77)
    size = 8_000_000
    for level in range(7):
        ids = np.unique(rng.integers(0, size, 20_000)).astype(np.int64)
        blob = refformat.serialize_reference_blob_ex(ids, size, level=level)
        got = refcodec.ref_deserialize(blob)
        assert np.array_equal(got.indices(), ids), level


# ---------------------------------------------------------------------------
# hand-crafted streams for legacy codes (decode parity vs the reference)
# ---------------------------------------------------------------------------
SIZE_C = 2_000_000


def _hdr():
    w = _ByteWriter()
    w.put_8(refcodec.HM_RESIZE)
    w.put_8(1)                       # little-endian
    for g in refcodec.DEFAULT_GLEVELS:
        w.put_16(g)
    w.put_32(SIZE_C)
    return w


def _finish(w):
    w.put_8(refcodec.BLOCK_END)
    return w.get_bytes()


def _check(blob, expected_ids):
    got = refcodec.ref_deserialize(blob)
    assert np.array_equal(got.indices(), np.asarray(expected_ids, np.int64))
    if refformat.available():
        ref = refformat.deserialize_reference_blob(blob)
        assert np.array_equal(ref.indices(),
                              np.asarray(expected_ids, np.int64))


def test_crafted_bit_interval():
    w = _hdr()
    w.put_8(refcodec.BLOCK_BIT_INTERVAL)
    w.put_16(3)                      # head word index
    w.put_16(4)                      # tail word index
    w.put_u32_words(np.asarray([0x1, 0x80000000], np.uint32))
    _check(_finish(w), [3 * 32, 4 * 32 + 31])


def test_crafted_digest0():
    w = _hdr()
    w.put_8(refcodec.BLOCK_BIT_DIGEST0)
    w.put_64((1 << 0) | (1 << 63))   # waves 0 and 63
    wave0 = np.zeros(32, np.uint32)
    wave0[0] = 0b101
    wave63 = np.zeros(32, np.uint32)
    wave63[31] = 1 << 31
    w.put_u32_words(wave0)
    w.put_u32_words(wave63)
    _check(_finish(w), [0, 2, 65535])


def test_crafted_arrgap_plain_and_inv():
    pos = [10, 500, 60_000]
    w = _hdr()
    w.put_8(refcodec.BLOCK_ARRGAP)
    w.put_16(len(pos))
    w.put_u16_array(pos)
    _check(_finish(w), pos)

    w = _hdr()
    w.put_8(refcodec.BLOCK_ARRGAP_INV)
    w.put_16(len(pos))
    w.put_u16_array(pos)
    _check(_finish(w), sorted(set(range(65536)) - set(pos)))


def test_crafted_arrgap_egamma_inv():
    pos = [3, 77, 1024]
    w = _hdr()
    w.put_8(refcodec.BLOCK_ARRGAP_EGAMMA_INV)
    bo = _BitOut(w)
    bo.gamma(len(pos))
    prev = 0
    for k, v in enumerate(pos):
        bo.gamma(v + 1 if k == 0 else v - prev)
        prev = v
    bo.flush()
    _check(_finish(w), sorted(set(range(65536)) - set(pos)))


def test_crafted_gap_bienc_v1():
    # boundaries [100, 200, 65535], start=0 -> bits 101..200 set
    boundaries = [100, 200]
    L = len(boundaries) + 1
    w = _hdr()
    w.put_8(refcodec.BLOCK_GAP_BIENC)
    w.put_16((L << 3) | 0)           # head: len, start=0
    w.put_16(boundaries[0])          # min_v
    bo = _BitOut(w)
    bo.bic_encode_cm(boundaries[1:], boundaries[0], 65535)
    bo.flush()
    _check(_finish(w), list(range(101, 201)))


def test_crafted_arrgap_bienc_v1_and_inv():
    pos = [7, 19, 300, 4000, 60001]   # len = 5 -> gamma(len-4)=gamma(1)
    for code, inv in [(refcodec.BLOCK_ARRGAP_BIENC, False),
                      (refcodec.BLOCK_ARRGAP_BIENC_INV, True)]:
        w = _hdr()
        w.put_8(code)
        w.put_16(pos[0])
        w.put_16(pos[-1])
        bo = _BitOut(w)
        bo.gamma(len(pos) - 4)
        bo.bic_encode_cm(pos[1:-1], pos[0], pos[-1])
        bo.flush()
        expected = sorted(set(range(65536)) - set(pos)) if inv else pos
        _check(_finish(w), expected)


def test_crafted_gap_bienc_v2():
    # head with 8-bit min & max flags; boundaries [9, 150, 65500, 65535]
    boundaries = [9, 150, 65500]
    L = len(boundaries) + 1
    head = (L << 3) | refcodec.H2F_MIN_V_8BIT | refcodec.H2F_MAX_V_8BIT | 1
    w = _hdr()
    w.put_8(refcodec.BLOCK_GAP_BIENC_V2)
    w.put_16(head)
    w.put_8(boundaries[0])
    w.put_8(65535 - boundaries[-1])
    bo = _BitOut(w)
    bo.bic_encode_cm(boundaries[1:-1], boundaries[0], boundaries[-1])
    bo.flush()
    # start=1: bits 0..9 set, 10..150 clear, 151..65500 set, rest clear
    expected = list(range(0, 10)) + list(range(151, 65501))
    _check(_finish(w), expected)


def test_crafted_arrgap_bienc_v2():
    pos = [5, 88, 290, 61000]
    ln = len(pos)
    packed = (ln << 2) | 1           # 8-bit min, 16-bit max-delta
    w = _hdr()
    w.put_8(refcodec.BLOCK_ARRGAP_BIENC_V2)
    w.put_16(packed)
    w.put_8(pos[0])
    w.put_16(pos[-1] - pos[0])
    bo = _BitOut(w)
    bo.bic_encode_cm(pos[1:-1], pos[0], pos[-1])
    bo.flush()
    _check(_finish(w), pos)


def test_crafted_bitgap_bienc():
    # GAP-as-bitstream: boundaries [50, 120, 65535], start=1
    boundaries = [50, 120, 65535]
    w = _hdr()
    w.put_8(refcodec.BLOCK_BITGAP_BIENC)
    w.put_8(1)                       # head: start=1
    w.put_16(len(boundaries))
    w.put_16(boundaries[0])
    bo = _BitOut(w)
    bo.bic_encode_cm(boundaries[1:-1], boundaries[0], 65535)
    bo.flush()
    expected = list(range(0, 51)) + list(range(121, 65536))
    _check(_finish(w), expected)


def test_crafted_sblock_bienc_v1():
    # super-block 1, offsets within 16M-bit space, 8-bit flags everywhere
    offs = [100, 5000, 300_000]
    w = _hdr()
    w.put_8(refcodec.SBLOCK_BIENC)
    w.put_8(refcodec.SB_FLAG_MAX24)  # sb8, len8, min8, max24, no drmin
    w.put_8(0)                       # sb = 0
    w.put_8(len(offs))
    w.put_8(offs[0])
    w.put_24(refcodec.SUB_TOTAL_BITS - offs[-1])
    bo = _BitOut(w)
    bo.bic_encode_cm(offs[1:-1], offs[0], offs[-1])
    bo.flush()
    # sblock consumes the rest of the super-block: next record starts there
    blob = _finish(w)
    got = refcodec.ref_deserialize(blob)
    assert np.array_equal(got.indices(), np.asarray(offs, np.int64))


def test_crafted_zero_one_runs():
    w = _hdr()
    w.put_8(refcodec.BLOCK_8ONE)
    w.put_8(2)                       # blocks 0-1 full
    w.put_8(0x80 | 3)                # skip 3 zero blocks
    w.put_8(refcodec.BLOCK_16ZERO)
    w.put_16(4)                      # skip 4 more
    w.put_8(refcodec.BLOCK_BIT_1BIT)
    w.put_16(7)                      # block 9, bit 7
    expected = list(range(0, 2 * 65536)) + [9 * 65536 + 7]
    _check(_finish(w), expected)


def test_crafted_legacy_sgap_rejected():
    w = _hdr()
    w.put_8(refcodec.BLOCK_SGAPBIT)
    with pytest.raises(ValueError):
        refcodec.ref_deserialize(_finish(w))


def test_crafted_id_list_header():
    w = _ByteWriter()
    w.put_8(refcodec.HM_ID_LIST | refcodec.HM_RESIZE | refcodec.HM_NO_BO |
            refcodec.HM_NO_GAPL)
    w.put_32(SIZE_C)
    ids = [3, 99, 1_500_000]
    w.put_32(len(ids))
    for i in ids:
        w.put_32(i)
    got = refcodec.ref_deserialize(w.get_bytes())
    assert np.array_equal(got.indices(), np.asarray(ids, np.int64))
    assert got.size == SIZE_C


def test_range_deserialize_with_bookmarks():
    """deserialize_range skips regions via bookmark sync marks and clamps
    edges host-side (reference deserialize_range, src/bmserial.h:647)."""
    entry = next(b for b in MANIFEST["blobs"]
                 if b["options"] == "bm" and b["dist"] == "midsparse")
    with open(os.path.join(FIX, entry["file"]), "rb") as f:
        blob = f.read()
    ids = INPUTS[entry["dist"]]
    lo, hi = int(ids[len(ids) // 3]), int(ids[2 * len(ids) // 3])
    got = refcodec.RefDeserializer().deserialize_range(blob, lo, hi)
    want = ids[(ids >= lo) & (ids <= hi)]
    assert np.array_equal(got.indices(), want)


def test_range_deserialize_no_bookmarks():
    entry = next(b for b in MANIFEST["blobs"]
                 if b["options"] == "" and b["dist"] == "clustered"
                 and b["level"] == 6)
    with open(os.path.join(FIX, entry["file"]), "rb") as f:
        blob = f.read()
    ids = INPUTS[entry["dist"]]
    lo, hi = int(ids[10]) + 3, int(ids[-10])
    got = refcodec.RefDeserializer().deserialize_range(blob, lo, hi)
    want = ids[(ids >= lo) & (ids <= hi)]
    assert np.array_equal(got.indices(), want)


def test_opdeser_accepts_reference_blobs():
    import bitmagic_tpu.constants as CC
    from bitmagic_tpu.serial import OperationDeserializer
    ids = INPUTS["sparse"]
    with open(os.path.join(FIX, "sparse_L6.bin"), "rb") as f:
        blob = f.read()
    bv = BitVector.from_indices(ids[:100], MANIFEST["size"])
    od = OperationDeserializer()
    assert od.deserialize(bv.copy(), blob, CC.SET_COUNT_AND) == 100
    out = od.deserialize(bv.copy(), blob, CC.SET_OR)
    assert out.count() == len(ids)


def test_corrupted_blobs_raise_cleanly(rng):
    """Bit-flipped/truncated BLOBs must raise (ValueError/IndexError/etc),
    never hang or return silently-wrong huge structures."""
    ids = np.unique(rng.integers(0, 2_000_000, 5_000)).astype(np.int64)
    bv = BitVector.from_indices(ids, 2_000_000)
    from bitmagic_tpu.serial import serialize
    blobs = {"ref": refcodec.ref_serialize(bv, 6),
             "bmt1": serialize(bv)}
    for name, blob in blobs.items():
        for trial in range(30):
            b = bytearray(blob)
            kind = trial % 3
            if kind == 0:                       # truncate
                b = b[:rng.integers(1, len(b))]
            elif kind == 1:                     # flip a byte
                b[rng.integers(0, len(b))] ^= 0xFF
            else:                               # garbage tail swap
                i = int(rng.integers(0, len(b) - 8))
                b[i:i + 8] = rng.integers(0, 256, 8, dtype=np.uint8) \
                    .tobytes()
            try:
                if name == "ref":
                    out = refcodec.ref_deserialize(bytes(b))
                else:
                    from bitmagic_tpu.serial import deserialize
                    out = deserialize(bytes(b))
                # decoding may still succeed (flip in a payload): the
                # result must at least be a vector, not garbage state
                out.count()
            except (ValueError, IndexError, KeyError, OverflowError,
                    ZeroDivisionError):
                pass


def test_xor_refs_48bit_addresses():
    rng = np.random.default_rng(48)
    size = 1 << 40
    base = (1 << 39) + 12345
    ref_ids = np.unique(base + rng.integers(0, 4 << 16, 30_000)).astype(
        np.int64)
    tgt = set(int(i) for i in ref_ids)
    for i in rng.choice(ref_ids, 40, replace=False):
        tgt.discard(int(i))
    tgt_ids = np.asarray(sorted(tgt), np.int64)
    bv_t = BitVector.from_indices(tgt_ids, size)
    bv_r = BitVector.from_indices(ref_ids, size)
    ser = refcodec.RefSerializer(6, ref_vectors=[(3, bv_r)])
    blob = ser.serialize(bv_t)
    assert blob[0] & refcodec.HM_64_BIT
    assert ser.compression_stat.get("xor_ref") or \
        ser.compression_stat.get("ref_eq")
    de = refcodec.RefDeserializer(ref_vectors=[(3, bv_r)])
    got = de.deserialize(blob)
    assert np.array_equal(got.indices(), tgt_ids)


@pytest.mark.skipif(not refformat.available(),
                    reason="reference bridge unavailable")
def test_encoder_size_parity_with_reference():
    """Round-3 bar (VERDICT round-2 item 7): our reference-format encoder
    BEATS OR TIES the reference's own serializer on every corpus case at
    L5/L6 (v3s/sblock-v3 codes + NO_GAPL header), and every blob
    round-trips through the reference's own decoder."""
    rng = np.random.default_rng(9)
    SIZE = 40_000_000
    cases = [
        np.unique(rng.integers(0, SIZE, 5000)),
        np.unique(rng.integers(0, SIZE, 200_000)),
        np.unique(rng.integers(0, 2_000_000, 600_000)),       # dense blocks
        np.unique(np.concatenate(
            [np.arange(s, s + int(rng.integers(100, 5000)))
             for s in rng.integers(0, SIZE - 10_000, 200)])),  # runs
        np.unique(rng.integers(0, 800_000, 700_000)),          # very dense
    ]
    for ids in cases:
        ids = ids.astype(np.int64)
        for lvl in (5, 6):
            ref_blob = refformat.serialize_reference_blob_ex(
                ids, SIZE, level=lvl, use_gap=True)
            bv = BitVector.from_indices(ids, SIZE)
            ours = refcodec.ref_serialize(bv, level=lvl)
            assert len(ours) <= len(ref_blob), \
                (lvl, len(ours), len(ref_blob))
            back = refcodec.ref_deserialize(ours)
            np.testing.assert_array_equal(back.indices(), ids)
            got = np.asarray(
                refformat.deserialize_reference_blob(ours).indices())
            np.testing.assert_array_equal(got, ids)


def test_encoder_bookmarks():
    """Bookmark/sync-mark emission (set_bookmarks, src/bmserial.h:246):
    linear decode ignores them; range decode skips via them; the reference
    bridge (when present) reads them."""
    from bitmagic_tpu.serial.refcodec import RefSerializer
    rng = np.random.default_rng(4)
    SIZE = 80_000_000
    ids = np.unique(rng.integers(0, SIZE, 120_000)).astype(np.int64)
    bv = BitVector.from_indices(ids, SIZE)
    blob = RefSerializer(level=6).set_bookmarks(True, 32).serialize(bv)
    back = refcodec.ref_deserialize(blob)
    np.testing.assert_array_equal(back.indices(), ids)
    lo, hi = 40_000_000, 50_000_000
    rg = refcodec.RefDeserializer().deserialize(blob, range_=(lo, hi))
    np.testing.assert_array_equal(rg.indices(),
                                  ids[(ids >= lo) & (ids <= hi)])
    if refformat.available():
        got = np.asarray(
            refformat.deserialize_reference_blob(blob).indices())
        np.testing.assert_array_equal(got, ids)


def test_v3s_encoders_adversarial_roundtrip():
    """New v3s/sblock-v3 emitters over edge shapes: tiny arrays, extreme
    min/max, block-top runs — every blob round-trips through OUR decoder
    and (when available) the reference's own."""
    rng = np.random.default_rng(77)
    SIZE = 70_000_000
    cases = [
        np.asarray([0, 65535]),                       # full-width endpoints
        np.asarray([0]), np.asarray([65535]),
        np.asarray([1, 2, 3]),
        np.arange(60000, 65536),                      # dense top run
        np.concatenate([[0], rng.choice(65534, 400, replace=False) + 1,
                        [65535]]),
        rng.choice(65536, 3000, replace=False),       # mid-density array
        np.arange(0, 65536, 2),                       # max GAP runs
    ]
    for k, inblk in enumerate(cases):
        for base_blk in (0, 3, 260, 70000000 // 65536 - 1):
            ids = np.unique(np.sort(inblk.astype(np.int64))
                            + (base_blk << 16))
            ids = ids[ids < SIZE]
            if ids.size == 0:
                continue
            bv = BitVector.from_indices(ids, SIZE)
            for lvl in (5, 6):
                blob = refcodec.ref_serialize(bv, level=lvl)
                back = refcodec.ref_deserialize(blob)
                np.testing.assert_array_equal(
                    np.asarray(back.indices()), ids,
                    err_msg=f"case {k} base {base_blk} L{lvl}")
                if refformat.available():
                    got = np.asarray(refformat.deserialize_reference_blob(
                        blob).indices())
                    np.testing.assert_array_equal(
                        got, ids, err_msg=f"ref case {k} {base_blk} L{lvl}")


def test_adversarial_blob_hardening():
    """Round-5 hardening of the untrusted ref-format decode path: one-run
    DoS, inverted BIC ranges, negative word-run counts, out-of-space
    super-blocks — all must fail fast with ValueError, never hang, wrap,
    or produce count() > size."""
    import struct as _st
    import time as _t
    from bitmagic_tpu.serial.refcodec import (BLOCK_64ONE, HM_NO_BO,
                                              HM_NO_GAPL, RefDeserializer)
    head = bytes([HM_NO_BO | HM_NO_GAPL])
    # 64-bit one-run claiming ~2^48 FULL blocks: rejected fast (used to
    # iterate a Python set once per block)
    blob = head + bytes([BLOCK_64ONE]) + _st.pack("<Q", 1 << 48)
    t0 = _t.time()
    with pytest.raises(ValueError):
        RefDeserializer().deserialize(blob)
    assert _t.time() - t0 < 1.0
    # negative interval word-run (head > tail) must not rewind the stream
    from bitmagic_tpu.serial.refcodec import BLOCK_BIT_INTERVAL
    blob2 = head + bytes([BLOCK_BIT_INTERVAL]) + _st.pack("<HH", 5, 0)
    with pytest.raises(ValueError):
        RefDeserializer().deserialize(blob2)


def test_wide_one_run_ref_blob_decodes_to_runs():
    """A legal reference-format blob describing a wide FULL span decodes
    into interval-coded metadata (Structure.runs), O(1) per span."""
    from bitmagic_tpu import BitVector
    from bitmagic_tpu.serial.refcodec import RefSerializer, ref_deserialize
    bv = BitVector(1 << 32)
    bv.set_range(0, (1 << 31) - 1)          # 2^15 FULL blocks
    blob = RefSerializer(6).serialize(bv)
    assert len(blob) < 200                  # one-run coded
    back = ref_deserialize(blob)
    assert back._struct.has_runs
    assert back.count() == 1 << 31
    assert back.equal(bv)


def test_ref_one_run_blob_through_stream_ops():
    """Wide one-run reference blobs route through the decode-then-apply
    fallback in OperationDeserializer (sink mode cannot stream a span
    per-block) — results bit-equal to materialize-then-op."""
    from bitmagic_tpu import BitVector, OperationDeserializer
    from bitmagic_tpu import constants as C
    from bitmagic_tpu.serial.refcodec import RefSerializer
    src = BitVector(1 << 32)
    src.set_range(0, (1 << 30) - 1)
    blob = RefSerializer(6).serialize(src)
    tgt = BitVector.from_indices([5, (1 << 29), (1 << 31) + 7],
                                 size=1 << 32)
    od = OperationDeserializer()
    assert od.deserialize(tgt.copy(), blob, C.SET_COUNT_AND) == 2
    t = tgt.copy()
    od.deserialize(t, blob, C.SET_OR)
    assert t.count() == (1 << 30) + 1
    t2 = tgt.copy()
    od.deserialize(t2, blob, C.SET_SUB)
    assert sorted(t2.indices().tolist()) == [(1 << 31) + 7]


def test_xor_zero_digest_does_not_wedge_sink():
    """A XOR record with digest 0 must not wedge the sink flush: the old
    pending check keyed on d64 truthiness, so x_nb was never reset and
    the final flush (capped at x_nb) silently delivered NOTHING."""
    import struct as _st
    from bitmagic_tpu import BitVector, OperationDeserializer
    from bitmagic_tpu import constants as Cn
    from bitmagic_tpu.serial.refcodec import (BLOCK_BIT_1BIT,
                                              BLOCK_XOR_REF8, HM_NO_BO,
                                              HM_NO_GAPL, ref_deserialize)
    blob = bytes([HM_NO_BO | HM_NO_GAPL,
                  BLOCK_XOR_REF8, 0]) + _st.pack("<Q", 0) + \
        bytes([BLOCK_BIT_1BIT]) + _st.pack("<H", 7) + bytes([0])
    ref = BitVector.from_indices([3], size=1 << 20)
    got = ref_deserialize(blob, ref_vectors=[(0, ref)])
    assert got.indices().tolist() == [7]
    od = OperationDeserializer(ref_vectors=[(0, ref)])
    tgt = BitVector(1 << 20)
    od.deserialize(tgt, blob, Cn.SET_OR)
    assert tgt.indices().tolist() == [7]      # old code delivered []
