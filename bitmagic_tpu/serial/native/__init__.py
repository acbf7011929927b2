"""Loader for the native C++ codec library (BIC / gamma hot loops).

Builds codecs.cpp with g++ on first use (cached next to the source); exposes
ctypes wrappers.  If the toolchain is unavailable the package falls back to
the pure-Python codecs transparently (``AVAILABLE`` is False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codecs.cpp")
_LIB = os.path.join(_DIR, "libbmcodecs.so")

_lock = threading.Lock()
_lib = None
AVAILABLE = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the codec library; returns None on failure."""
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bm_bic_encode.restype = ctypes.c_uint64
        lib.bm_bic_encode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, u8p]
        lib.bm_bic_decode.restype = ctypes.c_uint64
        lib.bm_bic_decode.argtypes = [u8p, ctypes.c_uint64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64, i64p]
        lib.bm_gamma_encode.restype = ctypes.c_uint64
        lib.bm_gamma_encode.argtypes = [u64p, ctypes.c_int64, u8p]
        lib.bm_gamma_decode.restype = ctypes.c_int64
        lib.bm_gamma_decode.argtypes = [u8p, ctypes.c_uint64,
                                        ctypes.c_uint64, ctypes.c_int64,
                                        u64p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.bm_block_positions.restype = ctypes.c_int64
        lib.bm_block_positions.argtypes = [u32p, ctypes.c_int, u16p]
        lib.bm_block_gap_boundaries.restype = ctypes.c_int64
        lib.bm_block_gap_boundaries.argtypes = [u32p, u16p, i32p]
        lib.bm_block_popcount.restype = ctypes.c_int64
        lib.bm_block_popcount.argtypes = [u32p]
        lib.bm_pool_positions.restype = ctypes.c_int64
        lib.bm_pool_positions.argtypes = [u32p, ctypes.c_int64, i64p, i64p]
        lib.bm_bmt1_scan.restype = ctypes.c_int
        lib.bm_bmt1_scan.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                     i64p, i64p]
        lib.bm_bmt1_decode.restype = ctypes.c_int
        lib.bm_bmt1_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                       i64p, ctypes.POINTER(ctypes.c_uint8),
                                       i64p, u32p]
        lib.bm_bmt1_scan_gap.restype = ctypes.c_int
        lib.bm_bmt1_scan_gap.argtypes = [u8p, ctypes.c_int64,
                                         ctypes.c_int64, i64p, i64p, i64p,
                                         i64p]
        lib.bm_bmt1_decode_gap.restype = ctypes.c_int
        lib.bm_bmt1_decode_gap.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.POINTER(ctypes.c_uint8), i64p, u32p, i32p, i64p,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.bm_bmt1_encode.restype = ctypes.c_int64
        lib.bm_bmt1_encode.argtypes = [u32p, i64p,
                                       ctypes.POINTER(ctypes.c_uint8), i64p,
                                       i32p, i64p,
                                       ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int64, ctypes.c_int,
                                       u8p, ctypes.c_int64, i64p]
        lib.bmref_bic_decode_cm.restype = ctypes.c_int
        lib.bmref_bic_decode_cm.argtypes = [
            u8p, ctypes.c_int64, i64p, u64p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.bmref_bic_encode_cm.restype = ctypes.c_int
        lib.bmref_bic_encode_cm.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u64p, i32p, u8p, ctypes.c_int64, i64p]
        lib.bmref_gamma_decode.restype = ctypes.c_int
        lib.bmref_gamma_decode.argtypes = [
            u8p, ctypes.c_int64, i64p, u64p, i32p, ctypes.c_int64, u32p]
        lib.bmref_gamma_encode.restype = ctypes.c_int
        lib.bmref_gamma_encode.argtypes = [
            u32p, ctypes.c_int64, u64p, i32p, u8p, ctypes.c_int64, i64p]
        lib.bm_gaps_to_dense.restype = ctypes.c_int
        lib.bm_gaps_to_dense.argtypes = [i64p, i64p,
                                         ctypes.POINTER(ctypes.c_uint8),
                                         ctypes.c_int64, u32p]
        lib.bm_bmt1_record_index.restype = ctypes.c_int64
        lib.bm_bmt1_record_index.argtypes = [u8p, ctypes.c_int64,
                                             ctypes.c_int64, i64p, i64p]
        lib.bm_bmt1_stream_op.restype = ctypes.c_int
        lib.bm_bmt1_stream_op.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            i64p, ctypes.POINTER(ctypes.c_uint8), i64p, u32p,
            i32p, i64p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            i64p, ctypes.POINTER(ctypes.c_uint8), u32p,
            i64p, i64p, i64p]
        _lib = lib
        AVAILABLE = True
        return lib


def block_positions(words: np.ndarray, inverted: bool = False):
    """Set/clear-bit positions of a 2048-word uint32 block (int64 array),
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    out = np.zeros(65536, np.uint16)
    n = lib.bm_block_positions(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(inverted),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out[:n].astype(np.int64)


def block_gap_boundaries(words: np.ndarray):
    """(start_bit, boundaries incl. final 65535) or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    out = np.zeros(65537, np.uint16)
    start = ctypes.c_int32(0)
    n = lib.bm_block_gap_boundaries(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(start))
    return int(start.value), out[:n].astype(np.int64)


class RunCodedBlob(Exception):
    """The BMT1 blob holds FULL_RUN span records — the per-record stream
    engines route to decode-then-apply (runs decode to O(1) interval
    metadata, so that path stays cheap)."""


class PaddedBlob(np.ndarray):
    """uint8 view marking a blob whose trailing 8-zero-byte pad was applied
    by padded_blob itself.  Only this marker skips re-padding: a plain
    uint8 ndarray from the caller (np.fromfile etc.) is NOT trusted to be
    padded — treating it as such would drop its last 8 real bytes and let
    BitR's fast path read past the allocation."""


def padded_blob(blob) -> "np.ndarray":
    """Zero-pad a BLOB for the native readers (BitR's fast path reads one
    64-bit word past the cursor; contract in codecs.cpp).  Returns a
    PaddedBlob; passing one back in is a no-op, so chunked drivers that
    call the engine once per record window pad ONCE instead of re-copying
    the whole blob every call."""
    if isinstance(blob, PaddedBlob):
        return blob
    if isinstance(blob, np.ndarray):
        raw = np.ascontiguousarray(blob).view(np.uint8).tobytes()
    else:
        raw = bytes(blob)
    return np.frombuffer(raw + b"\0" * 8, np.uint8).view(PaddedBlob)


def bmt1_decode(blob: bytes, rec_offset: int):
    """Whole-BLOB BMT1 decode in C: returns (nbs int64, cls uint8,
    spans int64, words uint32[n_rows, 2048]) or None when unavailable/
    malformed.  spans[k] > 1 marks a FULL_RUN record covering that many
    consecutive blocks starting at nbs[k]."""
    lib = load()
    if lib is None:
        return None
    buf = padded_blob(blob)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_rec = ctypes.c_int64(0)
    n_rows = ctypes.c_int64(0)
    if lib.bm_bmt1_scan(bp, buf.size - 8, rec_offset, ctypes.byref(n_rec),
                        ctypes.byref(n_rows)) != 0:
        return None
    nbs = np.empty(max(n_rec.value, 1), np.int64)
    cls = np.empty(max(n_rec.value, 1), np.uint8)
    spans = np.empty(max(n_rec.value, 1), np.int64)
    words = np.empty((max(n_rows.value, 1), 2048), np.uint32)
    rc = lib.bm_bmt1_decode(
        bp, buf.size - 8, rec_offset,
        nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        spans.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != 0:
        return None
    return (nbs[:n_rec.value], cls[:n_rec.value], spans[:n_rec.value],
            words[:n_rows.value])


def bmt1_decode_gap(blob: bytes, rec_offset: int):
    """Whole-BLOB BMT1 decode with GAP-DIRECT residency: D-GAP records
    keep their run form instead of expanding to dense rows.  Returns
    (nbs, cls, spans, words, (g_ends int32, g_offs int64, g_first u8))
    or None; cls uses 1=FULL/2=BIT/3=GAP; words rows are 1:1 with the
    cls==2 records in order, gap arrays 1:1 with the cls==3 records."""
    lib = load()
    if lib is None:
        return None
    buf = padded_blob(blob)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_rec = ctypes.c_int64(0)
    n_rows = ctypes.c_int64(0)
    n_gr = ctypes.c_int64(0)
    n_ge = ctypes.c_int64(0)
    if lib.bm_bmt1_scan_gap(bp, buf.size - 8, rec_offset,
                            ctypes.byref(n_rec), ctypes.byref(n_rows),
                            ctypes.byref(n_gr), ctypes.byref(n_ge)) != 0:
        return None
    nbs = np.empty(max(n_rec.value, 1), np.int64)
    cls = np.empty(max(n_rec.value, 1), np.uint8)
    spans = np.empty(max(n_rec.value, 1), np.int64)
    words = np.empty((max(n_rows.value, 1), 2048), np.uint32)
    g_ends = np.empty(max(n_ge.value, 1), np.int32)
    g_offs = np.empty(n_gr.value + 1, np.int64)
    g_first = np.empty(max(n_gr.value, 1), np.uint8)
    rc = lib.bm_bmt1_decode_gap(
        bp, buf.size - 8, rec_offset,
        nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        spans.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        g_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        g_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        g_first.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return (nbs[:n_rec.value], cls[:n_rec.value], spans[:n_rec.value],
            words[:n_rows.value],
            (g_ends[:n_ge.value], g_offs[:n_gr.value + 1],
             g_first[:n_gr.value]))


def bmt1_encode(words: np.ndarray, nbs: np.ndarray, cls: np.ndarray,
                level: int, spans: np.ndarray = None,
                prev_nb: int = -1, emit_end: bool = True,
                gap_ends=None, gap_offs=None, gap_first=None):
    """Whole-BLOB BMT1 record encoding in C: returns (records_bytes,
    code_counts int64[11]) or None when unavailable.  spans[k] > 1 on a
    FULL entry emits one FULL_RUN record covering that many blocks.
    cls==3 records encode straight from the D-GAP store layout
    (gap_ends/gap_offs/gap_first) with no dense expansion."""
    lib = load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    nbs = np.ascontiguousarray(nbs, np.int64)
    cls = np.ascontiguousarray(cls, np.uint8)
    if spans is None:
        spans = np.ones(nbs.size, np.int64)
    spans = np.ascontiguousarray(spans, np.int64)
    if gap_ends is None:
        gap_ends = np.zeros(0, np.int32)
        gap_offs = np.zeros(1, np.int64)
        gap_first = np.zeros(0, np.uint8)
    gap_ends = np.ascontiguousarray(gap_ends, np.int32)
    gap_offs = np.ascontiguousarray(gap_offs, np.int64)
    gap_first = np.ascontiguousarray(gap_first, np.uint8)
    n_rec = nbs.size
    n_payload_rows = words.shape[0] + int(gap_first.size)
    cap = n_rec * 22 + n_payload_rows * 8400 + 64
    out = np.empty(cap, np.uint8)
    counts = np.zeros(11, np.int64)
    n = lib.bm_bmt1_encode(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        spans.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gap_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gap_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gap_first.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_rec, int(level), int(prev_nb), int(bool(emit_end)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        return None
    return out[:n].tobytes(), counts


def gaps_to_dense(ends: np.ndarray, offs: np.ndarray, first: np.ndarray):
    """Expand the concatenated D-GAP store layout into dense uint32 rows
    (word-level span fills in C), or None when unavailable."""
    lib = load()
    if lib is None:
        return None
    ends = np.ascontiguousarray(ends, np.int64)
    offs = np.ascontiguousarray(offs, np.int64)
    first = np.ascontiguousarray(first, np.uint8)
    m = first.size
    out = np.zeros((max(m, 1), 2048), np.uint32)
    lib.bm_gaps_to_dense(
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out[:m]


# op codes for bmt1_stream_op (match codecs.cpp)
OP_AND, OP_OR, OP_XOR, OP_SUB_AB, OP_SUB_BA = 0, 1, 2, 3, 4


def bmt1_record_index(blob: bytes, rec_offset: int):
    """(nbs int64[R], offs int64[R]) — block id + byte offset per record
    (header scan only); None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    buf = padded_blob(blob)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_rec = ctypes.c_int64(0)
    n_rows = ctypes.c_int64(0)
    if lib.bm_bmt1_scan(bp, buf.size - 8, rec_offset, ctypes.byref(n_rec),
                        ctypes.byref(n_rows)) != 0:
        return None
    cap = max(int(n_rec.value), 1)
    nbs = np.zeros(cap, np.int64)
    offs = np.zeros(cap, np.int64)
    r = lib.bm_bmt1_record_index(
        bp, buf.size - 8, rec_offset,
        nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if r < 0:
        return None
    return nbs[:r], offs[:r]


def bmt1_stream_op(blob: bytes, rec_offset: int, op: int, count_mode: bool,
                   t_nbs: np.ndarray, t_cls: np.ndarray,
                   t_words: np.ndarray, n_rec: int | None = None,
                   nb_prev: int = -1, t_gap_ends=None, t_gap_offs=None,
                   t_gap_first=None):
    """Streamed set-op of a BMT1 BLOB against a target snapshot (O(1 block)
    scratch in C).  Returns count (count_mode) or (nbs, cls, words) of the
    per-record results; None when the native library is unavailable.

    n_rec: process exactly that many records starting at rec_offset (the
    chunked driver's window — rec_offset then points at the chunk's first
    record, not the blob header); None = stream to the END record.
    nb_prev: block id of the record before the window (-1 at stream start)
    — compact blobs delta-code block ids.
    t_gap_*: run-coded target blocks (t_cls==3): block k of the cls==3
    subsequence has run ends t_gap_ends[t_gap_offs[k]:t_gap_offs[k+1]]
    (int32, block-local) and first-run value t_gap_first[k] — COUNT_* fold
    these in the run domain; dense combines expand one block at a time."""
    lib = load()
    if lib is None:
        return None
    buf = padded_blob(blob)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if n_rec is None:
        nr = ctypes.c_int64(0)
        n_rows = ctypes.c_int64(0)
        if lib.bm_bmt1_scan(bp, buf.size - 8, rec_offset, ctypes.byref(nr),
                            ctypes.byref(n_rows)) != 0:
            return None
        n_rec_eff, max_rec = int(nr.value), 0
    else:
        n_rec_eff, max_rec = int(n_rec), int(n_rec)
    t_nbs = np.ascontiguousarray(t_nbs, np.int64)
    t_cls = np.ascontiguousarray(t_cls, np.uint8)
    t_words = np.ascontiguousarray(t_words, np.uint32)
    # per-class slot numbering: cls==2 rows index t_words, cls==3 blocks
    # index the run arrays
    t_slot = np.where(t_cls == 2, np.cumsum(t_cls == 2) - 1, -1).astype(
        np.int64)
    gapm = t_cls == 3
    if gapm.any():
        t_slot[gapm] = np.cumsum(gapm)[gapm] - 1
    if t_gap_ends is None:
        t_gap_ends = np.zeros(0, np.int32)
        t_gap_offs = np.zeros(1, np.int64)
        t_gap_first = np.zeros(0, np.uint8)
    t_gap_ends = np.ascontiguousarray(t_gap_ends, np.int32)
    t_gap_offs = np.ascontiguousarray(t_gap_offs, np.int64)
    t_gap_first = np.ascontiguousarray(t_gap_first, np.uint8)
    cap = max(n_rec_eff, 1)
    out_nbs = np.full(cap, -1, np.int64)
    out_cls = np.zeros(cap, np.uint8)
    out_words = np.zeros((1 if count_mode else cap, 2048), np.uint32)
    o_nrec = ctypes.c_int64(0)
    o_nrows = ctypes.c_int64(0)
    cnt = ctypes.c_int64(0)
    rc = lib.bm_bmt1_stream_op(
        bp, buf.size - 8, rec_offset, max_rec, int(nb_prev),
        int(op), int(bool(count_mode)),
        t_nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t_cls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t_slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t_words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        t_gap_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_gap_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t_gap_first.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t_nbs.size,
        out_nbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_cls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(o_nrec), ctypes.byref(o_nrows), ctypes.byref(cnt))
    if rc == -2:
        raise RunCodedBlob("BMT1 blob contains FULL_RUN records; "
                           "use decode-then-apply")
    if rc != 0:
        return None
    if count_mode:
        return int(cnt.value)
    m = out_nbs[:o_nrec.value] >= 0
    nbs = out_nbs[:o_nrec.value][m]
    cls = out_cls[:o_nrec.value][m]
    return nbs, cls, out_words[:o_nrows.value]


def bic_encode_bytes(arr: np.ndarray, lo: int, hi: int) -> bytes:
    """BIC-encode a sorted int64 array -> byte-aligned payload."""
    lib = load()
    arr = np.ascontiguousarray(arr, np.int64)
    out = np.zeros(arr.size * 8 + 16, np.uint8)
    nbits = lib.bm_bic_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), arr.size,
        int(lo), int(hi), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[: (nbits + 7) // 8].tobytes()


def bic_decode_bytes(data: bytes, n: int, lo: int, hi: int) -> np.ndarray:
    lib = load()
    # +8 zero bytes: BitR's fast path reads one 64-bit word past the cursor
    buf = padded_blob(data)
    out = np.zeros(n, np.int64)
    lib.bm_bic_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 0, int(n),
        int(lo), int(hi), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def gamma_encode_bytes(arr: np.ndarray) -> bytes:
    lib = load()
    arr = np.ascontiguousarray(arr, np.uint64)
    # worst case: 2*64-1 bits per value
    out = np.zeros(arr.size * 16 + 16, np.uint8)
    nbits = lib.bm_gamma_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[: (nbits + 7) // 8].tobytes()


def gamma_decode_bytes(data: bytes, n: int) -> np.ndarray:
    lib = load()
    buf = padded_blob(data)
    out = np.zeros(n, np.uint64)
    rc = lib.bm_gamma_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 0,
        (buf.size - 8) * 8, int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if rc < 0:
        raise ValueError("malformed stream: truncated gamma payload")
    return out
