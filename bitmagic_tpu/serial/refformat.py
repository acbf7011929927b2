"""Reference-codec bridge (fixture generator / cross-validation oracle).

Wraps the REFERENCE's own serializer/deserializer, compiled from its
headers via serial/native/refbridge.cpp.  Only available where the
reference tree is present (BITMAGIC_REFERENCE_PATH or /root/reference);
used by tools/make_refblob_fixtures.py and the cross-checks in
tests/test_refcodec.py.

For standalone reference-format interop use serial/refcodec.py — the
clean-room codec that decodes all ~70 reference block codes (and encodes
a reference-readable subset) with no dependency on the reference tree.
The framework's own native format is serializer.py (magic BMT1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "refbridge.cpp")
_LIB = os.path.join(_DIR, "librefbridge.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _ref_include():
    for cand in (os.environ.get("BITMAGIC_REFERENCE_PATH"),
                 "/root/reference/src"):
        if cand and os.path.exists(os.path.join(cand, "bm.h")):
            return cand
    return None


def load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        inc = _ref_include()
        try:
            if inc and (not os.path.exists(_LIB)
                        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", f"-I{inc}", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
        except Exception:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bmref_deserialize_to_indices.restype = ctypes.c_int64
        lib.bmref_deserialize_to_indices.argtypes = [u8p, ctypes.c_int64,
                                                     u64p, ctypes.c_int64]
        lib.bmref_serialize_from_indices.restype = ctypes.c_int64
        lib.bmref_serialize_from_indices.argtypes = [u64p, ctypes.c_int64,
                                                     ctypes.c_uint64, u8p,
                                                     ctypes.c_int64]
        lib.bmref_selfcheck.restype = ctypes.c_int
        lib.bmref_selfcheck.argtypes = [u8p]
        lib.bmref_serialize_ex.restype = ctypes.c_int64
        lib.bmref_serialize_ex.argtypes = [u64p, ctypes.c_int64,
                                           ctypes.c_uint64, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_int,
                                           u8p, ctypes.c_int64]
        lib.bmref_serialize_xor.restype = ctypes.c_int64
        lib.bmref_serialize_xor.argtypes = [u64p, ctypes.c_int64,
                                            u64p, ctypes.c_int64,
                                            u64p, ctypes.c_int64,
                                            ctypes.c_uint64,
                                            u8p, ctypes.c_int64]
        lib.bmref_deserialize_xor_to_indices.restype = ctypes.c_int64
        lib.bmref_deserialize_xor_to_indices.argtypes = [
            u8p, u64p, ctypes.c_int64, u64p, ctypes.c_int64,
            ctypes.c_uint64, u64p, ctypes.c_int64]
        lib.bmref_gap_stat.restype = ctypes.c_int
        lib.bmref_gap_stat.argtypes = [u64p, ctypes.c_int64,
                                       ctypes.c_uint64, u64p]
        dp = ctypes.POINTER(ctypes.c_double)
        lib.bmref_bench_codec.restype = ctypes.c_int64
        lib.bmref_bench_codec.argtypes = [u64p, ctypes.c_int64,
                                          ctypes.c_uint64, ctypes.c_uint64,
                                          ctypes.c_uint64, ctypes.c_int,
                                          ctypes.c_int, dp]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.bmref_sv_serialize.restype = ctypes.c_int64
        lib.bmref_sv_serialize.argtypes = [u32p, u8p, ctypes.c_int64,
                                           ctypes.c_int, u8p, ctypes.c_int64]
        lib.bmref_sv_deserialize.restype = ctypes.c_int64
        lib.bmref_sv_deserialize.argtypes = [u8p, u32p, u8p, ctypes.c_int64]
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bmref_sv_serialize_i64.restype = ctypes.c_int64
        lib.bmref_sv_serialize_i64.argtypes = [i64p, u8p, ctypes.c_int64,
                                               ctypes.c_int, u8p,
                                               ctypes.c_int64]
        lib.bmref_sv_deserialize_i64.restype = ctypes.c_int64
        lib.bmref_sv_deserialize_i64.argtypes = [u8p, i64p, u8p,
                                                 ctypes.c_int64]
        lib.bmref_rsc_serialize.restype = ctypes.c_int64
        lib.bmref_rsc_serialize.argtypes = [u32p, u8p, ctypes.c_int64,
                                            u8p, ctypes.c_int64]
        lib.bmref_rsc_deserialize.restype = ctypes.c_int64
        lib.bmref_rsc_deserialize.argtypes = [u8p, u32p, u8p, ctypes.c_int64]
        cp = ctypes.c_char_p
        lib.bmref_str_serialize.restype = ctypes.c_int64
        lib.bmref_str_serialize.argtypes = [cp, ctypes.c_int64,
                                            ctypes.c_int, u8p,
                                            ctypes.c_int64]
        lib.bmref_str_deserialize.restype = ctypes.c_int64
        lib.bmref_str_deserialize.argtypes = [u8p, cp, ctypes.c_int64]
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.bmref_float_serialize.restype = ctypes.c_int64
        lib.bmref_float_serialize.argtypes = [f32p, ctypes.c_int64,
                                              u8p, ctypes.c_int64]
        lib.bmref_float_deserialize.restype = ctypes.c_int64
        lib.bmref_float_deserialize.argtypes = [u8p, f32p, ctypes.c_int64]
        _lib = lib
        return lib


def available() -> bool:
    return load() is not None


def deserialize_reference_blob(blob: bytes):
    """Reference BLOB -> BitVector (any reference block code)."""
    from ..core.bitvector import BitVector
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable "
                           "(reference headers not found)")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_deserialize_to_indices(bp, buf.size, None, 0)
    if n < 0:
        raise ValueError("reference deserialization failed")
    out = np.zeros(max(n, 1), np.uint64)
    lib.bmref_deserialize_to_indices(
        bp, buf.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n)
    return BitVector.from_indices(out[:n].astype(np.int64), 1 << 32)


def _u64p(arr):
    return np.ascontiguousarray(arr, np.uint64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint64))


def serialize_reference_blob_ex(ids, size, level=6, bookmarks=0,
                                use_gap=False) -> bytes:
    """Reference serializer with explicit level/bookmarks/GAP strategy —
    fixture generator for the standalone decoder (serial/refcodec.py)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    ids = np.ascontiguousarray(np.asarray(ids, np.uint64))
    ip = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    n = lib.bmref_serialize_ex(ip, ids.size, size, level, bookmarks,
                               int(use_gap), None, 0)
    if n < 0:
        raise ValueError("reference serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_serialize_ex(ip, ids.size, size, level, bookmarks,
                           int(use_gap),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           n)
    return out.tobytes()


def serialize_reference_blob_xor(ids_target, ids_ref, size,
                                 ids_ref2=None) -> bytes:
    """Reference serializer with the XOR reference filter ON
    (refs at rows 0 and optionally 2)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    t = np.ascontiguousarray(np.asarray(ids_target, np.uint64))
    rr = np.ascontiguousarray(np.asarray(ids_ref, np.uint64))
    r2 = np.ascontiguousarray(np.asarray(
        ids_ref2 if ids_ref2 is not None else [], np.uint64))
    tp, rp, r2p = _u64p(t), _u64p(rr), _u64p(r2)
    n = lib.bmref_serialize_xor(tp, t.size, rp, rr.size, r2p, r2.size,
                                size, None, 0)
    if n < 0:
        raise ValueError("reference XOR serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_serialize_xor(
        tp, t.size, rp, rr.size, r2p, r2.size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()


def deserialize_reference_blob_xor(blob, ids_ref, size, ids_ref2=None):
    """Reference deserializer with ref vectors (rows 0, 2) -> indices."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rr = np.ascontiguousarray(np.asarray(ids_ref, np.uint64))
    r2 = np.ascontiguousarray(np.asarray(
        ids_ref2 if ids_ref2 is not None else [], np.uint64))
    rp, r2p = _u64p(rr), _u64p(r2)
    n = lib.bmref_deserialize_xor_to_indices(bp, rp, rr.size, r2p, r2.size,
                                             size, None, 0)
    if n < 0:
        raise ValueError("reference XOR deserialization failed")
    out = np.zeros(max(n, 1), np.uint64)
    lib.bmref_deserialize_xor_to_indices(
        bp, rp, rr.size, r2p, r2.size, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n)
    return out[:n].astype(np.int64)


def serialize_reference_sv(values, notnull, use_xor=True) -> bytes:
    """Reference sparse_vector<u32> serializer -> 'BM' BLOB."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    v = np.ascontiguousarray(values, np.uint32)
    m = np.ascontiguousarray(notnull, np.uint8)
    vp = v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    mp = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_sv_serialize(vp, mp, v.size, int(use_xor), None, 0)
    if n < 0:
        raise ValueError("reference sv serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_sv_serialize(
        vp, mp, v.size, int(use_xor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()


def deserialize_reference_sv(blob):
    """Reference sparse_vector<u32> deserializer -> (values, notnull)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_sv_deserialize(bp, None, None, 0)
    if n < 0:
        raise ValueError("reference sv deserialization failed")
    vals = np.zeros(max(n, 1), np.uint32)
    mask = np.zeros(max(n, 1), np.uint8)
    lib.bmref_sv_deserialize(
        bp, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return vals[:n], mask[:n].astype(bool)


def serialize_reference_sv_i64(values, notnull, use_xor=True) -> bytes:
    """Reference sparse_vector<int64> serializer -> 'BM' BLOB (signed)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    v = np.ascontiguousarray(values, np.int64)
    m = np.ascontiguousarray(notnull, np.uint8)
    vp = v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    mp = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_sv_serialize_i64(vp, mp, v.size, int(use_xor), None, 0)
    if n < 0:
        raise ValueError("reference i64 sv serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_sv_serialize_i64(
        vp, mp, v.size, int(use_xor),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()


def deserialize_reference_sv_i64(blob):
    """Reference sparse_vector<int64> deserializer -> (values, notnull)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_sv_deserialize_i64(bp, None, None, 0)
    if n < 0:
        raise ValueError("reference i64 sv deserialization failed")
    vals = np.zeros(max(n, 1), np.int64)
    mask = np.zeros(max(n, 1), np.uint8)
    lib.bmref_sv_deserialize_i64(
        bp, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return vals[:n], mask[:n].astype(bool)


def serialize_reference_rsc(values, notnull) -> bytes:
    """Reference rsc_sparse_vector<u32> serializer -> 'BC' BLOB."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    v = np.ascontiguousarray(values, np.uint32)
    m = np.ascontiguousarray(notnull, np.uint8)
    vp = v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    mp = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_rsc_serialize(vp, mp, v.size, None, 0)
    if n < 0:
        raise ValueError("reference rsc serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_rsc_serialize(
        vp, mp, v.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()


def deserialize_reference_rsc(blob):
    """Reference rsc_sparse_vector<u32> deserializer -> (values, notnull)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_rsc_deserialize(bp, None, None, 0)
    if n < 0:
        raise ValueError("reference rsc deserialization failed")
    vals = np.zeros(max(n, 1), np.uint32)
    mask = np.zeros(max(n, 1), np.uint8)
    lib.bmref_rsc_deserialize(
        bp, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return vals[:n], mask[:n].astype(bool)


def serialize_reference_str(strings, use_remap=False) -> bytes:
    """Reference str_sparse_vector<char,bv,32> serializer.  ``strings`` is
    a list of str/None (None or empty -> NULL)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    n = len(strings)
    mat = np.zeros((n, 32), np.uint8)
    for i, s in enumerate(strings):
        if s:
            b = s.encode()[:31]
            mat[i, :len(b)] = np.frombuffer(b, np.uint8)
    buf = mat.tobytes()
    sz = lib.bmref_str_serialize(buf, n, int(use_remap), None, 0)
    if sz < 0:
        raise ValueError("reference str serialization failed")
    out = np.zeros(sz, np.uint8)
    lib.bmref_str_serialize(
        buf, n, int(use_remap),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sz)
    return out.tobytes()


def deserialize_reference_str(blob):
    """Reference str_sparse_vector deserializer -> list of str/None."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_str_deserialize(bp, None, 0)
    if n < 0:
        raise ValueError("reference str deserialization failed")
    out = ctypes.create_string_buffer(max(int(n), 1) * 32)
    lib.bmref_str_deserialize(bp, out, n)
    mat = np.frombuffer(out.raw, np.uint8).reshape(-1, 32)[:n]
    res = []
    for row in mat:
        nz = row[row != 0]
        res.append(bytes(nz).decode() if nz.size else None)
    return res


def serialize_reference_float(values) -> bytes:
    """Reference sparse_vector_float serializer -> 'bf0' BLOB."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    v = np.ascontiguousarray(values, np.float32)
    vp = v.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = lib.bmref_float_serialize(vp, v.size, None, 0)
    if n < 0:
        raise ValueError("reference float serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_float_serialize(
        vp, v.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()


def deserialize_reference_float(blob):
    """Reference 'bf0' BLOB -> float32 array."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    buf = np.frombuffer(bytes(blob), np.uint8)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.bmref_float_deserialize(bp, None, 0)
    if n < 0:
        raise ValueError("reference float deserialization failed")
    out = np.zeros(max(n, 1), np.float32)
    lib.bmref_float_deserialize(
        bp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return out[:n]


def reference_gap_stat(ids, size):
    """Reference optimize(opt_compress) classification ground truth:
    dict(bit_blocks, gap_blocks, gaps_by_level, gap_cap_overhead)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    ids = np.ascontiguousarray(np.asarray(ids, np.uint64))
    out = np.zeros(7, np.uint64)
    rc = lib.bmref_gap_stat(_u64p(ids), ids.size, size, _u64p(out))
    if rc != 0:
        raise ValueError("reference gap_stat failed")
    return {"bit_blocks": int(out[0]), "gap_blocks": int(out[1]),
            "gaps_by_level": [int(x) for x in out[2:6]],
            "gap_cap_overhead": int(out[6])}


def bench_reference_codec(ids, size, rng_lo=0, rng_hi=0, level=6,
                          iters=11):
    """Time the reference's OWN serializer/deserializer on this machine,
    in-process, right now (pure codec work, best-of-iters, no ctypes in
    the timed region).  Returns {'blob_bytes', 'ser_s', 'deser_s'} or
    None when the bridge is unavailable.  Used by bench.py so the
    config-5 vs_ref ratio is a same-session A/B instead of a constant
    from a differently-loaded machine."""
    lib = load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(np.asarray(ids, np.uint64))
    res = np.zeros(3, np.float64)
    rc = lib.bmref_bench_codec(
        _u64p(ids), ids.size, int(size), int(rng_lo), int(rng_hi),
        int(level), int(iters),
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    return {"blob_bytes": int(res[0]), "ser_s": float(res[1]),
            "deser_s": float(res[2])}


def serialize_reference_blob(bv) -> bytes:
    """BitVector -> reference-format BLOB (readable by the reference)."""
    lib = load()
    if lib is None:
        raise RuntimeError("reference bridge unavailable")
    ids = np.ascontiguousarray(bv.indices().astype(np.uint64))
    ip = ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    n = lib.bmref_serialize_from_indices(ip, ids.size, bv.size, None, 0)
    if n < 0:
        raise ValueError("reference serialization failed")
    out = np.zeros(n, np.uint8)
    lib.bmref_serialize_from_indices(
        ip, ids.size, bv.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    return out.tobytes()
