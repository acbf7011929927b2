"""Reference-format BLOB interop.

Read/write compatibility with the reference serialization format
(src/bmserial.h — ~67 block codes incl. BIC v1-v3, XOR reference chains,
bookmarks) via the native bridge (serial/native/refbridge.cpp), which wraps
the reference's own codec compiled from its headers.

Availability is optional: the bridge builds only where the reference tree is
present (BITMAGIC_REFERENCE_PATH or /root/reference).  The framework's own
format (serializer.py, magic BMT1) is always available and standalone.
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
