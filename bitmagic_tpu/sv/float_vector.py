"""Succinct float vector.

Equivalent of `bm::sparse_vector_float` (src/bmsparsevec_float.h:59): floats
stored decomposed for bit-slice compressibility.  The reference splits
sign (bit-vector) / exponent / mantissa (two sparse vectors,
src/bmsparsevec_float.h:44-50); this implementation does the same split on
the IEEE-754 image so common-exponent data compresses in the exponent planes
exactly like the reference.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..core.bitvector import BitVector
from .sparse_vector import SparseVector

_I64 = np.int64

_SPEC = {
    np.dtype(np.float32): dict(uint=np.uint32, exp_bits=8, man_bits=23),
    np.dtype(np.float64): dict(uint=np.uint64, exp_bits=11, man_bits=52),
}


class FloatSparseVector:
    """bm::sparse_vector_float equivalent (sign/exponent/mantissa split)."""

    def __init__(self, dtype=np.float32, nullable: bool = False):
        self.dtype = np.dtype(dtype)
        if self.dtype not in _SPEC:
            raise ValueError("dtype must be float32 or float64")
        spec = _SPEC[self.dtype]
        self._uint = spec["uint"]
        self._eb, self._mb = spec["exp_bits"], spec["man_bits"]
        self.sign = BitVector(C.ID_MAX48)
        self.exponent = SparseVector(np.uint16 if self._eb <= 16 else np.uint32)
        self.mantissa = SparseVector(np.uint32 if self._mb <= 32 else np.uint64)
        self.nullable = nullable
        self.null_plane = BitVector(C.ID_MAX48) if nullable else None
        self._size = 0

    # ------------------------------------------------------------------
    @classmethod
    def from_array(cls, values, dtype=None, nullable=False):
        values = np.asarray(values)
        dtype = values.dtype if dtype is None else np.dtype(dtype)
        fv = cls(dtype, nullable=nullable)
        fv.import_values(values, 0)
        return fv

    def import_values(self, values, offset: int = 0):
        values = np.asarray(values, self.dtype)
        n = values.size
        if n == 0:
            return self
        u = values.view(self._uint)
        sign_ids = np.flatnonzero(u >> (self._eb + self._mb)) + offset
        exp = ((u >> self._mb) & ((1 << self._eb) - 1)).astype(
            self.exponent.dtype)
        man = (u & ((1 << self._mb) - 1)).astype(self.mantissa.dtype)
        if sign_ids.size:
            self.sign.set_many(sign_ids)
        self.exponent.import_values(exp, offset)
        self.mantissa.import_values(man, offset)
        self._size = max(self._size, offset + n)
        if self.nullable:
            self.null_plane.set_range(offset, offset + n - 1, True)
        return self

    def push_back(self, v):
        return self.import_values(np.asarray([v], self.dtype), self._size)

    def set(self, i, v):
        i = int(i)
        u = np.asarray([v], self.dtype).view(self._uint)[0]
        self.sign.set(i, bool(u >> (self._eb + self._mb)))
        self.exponent.set(i, (int(u) >> self._mb) & ((1 << self._eb) - 1))
        self.mantissa.set(i, int(u) & ((1 << self._mb) - 1))
        if self.nullable:
            self.null_plane.set(i, True)
        if i >= self._size:
            self._size = i + 1
        return self

    __setitem__ = set

    # ------------------------------------------------------------------
    @property
    def size(self):
        return self._size

    def __len__(self):
        return self._size

    def gather(self, ids) -> np.ndarray:
        ids = np.asarray(ids, _I64)
        e = self.exponent.gather(ids).astype(self._uint)
        m = self.mantissa.gather(ids).astype(self._uint)
        s = self.sign.get_bits(ids).astype(self._uint)
        u = ((s << self._uint(self._eb + self._mb))
             | (e << self._uint(self._mb)) | m)
        vals = u.view(self.dtype)
        if self.nullable:
            vals = np.where(self.null_plane.get_bits(ids), vals,
                            self.dtype.type(0))
        return vals

    def get(self, i):
        return self.gather([i])[0]

    __getitem__ = get

    def decode(self, lo, n):
        return self.gather(np.arange(lo, lo + n, dtype=_I64))

    def to_numpy(self):
        return self.decode(0, self._size)

    def is_null(self, i):
        return self.nullable and not self.null_plane.test(i)

    def set_null(self, i):
        if not self.nullable:
            raise ValueError("not nullable")
        self.null_plane.set(int(i), False)
        return self

    # ------------------------------------------------------------------
    def optimize(self):
        self.sign.optimize()
        self.exponent.optimize()
        self.mantissa.optimize()
        if self.nullable:
            self.null_plane.optimize()
        return self

    def calc_stat(self):
        return {
            "exp": self.exponent.calc_stat(),
            "man": self.mantissa.calc_stat(),
            "sign_memory": self.sign.calc_stat()["memory_used"],
        }

    def equal(self, other: "FloatSparseVector") -> bool:
        a, b = self.to_numpy(), other.to_numpy()
        return a.size == b.size and bool(
            np.array_equal(a.view(self._uint), b.view(self._uint)))

    def __iter__(self):
        return iter(self.to_numpy())
