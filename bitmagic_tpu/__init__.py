"""bitmagic_tpu — a TPU-native succinct bit-vector / set-algebra framework.

Brand-new JAX/XLA/Pallas implementation of the capability set of the reference
C++ library (tlk00/BitMagic, see SURVEY.md): block-structured compressed
bit-vectors with full set algebra, rank/select, a multi-vector aggregator,
bit-sliced succinct vectors of ints/floats/strings searchable in compressed
form, entropy-coded serialization, and mesh-sharded multi-chip scaling.
"""

# dtype discipline (SURVEY.md §7 hard part 6 — 48-bit addressing): bit ids
# and block ids are int64 ON THE HOST (numpy metadata); device arrays are
# uint32/int32 only.  TPUs emulate 64-bit integers as u32 pairs, and Pallas
# rejects them outright, so nothing 64-bit ever crosses to the device: global
# addresses decompose host-side into (pool row, in-block offset) pairs that
# always fit 32 bits.

from . import constants  # noqa: E402
from .config import config, simd_version  # noqa: E402
from .core.bitvector import BitVector, ReadOnlyError  # noqa: E402
from . import algo, agg, parallel, serial, sv, utils  # noqa: E402
# one-shot free functions (reference bm::serialize / bm::deserialize)
from .serial.serializer import deserialize, serialize  # noqa: E402

# Everything a reference user reaches through the single ``bm::`` namespace
# is also reachable here at the top level (full module paths stay canonical;
# these are aliases, see MIGRATING.md).
from .agg.aggregator import Aggregator  # noqa: E402
from .serial.opdeser import OperationDeserializer  # noqa: E402
from .serial.serializer import Deserializer, Serializer  # noqa: E402
from .serial.stream_iter import (IteratorDeserializer,  # noqa: E402
                                 SerialStreamIterator)
from .sv import (BitMatrix, FloatSparseVector, RSCSparseVector,  # noqa: E402
                 SparseVector, SparseVectorScanner, StrSparseVector)

__version__ = "0.1.0"

__all__ = [
    "BitVector", "ReadOnlyError",
    "config",
    "constants",
    "simd_version",
    "serialize", "deserialize",
    "Serializer", "Deserializer", "OperationDeserializer",
    "SerialStreamIterator", "IteratorDeserializer",
    "Aggregator",
    "SparseVector", "RSCSparseVector", "StrSparseVector",
    "FloatSparseVector", "BitMatrix", "SparseVectorScanner",
    "algo", "agg", "parallel", "serial", "sv", "utils",
    "__version__",
]
