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
from .agg.aggregator import (AggOptions, Aggregator,  # noqa: E402
                             aggregator_pipeline_execute)
from .serial.opdeser import OperationDeserializer  # noqa: E402
from .serial.serializer import Deserializer, Serializer  # noqa: E402
from .serial.stream_iter import (IteratorDeserializer,  # noqa: E402
                                 SerialStreamIterator)
from .sv import (BitMatrix, FloatSparseVector, RSCSparseVector,  # noqa: E402
                 SparseVector, SparseVectorScanner, StrSparseVector)

# free-function families of the reference ``bm::`` namespace
# (src/bmalgo.h, bmalgo_impl.h, bmalgo_similarity.h, bmintervals.h,
# bm3vl.h, bmrandom.h, bmbvimport.h, bmsparsevec_algo.h)
from .algo.setops import (  # noqa: E402
    any_and, any_or, any_sub, any_xor, bit_import, bit_import_u32,
    build_jaccard_similarity_batch, build_similarity_batch,
    combine_and, combine_and_sorted, combine_or, combine_sub, combine_xor,
    count_and, count_or, count_sub, count_xor, distance_and_operation,
    distance_operation, distance_operation_any, export_array,
    similarity_batch)
from .algo.traversal import (  # noqa: E402
    for_each_bit, for_each_bit_range, rank_range_split, visit_each_bit,
    visit_each_bit_range)
from .algo.intervals import (  # noqa: E402
    IntervalEnumerator,
    count_intervals, find_interval_end, find_interval_start,
    interval_enumerator, is_interval)
from .algo.kleene import (  # noqa: E402
    and_kleene, get_value_kleene, init_kleene, invert_kleene, or_kleene,
    set_value_kleene)
from .algo.sampling import RandomSubset, random_subset  # noqa: E402
from .algo import rank_compress  # noqa: E402
from .sv.algo import (Set2SetTransform, find_first_mismatch,  # noqa: E402
                      set2set_transform)

__version__ = "0.1.0"

__all__ = [
    "BitVector", "ReadOnlyError",
    "config",
    "constants",
    "simd_version",
    "serialize", "deserialize",
    "Serializer", "Deserializer", "OperationDeserializer",
    "SerialStreamIterator", "IteratorDeserializer",
    "AggOptions",
    "Aggregator",
    "aggregator_pipeline_execute",
    "bit_import_u32",
    "SparseVector", "RSCSparseVector", "StrSparseVector",
    "FloatSparseVector", "BitMatrix", "SparseVectorScanner",
    "algo", "agg", "parallel", "serial", "sv", "utils",
    # free functions (reference bm:: namespace)
    "count_and", "count_or", "count_xor", "count_sub",
    "any_and", "any_or", "any_xor", "any_sub",
    "distance_operation", "distance_operation_any", "build_jaccard_similarity_batch", "distance_and_operation",
    "similarity_batch", "build_similarity_batch",
    "combine_or", "combine_and", "combine_and_sorted", "combine_xor",
    "combine_sub", "export_array", "bit_import",
    "for_each_bit", "for_each_bit_range", "visit_each_bit",
    "visit_each_bit_range", "rank_range_split",
    "count_intervals", "interval_enumerator", "IntervalEnumerator",
    "RandomSubset", "is_interval", "find_interval_start",
    "find_interval_end",
    "init_kleene", "get_value_kleene", "set_value_kleene", "invert_kleene",
    "or_kleene", "and_kleene",
    "random_subset", "rank_compress",
    "find_first_mismatch", "set2set_transform", "Set2SetTransform",
    "__version__",
]
