from .serializer import Deserializer, Serializer, deserialize, serialize
from .opdeser import OperationDeserializer
from .stream_iter import IteratorDeserializer, SerialStreamIterator
from .sv_serial import (SparseVectorDeserializer, SparseVectorSerializer,
                        sparse_vector_deserialize, sparse_vector_serialize)
from .refcodec import (RefDeserializer, RefSerializer, ref_deserialize,
                       ref_serialize)
from .xor_group import deserialize_group, serialize_group
from .ref_sv import (deserialize_rsc_blob, deserialize_sv_blob,
                     serialize_rsc_blob, serialize_sv_blob)
from . import encoding, ref_sv, refcodec, refformat

__all__ = [
    "Serializer", "Deserializer", "serialize", "deserialize",
    "OperationDeserializer", "SparseVectorSerializer",
    "SparseVectorDeserializer", "sparse_vector_serialize",
    "sparse_vector_deserialize", "encoding",
    # reference-format interop: refcodec is the standalone clean-room codec
    # (all ~70 block codes); refformat wraps the reference's own compiled
    # codec when its tree is present (fixture generation / cross-checks)
    "RefSerializer", "RefDeserializer", "ref_serialize", "ref_deserialize",
    "serialize_group", "deserialize_group",
    "serialize_sv_blob", "deserialize_sv_blob",
    "serialize_rsc_blob", "deserialize_rsc_blob",
    "refcodec", "refformat", "ref_sv",
]
