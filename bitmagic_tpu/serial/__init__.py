from .serializer import Deserializer, Serializer, deserialize, serialize
from .opdeser import OperationDeserializer
from .sv_serial import (SparseVectorDeserializer, SparseVectorSerializer,
                        sparse_vector_deserialize, sparse_vector_serialize)
from . import encoding

__all__ = [
    "Serializer", "Deserializer", "serialize", "deserialize",
    "OperationDeserializer", "SparseVectorSerializer",
    "SparseVectorDeserializer", "sparse_vector_serialize",
    "sparse_vector_deserialize", "encoding",
]
