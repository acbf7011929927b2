"""Serialized-BLOB broadcast over the host network (the DCN path).

The reference's serialization layer is explicitly designed for network
transfer and sharded storage (reference README; per-plane layouts in
src/bmsparsevec_serial.h:69).  At mesh scale the matching primitive is a
host-side broadcast of compressed BLOBs: one process serializes, every
process receives the bytes over DCN (jax.distributed / Gloo here) and
deserializes into host-resident vectors — compressed bytes on the wire,
never dense bitmaps (SURVEY.md §5 "distributed communication backend").

Works in single-process runs too (broadcast degenerates to identity), so
the same code path runs everywhere.
"""

from __future__ import annotations

import numpy as np

import jax


def _n_processes() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def broadcast_bytes(data: bytes | None, root: int = 0) -> bytes:
    """Broadcast a byte string from ``root`` to all processes.  Non-root
    callers pass None (or anything — ignored).  Single-process: identity."""
    if _n_processes() == 1:
        if data is None:
            raise ValueError("root payload required in single-process mode")
        return bytes(data)
    from jax.experimental import multihost_utils
    is_root = jax.process_index() == root
    # length first (fixed shape), then the padded payload
    n = np.asarray([len(data) if is_root and data is not None else 0],
                   np.int64)
    n = int(multihost_utils.broadcast_one_to_all(n, is_source=is_root)[0])
    buf = np.zeros(max(n, 1), np.uint8)
    if is_root:
        buf[:n] = np.frombuffer(data, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_root)
    return bytes(np.asarray(buf[:n]).tobytes())


def broadcast_bitvector(bv=None, root: int = 0, level: int = 6):
    """Serialize on the root process, broadcast the compressed BLOB, and
    deserialize on every process (host-resident pool: no device transfer
    until first use).  Returns the BitVector on every process."""
    from ..serial.serializer import Deserializer, Serializer
    is_root = _n_processes() == 1 or jax.process_index() == root
    blob = Serializer(level).serialize(bv) if is_root and bv is not None \
        else None
    blob = broadcast_bytes(blob, root)
    return Deserializer().deserialize(blob)


def broadcast_sparse_vector(sv=None, root: int = 0):
    """Same for succinct vectors: the per-plane BLOB layout travels as one
    compressed byte string."""
    from ..serial.sv_serial import (sparse_vector_deserialize,
                                    sparse_vector_serialize)
    is_root = _n_processes() == 1 or jax.process_index() == root
    blob = sparse_vector_serialize(sv) if is_root and sv is not None \
        else None
    blob = broadcast_bytes(blob, root)
    return sparse_vector_deserialize(blob)


def all_gather_blobs(data: bytes) -> list[bytes]:
    """Every process contributes a BLOB; all receive the full list —
    the partition-then-merge build pattern (reference bvector::merge,
    src/bm.h:1000) across hosts: workers serialize their partitions, all
    gather the compressed parts, each merges locally."""
    n_proc = _n_processes()
    if n_proc == 1:
        return [bytes(data)]
    from jax.experimental import multihost_utils
    pid = jax.process_index()
    sizes = np.zeros(n_proc, np.int64)
    sizes[pid] = len(data)
    sizes = np.asarray(
        multihost_utils.process_allgather(sizes[pid: pid + 1])).reshape(-1)
    cap = int(sizes.max())
    buf = np.zeros(cap, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    allb = np.asarray(multihost_utils.process_allgather(buf))
    return [allb[i, : int(sizes[i])].tobytes() for i in range(n_proc)]


def merge_broadcast_parts(blobs: list[bytes]):
    """Deserialize + OR-merge a list of BLOB partitions into one vector."""
    from ..serial.serializer import Deserializer
    d = Deserializer()
    out = None
    for b in blobs:
        part = d.deserialize(b)
        out = part if out is None else out.bit_or(part)
    return out
