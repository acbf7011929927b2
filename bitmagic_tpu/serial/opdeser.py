"""Set algebra directly against serialized BLOBs.

Equivalent of `bm::operation_deserializer` (src/bmserial.h:1006): apply
AND/OR/XOR/SUB/COUNT_* between a live BitVector and a compressed BLOB without
fully materializing the BLOB — block records are streamed; for AND the target
structure prunes which payloads are even decoded (the record-length skipping
plays the role of the reference's bookmarks)."""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..core.bitvector import BitVector
from .encoding import ByteDecoder
from .serializer import (CODE_END, CODE_FULL, Deserializer, MAGIC,
                         _decode_payload)


def _stream_blocks(data: bytes, want=None):
    """Yield (block_id, code, payload_or_None).  If ``want`` is a set of
    block ids, payloads of other blocks are skipped without decoding."""
    dec = ByteDecoder(data)
    if dec.get_bytes(4) != MAGIC:
        raise ValueError("bad magic")
    dec.get_8()
    size = dec.get_64()
    yield ("header", size, None)
    while True:
        nb = dec.get_48()
        code = dec.get_8()
        plen = dec.get_32()
        if code == CODE_END:
            return
        if want is not None and nb not in want:
            dec.pos += plen
            yield (nb, code, None)
            continue
        yield (nb, code, dec.get_bytes(plen))


class OperationDeserializer:
    """bm::operation_deserializer equivalent."""

    def deserialize(self, bv: BitVector, data: bytes, op: int):
        """Apply ``op`` (constants.SET_*) between bv (in place) and the BLOB;
        COUNT_* ops return the count without modifying bv.  Accepts both the
        native BMT1 format and reference-format BLOBs (sniffed by magic)."""
        if bytes(data[:4]) != MAGIC:
            # reference-format BLOB: decode standalone, then apply
            from .refcodec import ref_deserialize
            other = ref_deserialize(data)
            return self._apply_decoded(bv, other, op)
        if op in (C.SET_AND, C.SET_OR, C.SET_XOR, C.SET_SUB, C.SET_ASSIGN):
            other = Deserializer().deserialize(data)
            if op == C.SET_AND:
                bv.bit_and(other)
            elif op == C.SET_OR:
                bv.bit_or(other)
            elif op == C.SET_XOR:
                bv.bit_xor(other)
            elif op == C.SET_SUB:
                bv.bit_sub(other)
            else:
                bv.swap(other)
            return bv
        return self._count_op(bv, data, op)

    def _apply_decoded(self, bv: BitVector, other: BitVector, op: int):
        from ..algo import setops
        if op == C.SET_AND:
            return bv.bit_and(other)
        if op == C.SET_OR:
            return bv.bit_or(other)
        if op == C.SET_XOR:
            return bv.bit_xor(other)
        if op == C.SET_SUB:
            return bv.bit_sub(other)
        if op == C.SET_ASSIGN:
            bv.swap(other)
            return bv
        if op in (C.SET_COUNT_B, C.SET_COUNT):
            return other.count()
        if op == C.SET_COUNT_A:
            return bv.count()
        metric = {
            C.SET_COUNT_AND: setops.COUNT_AND,
            C.SET_COUNT_OR: setops.COUNT_OR,
            C.SET_COUNT_XOR: setops.COUNT_XOR,
            C.SET_COUNT_SUB_AB: setops.COUNT_SUB_AB,
            C.SET_COUNT_SUB_BA: setops.COUNT_SUB_BA,
        }.get(op)
        if metric is None:
            raise ValueError(f"unsupported op {op}")
        return setops.distance_operation(bv, other, [metric])[metric]

    def _count_op(self, bv: BitVector, data: bytes, op: int) -> int:
        from ..algo import setops
        bv._flush()
        if op == C.SET_COUNT_B or op == C.SET_COUNT:
            # count of the BLOB itself: stream, no full materialize
            total = 0
            for nb, code, payload in _stream_blocks(data):
                if nb == "header":
                    continue
                if code == CODE_FULL:
                    total += C.BITS_PER_BLOCK
                elif payload is not None:
                    words = _decode_payload(code, payload)
                    total += int(np.unpackbits(
                        words.view(np.uint8), bitorder="little").sum())
            return total
        if op == C.SET_COUNT_A:
            return bv.count()
        metric = {
            C.SET_COUNT_AND: setops.COUNT_AND,
            C.SET_COUNT_OR: setops.COUNT_OR,
            C.SET_COUNT_XOR: setops.COUNT_XOR,
            C.SET_COUNT_SUB_AB: setops.COUNT_SUB_AB,
            C.SET_COUNT_SUB_BA: setops.COUNT_SUB_BA,
        }.get(op)
        if metric is None:
            raise ValueError(f"unsupported op {op}")
        # AND-like counts only need blocks present in bv; stream-skip others.
        # The whole count runs on the host (numpy popcount): BLOB ops are
        # latency-bound, and a host pass beats device round-trips until the
        # working set is orders of magnitude larger than typical BLOBs.
        if op == C.SET_COUNT_AND:
            return self._count_and_host(bv, data)
        other = Deserializer().deserialize(data)
        return setops.distance_operation(bv, other, [metric])[metric]

    @staticmethod
    def _count_and_host(bv: BitVector, data: bytes) -> int:
        # dense snapshot: GAP-resident blocks expand transiently
        nb_a, cls_a, pool = bv._dense_snapshot()
        slots_a = np.where(cls_a == C.CLS_BIT,
                           np.cumsum(cls_a == C.CLS_BIT) - 1, -1)
        amap = {int(nb_a[k]): (cls_a[k], slots_a[k])
                for k in range(len(nb_a))}
        total = 0
        for nb, code, payload in _stream_blocks(data, want=set(amap)):
            if nb == "header" or (payload is None and code != CODE_FULL):
                continue
            ent = amap.get(nb)
            if ent is None:
                continue
            cls, slot = ent
            if code == CODE_FULL:
                if cls == C.CLS_FULL:
                    total += C.BITS_PER_BLOCK
                else:
                    total += int(np.bitwise_count(pool[slot]).sum())
                continue
            words = _decode_payload(code, payload)
            if cls == C.CLS_FULL:
                total += int(np.bitwise_count(words).sum())
            else:
                total += int(np.bitwise_count(pool[slot] & words).sum())
        return total


def _materialize_subset(data, want, size):
    import jax.numpy as jnp
    from ..core.blocks import Structure
    from ..ops import blockops
    nbs, clss, rows = [], [], []
    for nb, code, payload in _stream_blocks(data, want=want):
        if nb == "header" or payload is None and code != CODE_FULL:
            continue
        if code == CODE_FULL:
            if nb in want:
                nbs.append(nb); clss.append(C.CLS_FULL)
            continue
        nbs.append(nb); clss.append(C.CLS_BIT)
        rows.append(_decode_payload(code, payload))
    pool = (jnp.asarray(np.stack(rows)) if rows else blockops.zero_pool(0))
    return BitVector._from_parts(
        Structure(np.asarray(nbs, np.int64), np.asarray(clss, np.uint8)),
        pool, size)
