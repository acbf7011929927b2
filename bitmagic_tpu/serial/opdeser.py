"""Set algebra directly against serialized BLOBs.

Equivalent of `bm::operation_deserializer` (src/bmserial.h:1006) driven by
`serial_stream_iterator` (:847): AND/OR/XOR/SUB and every COUNT_* op apply
between a live BitVector and a compressed BMT1 BLOB **block-record by
block-record** — the BLOB is never materialized into a BitVector.  The C
engine (codecs.cpp bm_bmt1_stream_op) keeps O(1 block) scratch and skips
payload decodes that cannot affect the result (AND against an absent target
block, OR under a FULL target, SUB_BA under a FULL target...), with the
per-record length fields playing the reference's bookmark role.  A pure-
Python streamed fallback with the same record-at-a-time semantics covers
environments without the native library.

Reference-format BLOBs stream the same way: RefDeserializer's sink mode
delivers finalized blocks in ascending order (the serial_stream_iterator
analog) into the combining sink — set and count ops never materialize the
BLOB for either format; results are bit-identical to the materialized
path (tests enforce).
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..core.bitvector import BitVector
from ..core.blocks import Structure
from .encoding import ByteDecoder
from .serializer import (CODE_END, CODE_FULL, Deserializer, MAGIC,
                         _decode_payload)
from . import native


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


_REC_OFFSET = 13          # MAGIC(4) + flags(1) + size u64


def _blob_size(data: bytes) -> int:
    dec = ByteDecoder(data)
    if dec.get_bytes(4) != MAGIC:
        raise ValueError("bad magic")
    dec.get_8()
    return dec.get_64()


def _stream_op_py(data, op, t_nbs, t_cls, t_words, count_mode):
    """Pure-Python record-at-a-time engine with bm_bmt1_stream_op semantics
    (one decoded block live at a time)."""
    nbs_out, cls_out, rows_out = [], [], []
    count = 0
    ones = np.full(C.SET_BLOCK_SIZE, 0xFFFFFFFF, np.uint32)
    zeros = np.zeros(C.SET_BLOCK_SIZE, np.uint32)
    slot = np.where(t_cls == 2, np.cumsum(t_cls == 2) - 1, -1)
    for nb, code, payload in _stream_blocks(data, want=None):
        if nb == "header":
            continue
        pos = np.searchsorted(t_nbs, nb)
        tstate = 0
        tw = None
        if pos < t_nbs.size and t_nbs[pos] == nb:
            tstate = int(t_cls[pos])
            if tstate == 2:
                tw = t_words[slot[pos]]
        rec_full = code == CODE_FULL
        skip = emit_full = False
        if op == native.OP_AND:
            skip = tstate == 0
            emit_full = tstate == 1 and rec_full
        elif op == native.OP_OR:
            emit_full = tstate == 1 or rec_full
        elif op == native.OP_XOR:
            emit_full = rec_full and tstate == 0
            skip = rec_full and tstate == 1
        elif op == native.OP_SUB_AB:
            skip = tstate == 0 or rec_full
        else:                                   # OP_SUB_BA
            skip = tstate == 1
            emit_full = rec_full and tstate == 0
        if skip:
            continue
        if emit_full:
            if count_mode:
                count += C.BITS_PER_BLOCK
            else:
                nbs_out.append(nb)
                cls_out.append(C.CLS_FULL)
            continue
        b = ones if rec_full else _decode_payload(code, payload)
        t = tw if tstate == 2 else (ones if tstate == 1 else zeros)
        if op == native.OP_AND:
            r = t & b
        elif op == native.OP_OR:
            r = t | b
        elif op == native.OP_XOR:
            r = t ^ b
        elif op == native.OP_SUB_AB:
            r = t & ~b
        else:
            r = b & ~t
        if count_mode:
            count += int(np.bitwise_count(r).sum())
        else:
            nbs_out.append(nb)
            cls_out.append(C.CLS_BIT)
            rows_out.append(r)
    if count_mode:
        return count
    rows = (np.stack(rows_out) if rows_out
            else np.zeros((0, C.SET_BLOCK_SIZE), np.uint32))
    return (np.asarray(nbs_out, np.int64), np.asarray(cls_out, np.uint8),
            rows)


def _blob_nbs(data: bytes) -> np.ndarray:
    """Block ids mentioned by the BLOB (headers only — no payload decode)."""
    out = [nb for nb, _, _ in _stream_blocks(data, want=set())
           if nb != "header"]
    return np.asarray(out, np.int64)


_SET_TO_OPC = {
    C.SET_AND: native.OP_AND, C.SET_OR: native.OP_OR,
    C.SET_XOR: native.OP_XOR, C.SET_SUB: native.OP_SUB_AB,
}
_COUNT_TO_OPC = {
    C.SET_COUNT_AND: native.OP_AND, C.SET_COUNT_OR: native.OP_OR,
    C.SET_COUNT_XOR: native.OP_XOR, C.SET_COUNT_SUB_AB: native.OP_SUB_AB,
    C.SET_COUNT_SUB_BA: native.OP_SUB_BA,
}
# ops where target blocks untouched by the BLOB survive / contribute
_PASS_THROUGH = {native.OP_OR, native.OP_XOR, native.OP_SUB_AB}


def _merge_passthrough(out_nbs, out_cls, out_rows, nb_a, cls_a, pool,
                       mentioned):
    """Merge per-record results with target blocks the BLOB never
    mentioned (which pass through unchanged for OR/XOR/SUB_AB)."""
    keep = ~np.isin(nb_a, mentioned)
    if not keep.any():
        return out_nbs, out_cls, out_rows
    slot = np.where(cls_a == 2, np.cumsum(cls_a == 2) - 1, -1)
    pt_nbs = nb_a[keep]
    pt_cls = cls_a[keep]
    pt_rows = pool[slot[keep & (cls_a == 2)]]
    all_nbs = np.concatenate([out_nbs, pt_nbs])
    all_cls = np.concatenate([out_cls, pt_cls])
    order = np.argsort(all_nbs, kind="stable")
    # row index per entry: record rows first, then pass-through rows
    row_src = np.full(all_nbs.size, -1, np.int64)
    nrec_rows = int((out_cls == C.CLS_BIT).sum())
    row_src[: out_nbs.size][out_cls == C.CLS_BIT] = np.arange(nrec_rows)
    row_src[out_nbs.size:][pt_cls == C.CLS_BIT] = \
        nrec_rows + np.arange(int((pt_cls == C.CLS_BIT).sum()))
    all_rows = np.concatenate([out_rows, pt_rows])
    sel = row_src[order]
    return all_nbs[order], all_cls[order], all_rows[sel[sel >= 0]]


def _passthrough_count(nb_a, cls_a, pool, mentioned):
    """Popcount contribution of target blocks the BLOB never mentioned."""
    keep = ~np.isin(nb_a, mentioned)
    if not keep.any():
        return 0
    total = int((cls_a[keep] == 1).sum()) * C.BITS_PER_BLOCK
    slot = np.where(cls_a == 2, np.cumsum(cls_a == 2) - 1, -1)
    rows = pool[slot[keep & (cls_a == 2)]]
    if rows.shape[0]:
        total += int(np.bitwise_count(rows).sum(dtype=np.int64))
    return total


class OperationDeserializer:
    """bm::operation_deserializer equivalent (streamed, no materialize)."""

    def deserialize(self, bv: BitVector, data: bytes, op: int):
        """Apply ``op`` (constants.SET_*) between bv (in place) and the BLOB;
        COUNT_* ops return the count without modifying bv.  Accepts both the
        native BMT1 format and reference-format BLOBs (sniffed by magic)."""
        if bytes(data[:4]) != MAGIC:
            # reference-format BLOB: the block-sequential decoder streams
            # finalized blocks into a combining sink (serial_stream_iterator
            # mode) — no materialization for set/count ops
            if op == C.SET_ASSIGN:
                from .refcodec import ref_deserialize
                bv.swap(ref_deserialize(data))
                return bv
            if op in _SET_TO_OPC:
                return self._ref_stream_apply(bv, data, _SET_TO_OPC[op])
            if op in _COUNT_TO_OPC or op in (C.SET_COUNT_B, C.SET_COUNT,
                                             C.SET_COUNT_A):
                return self._ref_count_op(bv, data, op)
            raise ValueError(f"unsupported op {op}")
        if op == C.SET_ASSIGN:
            bv.swap(Deserializer().deserialize(data))
            return bv
        if op in _SET_TO_OPC:
            return self._stream_apply(bv, data, _SET_TO_OPC[op])
        return self._count_op(bv, data, op)

    # ------------------------------------------------------------------
    @staticmethod
    def _run_stream(bv, data, opc, count_mode):
        nb_a, cls_a, pool = bv._dense_snapshot()
        res = native.bmt1_stream_op(data, _REC_OFFSET, opc, count_mode,
                                    nb_a, cls_a, pool)
        if res is None:
            res = _stream_op_py(data, opc, nb_a, cls_a, pool, count_mode)
        return nb_a, cls_a, pool, res

    def _stream_apply(self, bv, data, opc):
        bv._check_writable()
        nb_a, cls_a, pool, res = self._run_stream(bv, data, opc, False)
        out_nbs, out_cls, out_rows = res
        if opc in _PASS_THROUGH and nb_a.size:
            out_nbs, out_cls, out_rows = _merge_passthrough(
                out_nbs, out_cls, out_rows, nb_a, cls_a, pool,
                _blob_nbs(data))
        blob_sz = _blob_size(data)
        bv._struct = Structure(out_nbs.copy(), out_cls.copy())
        bv._pool = out_rows
        bv._gaps = None
        bv._size = max(bv._size, blob_sz)
        bv._dirty()
        return bv

    # ------------------------------------------------------------------
    # reference-format streaming (RefDeserializer sink mode)
    # ------------------------------------------------------------------
    @staticmethod
    def _combine_one(opc, tstate, tw, b):
        """Combine one blob block (b: words or None=FULL) with the target
        state (0 absent / 1 FULL / 2 row tw).  Returns (cls, words):
        cls 0 zero / 1 FULL / 2 row."""
        rec_full = b is None
        if opc == native.OP_AND:
            if tstate == 0:
                return 0, None
            if tstate == 1:
                return (1, None) if rec_full else (2, b)
            return (2, tw.copy()) if rec_full else (2, tw & b)
        if opc == native.OP_OR:
            if tstate == 1 or rec_full:
                return 1, None
            return (2, b) if tstate == 0 else (2, tw | b)
        if opc == native.OP_XOR:
            if rec_full:
                return (0, None) if tstate == 1 else \
                    ((1, None) if tstate == 0 else (2, ~tw))
            if tstate == 0:
                return 2, b
            if tstate == 1:
                return 2, ~b
            return 2, tw ^ b
        if opc == native.OP_SUB_AB:
            if tstate == 0 or rec_full:
                return 0, None
            if tstate == 1:
                return 2, ~b
            return 2, tw & ~b
        # OP_SUB_BA
        if tstate == 1:
            return 0, None
        if rec_full:
            return (1, None) if tstate == 0 else (2, ~tw)
        return (2, b) if tstate == 0 else (2, b & ~tw)

    def _ref_stream(self, bv, data, opc, count_mode):
        """Run the ref-format decoder in sink mode, combining per block."""
        from .refcodec import RefDeserializer
        nb_a, cls_a, pool = bv._dense_snapshot()
        slot = np.where(cls_a == 2, np.cumsum(cls_a == 2) - 1, -1)
        out_nbs, out_cls, out_rows = [], [], []
        seen = []
        state = {"count": 0}

        def sink(nb, words):
            pos = np.searchsorted(nb_a, nb)
            tstate, tw = 0, None
            if pos < nb_a.size and nb_a[pos] == nb:
                tstate = int(cls_a[pos])
                if tstate == 2:
                    tw = pool[slot[pos]]
            seen.append(nb)
            kind, w = self._combine_one(opc, tstate, tw, words)
            if count_mode:
                if kind == 1:
                    state["count"] += C.BITS_PER_BLOCK
                elif kind == 2:
                    state["count"] += int(np.bitwise_count(w).sum())
                return
            if kind == 1:
                out_nbs.append(nb)
                out_cls.append(C.CLS_FULL)
            elif kind == 2:
                out_nbs.append(nb)
                out_cls.append(C.CLS_BIT)
                out_rows.append(w)

        size = RefDeserializer().deserialize(data, sink=sink)
        rows = (np.stack(out_rows) if out_rows
                else np.zeros((0, C.SET_BLOCK_SIZE), np.uint32))
        res = (np.asarray(out_nbs, np.int64),
               np.asarray(out_cls, np.uint8), rows)
        return nb_a, cls_a, pool, np.asarray(seen, np.int64), size, \
            (state["count"] if count_mode else res)

    def _ref_stream_apply(self, bv, data, opc):
        bv._check_writable()
        nb_a, cls_a, pool, seen, size, res = self._ref_stream(
            bv, data, opc, False)
        out_nbs, out_cls, out_rows = res
        if opc in _PASS_THROUGH and nb_a.size:
            out_nbs, out_cls, out_rows = _merge_passthrough(
                np.asarray(out_nbs, np.int64),
                np.asarray(out_cls, np.uint8), out_rows,
                nb_a, cls_a, pool, seen)
        bv._struct = Structure(np.asarray(out_nbs, np.int64).copy(),
                               np.asarray(out_cls, np.uint8).copy())
        bv._pool = out_rows
        bv._gaps = None
        bv._size = max(bv._size, size)
        bv._dirty()
        return bv

    def _ref_count_op(self, bv, data, op):
        bv._flush()
        if op in (C.SET_COUNT_B, C.SET_COUNT):
            empty = BitVector(1)
            _, _, _, _, _, cnt = self._ref_stream(empty, data,
                                                  native.OP_OR, True)
            return cnt
        if op == C.SET_COUNT_A:
            return bv.count()
        opc = _COUNT_TO_OPC[op]
        nb_a, cls_a, pool, seen, _, cnt = self._ref_stream(
            bv, data, opc, True)
        total = int(cnt)
        if opc in _PASS_THROUGH and nb_a.size:
            total += _passthrough_count(nb_a, cls_a, pool, seen)
        return total

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
        bv._flush()
        if op in (C.SET_COUNT_B, C.SET_COUNT):
            # count of the BLOB alone: stream against an empty target
            empty = np.zeros(0, np.int64)
            res = native.bmt1_stream_op(
                data, _REC_OFFSET, native.OP_OR, True, empty,
                np.zeros(0, np.uint8),
                np.zeros((0, C.SET_BLOCK_SIZE), np.uint32))
            if res is None:
                res = _stream_op_py(
                    data, native.OP_OR, empty, np.zeros(0, np.uint8),
                    np.zeros((0, C.SET_BLOCK_SIZE), np.uint32), True)
            return int(res)
        if op == C.SET_COUNT_A:
            return bv.count()
        if op not in _COUNT_TO_OPC:
            raise ValueError(f"unsupported op {op}")
        opc = _COUNT_TO_OPC[op]
        nb_a, cls_a, pool, res = self._run_stream(bv, data, opc, True)
        total = int(res)
        if opc in _PASS_THROUGH and nb_a.size:
            # target blocks the BLOB does not mention contribute themselves
            total += _passthrough_count(nb_a, cls_a, pool, _blob_nbs(data))
        return total


def _materialize_subset(data, want, size):
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
    pool = (np.stack(rows) if rows
            else np.zeros((0, C.SET_BLOCK_SIZE), np.uint32))
    return BitVector._from_parts(
        Structure(np.asarray(nbs, np.int64), np.asarray(clss, np.uint8)),
        pool, size)
