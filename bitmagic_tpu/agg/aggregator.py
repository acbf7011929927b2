"""Multi-vector aggregator: fused group operations OR(v1..vN), AND(v1..vN)
and AND(and_group) MINUS OR(sub_group) over arbitrarily large vector groups.

Equivalent of `bm::aggregator<BV>` (src/bmaggregator.h:121): the reference
evaluates *horizontally* — for each block position it processes all N source
blocks with digest narrowing (combine_and_sub kernel :1719-1790,
process_bit_blocks_and/sub, sort_input_blocks_*).  The TPU formulation:

  * the block work-list is computed on host from the operand structures —
    AND-group intersection / OR-group union of allocated block sets; a
    missing block in any AND operand kills the whole column ("golden block"
    early-out, reference :1731), a FULL block in the OR/SUB side kills it too;
  * the device pass is ONE fused XLA program: for each effective block, a
    chain of gather->AND / gather->OR ops over the K operand pools, fused by
    XLA into a single HBM sweep — the analog of the reference's 2/3/5-way
    digest cascades (src/bmfunc.h:7697).

The pipeline API (reference :223) batches many AND-SUB searches; block
gathers are shared across requests at the XLA level (common subexpressions
over the same pools).
"""

from __future__ import annotations

import dataclasses
import enum
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..core.bitvector import BitVector
from ..core.blocks import Structure, gather_operand, operand_args

_I64 = np.int64


def _structures(vectors):
    """Flushed raw structures — NOT materialized: every consumer reads
    them through the run-aware lookup() or the run-aware blocklist
    helpers below, so wide FULL runs stay interval-coded end to end."""
    for v in vectors:
        v._flush()
    return [v._struct for v in vectors]


def _and_blocklist(structs):
    """Intersection of operand block sets.  Run-aware without expanding
    every operand: the flat candidate list comes from the SMALLEST
    operand only (bounded materialization), then the others restrict it
    via the run-aware lookup — O(min operand), so one wide run-coded
    operand ANDed with a sparse one never materializes the run."""
    if not structs:
        return np.zeros(0, _I64)
    base = min(structs, key=lambda s: len(s.nb) + s.run_block_count())
    nb = base.materialized().nb if base.has_runs else base.nb
    for s in structs:
        if s is base or nb.size == 0:
            continue
        st, _ = s.lookup(nb)
        nb = nb[st != 0]
    return nb


def _or_blocklist(structs):
    """Union of operand block sets.  An OR result over a wide FULL run is
    inherently wide, so runs expand here (bounded materialization) —
    combine_or routes run-coded operands through the symbolic left-fold
    before reaching this dense-kernel path."""
    if not structs:
        return np.zeros(0, _I64)
    return functools.reduce(
        np.union1d,
        ((s.materialized().nb if s.has_runs else s.nb) for s in structs))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _agg_kernel(n_and, n_sub, *args):
    """args = [pool, slot, full, aux, aux_slot] * (n_and + n_sub) aligned on
    the same block work-list.  Computes AND(and rows) & ~OR(sub rows) in one
    fused pass."""
    ops = [args[i * 5:i * 5 + 5] for i in range(n_and + n_sub)]
    acc = None
    for op in ops[:n_and]:
        rows = gather_operand(*op)
        acc = rows if acc is None else (acc & rows)
    sub = None
    for op in ops[n_and:]:
        rows = gather_operand(*op)
        sub = rows if sub is None else (sub | rows)
    if acc is None:                  # pure OR aggregation passed via sub
        return sub
    if sub is not None:
        acc = acc & ~sub
    return acc


def _operand_args(vectors, blocklist):
    args = []
    for v in vectors:
        args.extend(operand_args(v, blocklist))
    return args


@functools.partial(jax.jit, static_argnums=(0, 1))
def _agg_any_kernel(n_and, n_sub, *args):
    """Per-block nonzero flags of AND(and rows) & ~OR(sub rows) — the
    early-exit probe: int32[n_blocks], no result rows leave the device."""
    acc = _agg_kernel(n_and, n_sub, *args)
    return jnp.sum(jax.lax.population_count(acc).astype(jnp.int32),
                   axis=1)


@functools.partial(jax.jit, static_argnums=0)
def _shift_and_chain(k, first_mask, *args):
    """acc = rows0; acc = shift_up1(acc) & rows_k — whole chain fused.
    The shift carries bits across words AND blocks by viewing the block
    list as one flat bit string; ``first_mask`` (uint32[n_blocks]) clears
    bit 0 of each block's first word when its LIST predecessor is not its
    ADDRESS predecessor, so gaps in a narrowed blocklist do not leak
    carries across non-adjacent blocks."""
    rows = [gather_operand(*args[i * 5:(i + 1) * 5]) for i in range(k)]

    def _shift_up1(acc):
        flat = acc.reshape(-1)
        carry = jnp.concatenate(
            [jnp.zeros(1, jnp.uint32), flat[:-1] >> jnp.uint32(31)])
        out = ((flat << jnp.uint32(1)) | carry).reshape(acc.shape)
        return out.at[:, 0].set(out[:, 0] & first_mask)

    if k == 1:
        return rows[0]
    acc0 = rows[0]
    rest = jnp.stack(rows[1:])

    def body(acc, r):
        return _shift_up1(acc) & r, None

    acc, _ = jax.lax.scan(body, acc0, rest)
    return acc


class OperationStatus(enum.IntEnum):
    """Staged-execution states (reference aggregator::operation_status,
    src/bmaggregator.h:147-153)."""
    op_undefined = 0
    op_prepared = 1
    op_in_progress = 2
    op_done = 3


BM_NOT_DEFINED = 0      # reference aggregator::operation (src/bmaggregator.h:141)
BM_SHIFT_R_AND = 1


@dataclasses.dataclass
class AggOptions:
    """Run options (reference agg_run_options, src/bmaggregator.h:65):
    counts-only / masks-only modes for pipelines, plus the reference
    pipeline knobs (set_or_target / set_search_count_limit,
    src/bmaggregator.h:251/260)."""
    make_results: bool = True
    compute_counts: bool = False
    or_target: object = None            # BitVector to OR all results into
    search_count_limit: int | None = None

    def set_compute_count(self, count_mode: bool = True):
        """reference pipeline set_compute_count (src/bmaggregator.h:363)."""
        self.compute_counts = bool(count_mode)
        self.make_results = not count_mode
        return self

    def set_or_target(self, bv_or):
        self.or_target = bv_or
        return self

    def set_search_count_limit(self, limit):
        self.search_count_limit = None if limit is None else int(limit)
        return self


class Aggregator:
    """Group set operations over vector lists (bm::aggregator equivalent).

    Supports both the functional style (pass vector lists directly) and the
    reference's stateful style: ``add(bv[, group])`` then ``combine_*()``
    with no arguments (reference aggregator::add, src/bmaggregator.h:391).
    Group 0 = AND/OR arguments, group 1 = SUB arguments.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        """Clear added argument groups (reference reset, :386 — which
        also calls reset_range_hint, src/bmaggregator.h:941-946)."""
        self._groups = ([], [])
        self._operation = BM_NOT_DEFINED
        self._op_status = OperationStatus.op_undefined
        self._op_k = 0
        self._bv_target: BitVector | None = None
        self._range_hint = None

    def add(self, bv, group: int = 0) -> int:
        self._groups[group].append(bv)
        return len(self._groups[group])

    # ------------------------------------------------------------------
    # staged execution (reference pipeline-operations API,
    # src/bmaggregator.h:595-622 + the interleaved run_step pattern
    # documented at :867-898): set_operation -> stage -> run_step*,
    # so many aggregations can be time-sliced against each other.
    # ------------------------------------------------------------------
    def set_operation(self, op_code: int):
        """src/bmaggregator.h:609."""
        if op_code not in (BM_NOT_DEFINED, BM_SHIFT_R_AND):
            raise ValueError(f"unknown aggregator operation {op_code}")
        self._operation = op_code
        return self

    def get_operation(self) -> int:
        """src/bmaggregator.h:606."""
        return self._operation

    def get_operation_status(self) -> OperationStatus:
        """src/bmaggregator.h:622."""
        return self._op_status

    def get_target(self) -> BitVector | None:
        """Result vector of the staged operation (src/bmaggregator.h:623)."""
        return self._bv_target

    def stage(self, temp_block=None):
        """Prepare the staged operation (src/bmaggregator.h:615).  The
        TPU design steps per OPERAND (each step is one fused full-width
        device op) rather than per (i,j) block pair — block-pair stepping
        would serialize what one XLA pass already covers."""
        if self._operation != BM_SHIFT_R_AND:
            raise ValueError("set_operation(BM_SHIFT_R_AND) first")
        if not self._groups[0]:
            raise ValueError("no argument vectors added")
        self._op_k = 0
        self._bv_target = None
        self._op_status = OperationStatus.op_prepared
        return self

    def run_step(self, i: int | None = None, j: int | None = None
                 ) -> OperationStatus:
        """One step of the staged operation (src/bmaggregator.h:620).
        The (i, j) coordinates are accepted for signature parity and
        ignored — steps are operand-ordered here (see stage())."""
        if self._op_status not in (OperationStatus.op_prepared,
                                   OperationStatus.op_in_progress):
            raise RuntimeError("stage() the operation first")
        vecs = self._groups[0]
        if self._op_k == 0:
            self._bv_target = vecs[0].copy()
        else:
            self._bv_target.shift_right()
            self._bv_target.bit_and(vecs[self._op_k])
        self._op_k += 1
        self._op_status = (OperationStatus.op_done
                           if self._op_k >= len(vecs)
                           else OperationStatus.op_in_progress)
        return self._op_status

    def run(self, i_from: int = 0, j_from: int = 0) -> OperationStatus:
        """Run the staged operation to completion (src/bmaggregator.h:618)
        as ONE fused device chain (combine_shift_right_and) — stepping is
        only for interleaving."""
        if self._op_status == OperationStatus.op_undefined:
            self.stage()
        if self._op_status in (OperationStatus.op_prepared,) \
                and self._op_k == 0:
            self._bv_target = self.combine_shift_right_and(self._groups[0])
            self._op_k = len(self._groups[0])
            self._op_status = OperationStatus.op_done
            return self._op_status
        while self._op_status != OperationStatus.op_done:
            self.run_step()
        return self._op_status

    def combine_or(self, vectors=None) -> BitVector:
        """OR(v1..vN) (reference combine_or, src/bmaggregator.h:404)."""
        if vectors is None:
            vectors = self._groups[0]
        if not vectors:
            return BitVector(0)
        size = max(v.size for v in vectors)
        for v in vectors:
            v._flush()
        if any(v._struct.has_runs for v in vectors):
            # run-coded operand: left-fold through the run-aware planner —
            # the result keeps wide spans interval-coded instead of
            # expanding them for the dense kernel
            acc = vectors[0]
            for v in vectors[1:]:
                acc = acc | v
            if acc is vectors[0]:
                acc = acc.copy()          # never alias an input
            if acc.size != size:
                acc.resize(size)
            return acc
        structs = _structures(vectors)
        nb = _or_blocklist(structs)
        if nb.size == 0:
            return BitVector(size)
        if len(vectors) > 1 and self._all_succinct(vectors, nb):
            acc = vectors[0]
            for v in vectors[1:]:
                acc = acc | v
            if acc is vectors[0]:
                acc = acc.copy()          # never alias an input
            if acc.size != size:
                acc.resize(size)
            return acc
        # blocks where any operand is FULL are FULL
        full_any = np.zeros(nb.size, bool)
        for s in structs:
            st, _ = s.lookup(nb)
            full_any |= st == 1
        kern_nb = nb[~full_any]
        pool = (_agg_kernel(0, len(vectors),
                            *_operand_args(vectors, kern_nb))
                if kern_nb.size else None)
        return _assemble(nb, full_any, kern_nb, pool, size)

    @staticmethod
    def _all_succinct(vectors, nb) -> bool:
        """True when no operand holds a dense row on any listed block —
        the whole group op can fold in the run domain (host) without any
        expansion."""
        for v in vectors:
            st, _ = v._struct.lookup(nb)
            if (st == 2).any():
                return False
        return True

    def combine_and(self, vectors=None) -> BitVector:
        """AND(v1..vN) (reference combine_and, src/bmaggregator.h:412)."""
        if vectors is None:
            vectors = self._groups[0]
        if not vectors:
            return BitVector(0)
        size = max(v.size for v in vectors)
        structs = _structures(vectors)
        try:
            nb = _and_blocklist(structs)
        except MemoryError:
            # EVERY operand is wide-run-coded (even the smallest exceeds
            # the flat-view bound): fold through the run-aware planner —
            # the result keeps its spans interval-coded
            acc = vectors[0]
            for v in vectors[1:]:
                acc = acc & v
            if acc is vectors[0]:
                acc = acc.copy()
            if acc.size != size:
                acc.resize(size)
            return acc
        if nb.size == 0:
            return BitVector(size)
        if len(vectors) > 1 and self._all_succinct(vectors, nb):
            # sparse group: left-fold in the run domain (gap_buff_op
            # chains); no device pass, result stays succinct
            acc = vectors[0]
            for v in vectors[1:]:
                acc = acc & v
            if acc is vectors[0]:
                acc = acc.copy()          # never alias an input
            if acc.size != size:
                acc.resize(size)
            return acc
        full_all = np.ones(nb.size, bool)
        for s in structs:
            st, _ = s.lookup(nb)
            full_all &= st == 1
        kern_nb = nb[~full_all]
        pool = (_agg_kernel(len(vectors), 0,
                            *_operand_args(vectors, kern_nb))
                if kern_nb.size else None)
        return _assemble(nb, full_all, kern_nb, pool, size)

    # -- range hint (reference set_range_hint, src/bmaggregator.h:481) --
    _range_hint = None

    def set_range_hint(self, from_, to) -> bool:
        """Block-granular search range restriction for combine_and_sub /
        find_first_and_sub (reference set_range_hint,
        src/bmaggregator.h:481 — the reference also narrows at block
        granularity).  Returns True when the range is one-block bound."""
        lo, hi = int(from_), int(to)
        if lo > hi:
            lo, hi = hi, lo
        self._range_hint = (lo, hi)
        return (lo >> C.SET_BLOCK_SHIFT) == (hi >> C.SET_BLOCK_SHIFT)

    def reset_range_hint(self) -> None:
        """src/bmaggregator.h:486."""
        self._range_hint = None

    def _apply_range_hint(self, nb: np.ndarray) -> np.ndarray:
        if self._range_hint is None or nb.size == 0:
            return nb
        lo, hi = self._range_hint
        return nb[(nb >= (lo >> C.SET_BLOCK_SHIFT))
                  & (nb <= (hi >> C.SET_BLOCK_SHIFT))]

    # -- target optimize mode (reference set_optimization, bmaggregator) --
    _opt_mode = False

    def set_optimization(self, opt=True) -> None:
        """Request optimize() (block re-classification) on every combine_*
        target before it is returned (reference set_optimization)."""
        self._opt_mode = bool(opt)

    def _maybe_optimize(self, bv: BitVector) -> BitVector:
        if self._opt_mode:
            bv.optimize()
        return bv

    def combine_and_sub(self, and_group=None, sub_group=None) -> BitVector:
        """AND(and_group) MINUS OR(sub_group) — the reference's flagship
        fused search op (combine_and_sub, src/bmaggregator.h:420)."""
        if and_group is None:
            and_group = self._groups[0]
        if sub_group is None:
            sub_group = self._groups[1] if and_group is self._groups[0] else ()
        and_group = list(and_group)
        sub_group = list(sub_group)
        if not and_group:
            return BitVector(0)
        sa = _structures(and_group)
        ss = _structures(sub_group)
        size = max(v.size for v in and_group + sub_group)
        try:
            nb = self._apply_range_hint(_and_blocklist(sa))
        except MemoryError:
            # all-run-coded AND group: symbolic fold (see combine_and)
            acc = and_group[0].copy()
            for v in and_group[1:]:
                acc.bit_and(v)
            for v in sub_group:
                acc.bit_sub(v)
            if acc.size != size:
                acc.resize(size)
            return acc
        if nb.size == 0:
            return BitVector(size)
        # drop blocks where any SUB operand is FULL (result zero there)
        keep = np.ones(nb.size, bool)
        for s in ss:
            st, _ = s.lookup(nb)
            keep &= st != 1
        nb = nb[keep]
        if nb.size == 0:
            return BitVector(size)
        # FULL result only if every AND op is FULL and no SUB bits exist
        full_all = np.ones(nb.size, bool)
        for s in sa:
            st, _ = s.lookup(nb)
            full_all &= st == 1
        sub_absent = np.ones(nb.size, bool)
        for s in ss:
            st, _ = s.lookup(nb)
            sub_absent &= st == 0
        pure_full = full_all & sub_absent
        kern_nb = nb[~pure_full]
        if kern_nb.size and self._all_succinct(
                list(and_group) + list(sub_group), kern_nb):
            # sparse group: run-domain fold (no expansion, succinct result)
            acc = and_group[0]
            for v in and_group[1:]:
                acc = acc & v
            for v in sub_group:
                acc = acc - v
            if acc is and_group[0]:
                acc = acc.copy()          # never alias an input
            if acc.size != size:
                acc.resize(size)
            return acc
        pool = None
        if kern_nb.size:
            args = (_operand_args(and_group, kern_nb)
                    + _operand_args(sub_group, kern_nb))
            pool = _agg_kernel(len(and_group), len(sub_group), *args)
        return _assemble(nb, pure_full, kern_nb, pool, size)

    def find_first_and_sub(self, and_group=None, sub_group=None) -> int:
        """First bit of AND-SUB result, -1 if none (reference
        find_first_and_sub with per-block early exit,
        src/bmaggregator.h:460).  TPU adaptation: ONE fused pass computes
        per-block any-flags only (no result rows are materialized or
        fetched); the first hit block alone is then computed and scanned."""
        if and_group is None:
            and_group = self._groups[0]
        if sub_group is None:
            sub_group = self._groups[1] if and_group is self._groups[0] else ()
        and_group = list(and_group)
        sub_group = list(sub_group)
        if not and_group:
            return -1
        sa = _structures(and_group)
        ss = _structures(sub_group)
        try:
            nb = self._apply_range_hint(_and_blocklist(sa))
        except MemoryError:
            # all-run-coded AND group: symbolic fold, then find
            acc = and_group[0].copy()
            for v in and_group[1:]:
                acc.bit_and(v)
            for v in sub_group:
                acc.bit_sub(v)
            return acc.find(0)
        if nb.size == 0:
            return -1
        keep = np.ones(nb.size, bool)
        for s in ss:
            st, _ = s.lookup(nb)
            keep &= st != 1
        nb = nb[keep]
        if nb.size == 0:
            return -1
        args = (_operand_args(and_group, nb) + _operand_args(sub_group, nb))
        flags = np.asarray(_agg_any_kernel(len(and_group), len(sub_group),
                                           *args))
        hits = np.flatnonzero(flags)
        # with a range hint the edge blocks need a bit-precise scan (the
        # reference installs a precise filter for the one-block case,
        # src/bmaggregator.h:974-987/2006-2011); a hit block may hold only
        # out-of-range bits, so walk hit blocks until a real in-range bit
        for k in hits:
            k = int(k)
            one = nb[k: k + 1]
            args1 = (_operand_args(and_group, one)
                     + _operand_args(sub_group, one))
            row = np.asarray(_agg_kernel(len(and_group), len(sub_group),
                                         *args1))[0]
            bits = np.unpackbits(row.view(np.uint8), bitorder="little")
            base = int(nb[k]) << C.SET_BLOCK_SHIFT
            if self._range_hint is not None:
                lo, hi = self._range_hint
                lo_in = max(lo - base, 0)
                hi_in = min(hi - base, C.BITS_PER_BLOCK - 1)
                if hi_in < lo_in:
                    continue
                nz = np.flatnonzero(bits[lo_in:hi_in + 1])
                if nz.size == 0:
                    continue
                return base + lo_in + int(nz[0])
            nz = np.flatnonzero(bits)
            if nz.size:
                return base + int(nz[0])
        return -1

    def combine_shift_right_and(self, vectors) -> BitVector:
        """Bitap-style fingerprint combine: acc = v0; acc = (acc shifted one
        position up) & v[k] for k = 1..N-1 (reference
        combine_shift_right_and, src/bmaggregator.h:510 + the fused per-word
        shift_r1_and, src/bmfunc.h:6638; DNA-search sample 06/xsample04).

        ONE jitted device pass: a lax.scan carries the shift bit across the
        whole chain — no per-step host round-trips.  The block list is
        NARROWED first: a final hit at block B needs every operand present
        in {B-1, B} (total shift drift is N-1 < 2^16 bits), so only those
        candidates plus their address predecessors (the carry history)
        materialize — O(intersection), not O(address span)."""
        vectors = list(vectors)
        if not vectors:
            return BitVector(0)
        for v in vectors:
            v._flush()
        size = max(v.size for v in vectors)
        flat = [v._flat_nb() for v in vectors]   # materialize runs ONCE
        nbs = [x for x in flat if len(x)]
        if not nbs or not len(flat[0]):
            return BitVector(size)
        hi = min(int(max(x[-1] for x in nbs)) + 1,      # shift spill
                 (size - 1) >> C.SET_BLOCK_SHIFT)
        if len(vectors) - 1 <= C.BITS_PER_BLOCK:
            cand = None
            for nbv in flat:
                ext = np.union1d(nbv, nbv + 1)
                cand = ext if cand is None else np.intersect1d(
                    cand, ext, assume_unique=True)
            blocklist = np.union1d(cand, cand - 1)
            blocklist = blocklist[(blocklist >= 0) & (blocklist <= hi)]
        else:
            # chains longer than one block's bits can drift further:
            # keep the contiguous covering range
            lo = int(min(x[0] for x in nbs))
            blocklist = np.arange(lo, hi + 1, dtype=_I64)
        if blocklist.size == 0:
            return BitVector(size)
        adj = np.empty(blocklist.size, bool)
        adj[0] = False
        adj[1:] = blocklist[1:] == blocklist[:-1] + 1
        # block 0 of the list has no carry-in by construction; only true
        # gaps need their first bit cleared after each shift
        first_mask = np.where(adj | (np.arange(blocklist.size) == 0),
                              np.uint32(0xFFFFFFFF),
                              np.uint32(0xFFFFFFFE))
        args = _operand_args(vectors, blocklist)
        pool = _shift_and_chain(len(vectors), jnp.asarray(first_mask),
                                *args)
        res = BitVector._from_parts(
            Structure(blocklist.astype(_I64).copy(),
                      np.full(blocklist.size, C.CLS_BIT, np.uint8)),
            pool, size)
        res._drop_trailing(size)
        res.optimize(C.OPT_FREE_01)
        return res

    # ------------------------------------------------------------------
    # arena path: the Pallas K-way DMA sweep over a combined operand pool
    # (the kernel-level analog of the reference's horizontal evaluation with
    # digest narrowing; see agg/arena.py and ops/pallas_kernels.py)
    # ------------------------------------------------------------------
    def combine_and_sub_arena(self, arena, and_idx, sub_idx=()) -> BitVector:
        """AND-SUB over vectors addressed by index into an OperandArena.
        Streams each needed block exactly once through the Pallas sweep
        kernel with all-zero early exit."""
        from ..ops import pallas_kernels as pk
        and_idx = list(and_idx)
        sub_idx = list(sub_idx)
        if not and_idx:
            return BitVector(0)
        structs = [arena.vectors[i]._struct for i in and_idx]
        nb = _and_blocklist(structs)
        size = max(arena.vectors[i].size for i in and_idx + sub_idx)
        if nb.size == 0:
            return BitVector(size)
        # FULL SUB operand kills the block (kernel identity for a missing
        # SUB row is zero, which would be wrong for FULL)
        keep = np.ones(nb.size, bool)
        for i in sub_idx:
            st, _ = arena.vectors[i]._struct.lookup(nb)
            keep &= st != 1
        nb = nb[keep]
        if nb.size == 0:
            return BitVector(size)
        slots = arena.slots_matrix(and_idx + sub_idx, nb)
        pool = pk.agg_and_sub_pallas(len(and_idx), len(sub_idx),
                                     jnp.asarray(slots), arena.pool)
        cls = np.full(nb.size, C.CLS_BIT, np.uint8)
        return BitVector._from_parts(Structure(nb.copy(), cls), pool, size)

    # ------------------------------------------------------------------
    # pipeline (reference aggregator::pipeline, src/bmaggregator.h:223):
    # batch many AND-SUB searches with shared block cache.
    # ------------------------------------------------------------------
    def pipeline(self, requests, options: AggOptions = AggOptions()):
        """Run a batch of (and_group, sub_group) AND-SUB searches.

        Returns a list of per-request results: BitVectors (make_results) and/
        or counts (compute_counts).  Counts-only batches run as ONE fused
        Pallas sweep with the request batch resident in VMEM (the operand
        arena streams from HBM once for the whole batch — the reference
        pipeline's shared block cache, src/bmaggregator.h:197, as a kernel);
        result-producing batches fall back to per-request combines with
        XLA-deduplicated gathers."""
        norm = [((*req, ())[:2] if isinstance(req, tuple) else (req, ()))
                for req in requests]
        lim = options.search_count_limit

        def _cap(c):
            return c if lim is None else min(c, lim)

        if (options.compute_counts and not options.make_results
                and options.or_target is None
                and len(norm) > 1 and all(len(a) for a, _ in norm)):
            counts = self._pipeline_counts_fused(norm)
            if counts is not None:
                return [{"count": _cap(int(c))} for c in counts]
        if (options.make_results and options.or_target is None
                and lim is None and len(norm) > 1
                and all(len(a) for a, _ in norm)):
            out = self._pipeline_results_fused(norm, options)
            if out is not None:
                return out
        out = []
        for and_g, sub_g in norm:
            bv = self.combine_and_sub(and_g, sub_g)
            if options.or_target is not None:
                options.or_target.bit_or(bv)
            entry = {}
            if options.make_results:
                entry["bv"] = bv
            if options.compute_counts:
                entry["count"] = _cap(bv.count())
            out.append(entry)
        return out

    # device-memory budget for the fused result-mode output [V, nb, 2048]
    _PIPE_RESULT_BUDGET_BYTES = 1 << 30

    def _pipeline_results_fused(self, norm, options):
        """Result-producing pipeline in ONE device pass (reference
        agg_run_options result mode, src/bmaggregator.h:65-103): the shared
        operand arena streams once; every request's AND-SUB bitmap comes
        back as one [V, nb_union, 2048] array whose per-request slices back
        the result BitVectors without copies.  Returns None when the fused
        path does not apply (no payload, or output over budget)."""
        from .arena import (OperandArena, build_dense_stack,
                            build_dense_stack_host, narrowed_union,
                            operands_succinct)
        operands = []
        index_of = {}
        for and_g, sub_g in norm:
            for v in (*and_g, *sub_g):
                if id(v) not in index_of:
                    index_of[id(v)] = len(operands)
                    operands.append(v)
        for v in operands:
            v._flush()
        V = len(norm)
        sels = np.zeros((V, len(operands)), np.int32)
        forced_zero = np.zeros(V, bool)
        for i, (and_g, sub_g) in enumerate(norm):
            for v in and_g:
                sels[i, index_of[id(v)]] = 1
            for v in sub_g:
                k = index_of[id(v)]
                if sels[i, k] == 1:
                    forced_zero[i] = True
                sels[i, k] = -1
        if operands_succinct(operands):
            # survivor-narrowed: only blocks some request can hit get
            # expanded (host-side); memory O(survivors), not O(union)
            nb_union, n_u = narrowed_union(operands, sels)
            if n_u == 0:
                return None
            if V * nb_union.size * C.SET_BLOCK_SIZE * 4 \
                    > self._PIPE_RESULT_BUDGET_BYTES:
                return None
            planes = (jnp.asarray(build_dense_stack_host(
                operands, nb_union)) if nb_union.size else None)
            if planes is None:
                size = max(v.size for v in operands)
                return [dict(
                    **({"bv": BitVector(size)} if options.make_results
                       else {}),
                    **({"count": 0} if options.compute_counts else {}))
                    for _ in range(V)]
        else:
            planes = build_dense_stack(OperandArena(operands))
            if planes is None:
                return None
            nb_union = np.unique(np.concatenate(
                [v._flat_nb() for v in operands]))
            if V * nb_union.size * C.SET_BLOCK_SIZE * 4 \
                    > self._PIPE_RESULT_BUDGET_BYTES:
                return None
        rows, counts_blk = _pipeline_results_kernel(planes,
                                                    jnp.asarray(sels))
        counts = np.asarray(counts_blk).astype(np.int64).sum(axis=1)
        size = max(v.size for v in operands)
        out = []
        cls = np.full(nb_union.size, C.CLS_BIT, np.uint8)
        for i in range(V):
            entry = {}
            if forced_zero[i]:
                bv = BitVector(size)
                cnt = 0
            else:
                bv = BitVector._from_parts(
                    Structure(nb_union.copy(), cls.copy()), rows[i], size)
                cnt = int(counts[i])
            if options.make_results:
                entry["bv"] = bv
            if options.compute_counts:
                entry["count"] = cnt
            out.append(entry)
        return out

    def _pipeline_counts_fused(self, norm):
        """Counts for a request batch in one device call, or None when the
        fused path does not apply (no Pallas, empty universe)."""
        from ..config import config
        from ..ops.pallas_kernels import pipeline_counts
        if not config.pallas_enabled():
            return None
        from .arena import (OperandArena, build_dense_stack,
                            build_dense_stack_host, narrowed_union,
                            operands_succinct)
        operands = []
        index_of = {}
        for and_g, sub_g in norm:
            for v in (*and_g, *sub_g):
                if id(v) not in index_of:
                    index_of[id(v)] = len(operands)
                    operands.append(v)
        for v in operands:
            v._flush()
        sels = np.zeros((len(norm), len(operands)), np.int32)
        forced_zero = np.zeros(len(norm), bool)
        for i, (and_g, sub_g) in enumerate(norm):
            for v in and_g:
                sels[i, index_of[id(v)]] = 1
            for v in sub_g:
                k = index_of[id(v)]
                if sels[i, k] == 1:
                    # same vector ANDed and subtracted: x & ~x == 0 —
                    # the selector can hold only one role per operand
                    forced_zero[i] = True
                sels[i, k] = -1
        if operands_succinct(operands):
            nb_sel, n_u = narrowed_union(operands, sels)
            if n_u == 0:
                return None
            if nb_sel.size == 0:
                return np.zeros(len(norm), np.int64)
            planes = jnp.asarray(build_dense_stack_host(operands, nb_sel))
        else:
            planes = build_dense_stack(OperandArena(operands))
            if planes is None:
                return None
        counts = np.array(pipeline_counts(planes, jnp.asarray(sels)))
        counts[forced_zero] = 0
        return counts


def _optimized(fn):
    """Honor set_optimization() on combine_* targets (reference
    aggregator set_optimization)."""
    @functools.wraps(fn)
    def wrap(self, *a, **kw):
        return self._maybe_optimize(fn(self, *a, **kw))
    return wrap


def _range_hinted(fn):
    """Enforce the range hint on the combine_and_sub result regardless of
    internal path (the succinct run-domain fold ignores the block-list
    narrowing).  One-block hints are BIT-precise, matching the reference's
    gap_init_range_block filter (src/bmaggregator.h:974-987, 2006-2011);
    wider hints stay block-granular like the reference."""
    @functools.wraps(fn)
    def wrap(self, *a, **kw):
        out = fn(self, *a, **kw)
        rh = self._range_hint
        if rh is not None and isinstance(out, BitVector) and out.size:
            lo, hi = rh
            blo, bhi = lo >> C.SET_BLOCK_SHIFT, hi >> C.SET_BLOCK_SHIFT
            if blo == bhi:
                lo2, hi2 = lo, min(hi, out.size - 1)
            else:
                lo2 = blo << C.SET_BLOCK_SHIFT
                hi2 = min(((bhi + 1) << C.SET_BLOCK_SHIFT) - 1, out.size - 1)
            if hi2 < lo2:
                out.clear()
            else:
                out.keep_range(lo2, hi2)
        return out
    return wrap


Aggregator.combine_and_sub = _range_hinted(Aggregator.combine_and_sub)

for _n in ("combine_or", "combine_and", "combine_and_sub",
           "combine_shift_right_and"):
    setattr(Aggregator, _n, _optimized(getattr(Aggregator, _n)))

# Reference C-style "horizontal" entry points (src/bmaggregator.h:2216+).
# The horizontal/vertical split is a CPU cache-blocking evaluation-order
# detail; the fused TPU pass computes the same result either way.
Aggregator.combine_or_horizontal = Aggregator.combine_or
Aggregator.combine_and_horizontal = Aggregator.combine_and
Aggregator.combine_and_sub_horizontal = Aggregator.combine_and_sub


@jax.jit
def _pipeline_results_kernel(planes, sels):
    """planes: uint32[K, nb, 2048]; sels: int32[V, K] (1 AND / -1 AND-NOT /
    0 skip).  Returns (uint32[V, nb, 2048] result bitmaps, int64[V] counts)
    — one fused arena pass for the whole request batch."""
    K = planes.shape[0]

    def per_request(sel):
        acc = jnp.full(planes.shape[1:], jnp.uint32(0xFFFFFFFF))
        for k in range(K):
            m = sel[k]
            term = jnp.where(m == 1, planes[k],
                             jnp.where(m == -1, ~planes[k],
                                       jnp.uint32(0xFFFFFFFF)))
            acc = acc & term
        # per-block int32 partials; the (possibly >2^31) total is host math
        cnt = jnp.sum(jax.lax.population_count(acc).astype(jnp.int32),
                      axis=1)
        return acc, cnt

    return jax.vmap(per_request)(sels)


def _assemble(nb, full_mask, kern_nb, pool, size):
    """Build the result BitVector from FULL blocks + kernel rows."""
    cls = np.where(full_mask, C.CLS_FULL, C.CLS_BIT).astype(np.uint8)
    if pool is None:
        from ..ops import blockops
        pool = blockops.zero_pool(0)
        # nb may still include FULL entries
        keep = full_mask
        return BitVector._from_parts(
            Structure(nb[keep].copy(), cls[keep].copy()), pool, size)
    return BitVector._from_parts(Structure(nb.copy(), cls), pool, size)


# module-level convenience instance (the reference is also used as a
# stateless engine most of the time)
aggregator = Aggregator()


def aggregator_pipeline_execute(aggregators):
    """Interleaved execution of several staged aggregators (reference
    free function aggregator_pipeline_execute, src/bmaggregator.h:874):
    stage every aggregator, then round-robin run_step until all report
    op_done.  Each aggregator's result is then available via
    get_target()."""
    aggs = list(aggregators)
    for a in aggs:
        a.stage()
    pending = set(range(len(aggs)))
    while pending:
        done = set()
        for k in pending:
            st = aggs[k].run_step()
            if st == OperationStatus.op_done:
                done.add(k)
        pending -= done
    return aggs
