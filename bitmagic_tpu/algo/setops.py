"""Set-algebra free functions over BitVectors without materializing results.

Equivalents of `src/bmalgo.h:49-165` (count_and/or/xor/sub, any_*) and the
batched distance pipeline of `src/bmalgo_impl.h:57-600`
(distance_metric_descriptor / distance_operation): N metrics computed in ONE
pass over aligned block pairs.  On TPU a "pass" is a single fused XLA program
over the gathered operand rows — all requested metrics share the same HBM
reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..core.blocks import gather_operand, operand_args
from ..core.bitvector import BitVector

_I32 = jnp.int32

# distance metric codes (reference distance_metric enum,
# src/bmalgo_impl.h:60-76)
COUNT_AND = "count_and"
COUNT_XOR = "count_xor"
COUNT_OR = "count_or"
COUNT_SUB_AB = "count_sub_ab"
COUNT_SUB_BA = "count_sub_ba"
COUNT_A = "count_a"
COUNT_B = "count_b"

_METRICS = (COUNT_AND, COUNT_XOR, COUNT_OR, COUNT_SUB_AB, COUNT_SUB_BA,
            COUNT_A, COUNT_B)


@functools.partial(jax.jit, static_argnums=0)
def _metric_kernel(metrics, pa, a_slot, a_full, a_aux, a_aux_slot,
                   pb, b_slot, b_full, b_aux, b_aux_slot):
    """One fused pass computing all requested popcount metrics over aligned
    operand rows (the TPU analog of combine_count_operation_with_block,
    src/bmalgo_impl.h:406)."""
    a = gather_operand(pa, a_slot, a_full, a_aux, a_aux_slot)
    b = gather_operand(pb, b_slot, b_full, b_aux, b_aux_slot)
    # per-block int32 partials; the (possibly >2^31) total is host math
    pc = lambda x: jnp.sum(jax.lax.population_count(x).astype(_I32), axis=-1)
    out = []
    for m in metrics:
        if m == COUNT_AND:
            out.append(pc(a & b))
        elif m == COUNT_XOR:
            out.append(pc(a ^ b))
        elif m == COUNT_OR:
            out.append(pc(a | b))
        elif m == COUNT_SUB_AB:
            out.append(pc(a & ~b))
        elif m == COUNT_SUB_BA:
            out.append(pc(b & ~a))
        elif m == COUNT_A:
            out.append(pc(a))
        elif m == COUNT_B:
            out.append(pc(b))
        else:
            raise ValueError(m)
    return jnp.stack(out)


def distance_operation(a: BitVector, b: BitVector, metrics) -> dict:
    """Compute a batch of distance metrics in one pass (reference
    distance_operation, src/bmalgo_impl.h:447)."""
    for m in metrics:
        if m not in _METRICS:
            raise ValueError(f"unknown metric {m}")
    a._flush()
    b._flush()
    # align on the union of allocated blocks (any metric may need any block);
    # FULL/FULL and FULL/ZERO pairs resolve symbolically on host, only rows
    # where at least one side is a BIT row hit the device.
    cand = np.union1d(a._struct.nb, b._struct.nb)
    st_a, _ = a._struct.lookup(cand)
    st_b, _ = b._struct.lookup(cand)
    # symbolic blocks: both sides ZERO or FULL (BIT and GAP rows need data)
    sym = (st_a <= 1) & (st_b <= 1)
    sym_counts = {m: 0 for m in metrics}
    n_ff = int(((st_a == 1) & (st_b == 1) & sym).sum())
    n_fz = int(((st_a == 1) & (st_b == 0) & sym).sum())
    n_zf = int(((st_a == 0) & (st_b == 1) & sym).sum())
    # FULL-run coverage outside any allocated point block resolves by pure
    # interval arithmetic (point blocks inside the other side's runs are in
    # ``cand`` and see state FULL via lookup; runs are disjoint from nb)
    if a._struct.has_runs or b._struct.has_runs:
        from ..core.blocks import (runs_diff, runs_intersect,
                                   runs_subtract_points, runs_total)
        ra, rb = a._struct.runs, b._struct.runs
        n_ff += runs_total(runs_intersect(ra, rb))
        n_fz += runs_total(runs_subtract_points(runs_diff(ra, rb),
                                                b._struct.nb))
        n_zf += runs_total(runs_subtract_points(runs_diff(rb, ra),
                                                a._struct.nb))
    BB = C.BITS_PER_BLOCK
    table = {
        COUNT_AND: n_ff * BB,
        COUNT_OR: (n_ff + n_fz + n_zf) * BB,
        COUNT_XOR: (n_fz + n_zf) * BB,
        COUNT_SUB_AB: n_fz * BB,
        COUNT_SUB_BA: n_zf * BB,
        COUNT_A: (n_ff + n_fz) * BB,
        COUNT_B: (n_ff + n_zf) * BB,
    }
    for m in metrics:
        sym_counts[m] = table[m]
    # run-domain part: pairs where neither side is a dense row compute on
    # the host from run boundaries (gap_metric_counts — the gap_* count
    # kernels of src/bmfunc.h:4946+); symbolic FULL/ZERO sides join as
    # synthetic 1-run blocks
    vals = np.zeros(len(metrics), np.int64)
    kern = ~sym
    gap_elig = kern & (st_a != 2) & (st_b != 2)
    if gap_elig.any():
        from ..core.gapstore import const_extended, gap_metric_counts
        ext_a, za, fa = const_extended(a._gaps)
        ext_b, zb, fb = const_extended(b._gaps)
        st_ae, sl_ae = a._struct.lookup(cand[gap_elig])
        st_be, sl_be = b._struct.lookup(cand[gap_elig])
        sel_a = np.where(st_ae == 3, sl_ae, np.where(st_ae == 1, fa, za))
        sel_b = np.where(st_be == 3, sl_be, np.where(st_be == 1, fb, zb))
        mc = gap_metric_counts(ext_a, sel_a, ext_b, sel_b)
        name = {COUNT_AND: "and_", COUNT_OR: "or_", COUNT_XOR: "xor_",
                COUNT_SUB_AB: "sub_ab", COUNT_SUB_BA: "sub_ba",
                COUNT_A: "a_", COUNT_B: "b_"}
        for i, m in enumerate(metrics):
            vals[i] += int(mc[name[m]].sum())
        kern = kern & ~gap_elig
    # device part: rows where at least one side is a dense BIT row
    if kern.any():
        per_block = np.asarray(_metric_kernel(
            tuple(metrics),
            *operand_args(a, cand[kern]), *operand_args(b, cand[kern])))
        vals += per_block.astype(np.int64).sum(axis=1)
    return {m: int(v) + sym_counts[m] for m, v in zip(metrics, vals)}


def count_and(a, b):
    """popcount(a & b) without materializing (src/bmalgo.h:49)."""
    return distance_operation(a, b, [COUNT_AND])[COUNT_AND]


def count_or(a, b):
    return distance_operation(a, b, [COUNT_OR])[COUNT_OR]


def count_xor(a, b):
    return distance_operation(a, b, [COUNT_XOR])[COUNT_XOR]


def count_sub(a, b):
    return distance_operation(a, b, [COUNT_SUB_AB])[COUNT_SUB_AB]


def any_and(a, b):
    """Lazy short-circuit: any bit in a & b (src/bmalgo.h:106)."""
    return count_and(a, b) > 0


def any_or(a, b):
    return count_or(a, b) > 0


def any_xor(a, b):
    return count_xor(a, b) > 0


def any_sub(a, b):
    return count_sub(a, b) > 0


# ---------------------------------------------------------------------------
# similarity batches (reference bmalgo_similarity.h): all-pairs metric
# matrices over groups of vectors.
# ---------------------------------------------------------------------------
def similarity_batch(vectors, metric=COUNT_AND) -> np.ndarray:
    """All-pairs similarity matrix over a vector group (reference
    similarity_batch + build_similarity_batch, src/bmalgo_similarity.h:85+).
    Returns an [n, n] int64 matrix; diagonal = count of each vector."""
    n = len(vectors)
    out = np.zeros((n, n), np.int64)
    for i in range(n):
        out[i, i] = vectors[i].count()
        for j in range(i + 1, n):
            v = distance_operation(vectors[i], vectors[j], [metric])[metric]
            out[i, j] = out[j, i] = v
    return out


def distance_and_operation(a: BitVector, b: BitVector) -> int:
    """AND-distance shortcut (reference distance_and_operation,
    src/bmalgo_impl.h:853) — the one-metric fast path of
    distance_operation."""
    return distance_operation(a, b, [COUNT_AND])[COUNT_AND]


# ---------------------------------------------------------------------------
# combine family: bvector vs integer-sequence set algebra (reference
# src/bmalgo_impl.h:1080-1423).  The reference walks the sequence per-block;
# here each combine is ONE bulk host-plan + device scatter (set_many /
# clear_many / flip path), which is the batch the TPU wants anyway.
# ---------------------------------------------------------------------------
def combine_or(bv: BitVector, ids):
    """bv |= set(ids) (reference combine_or, src/bmalgo_impl.h:1080)."""
    ids = np.asarray(ids, np.int64)
    if ids.size:
        bv.set_many(np.unique(ids))
    return bv


def combine_xor(bv: BitVector, ids):
    """bv ^= set(ids) (reference combine_xor, src/bmalgo_impl.h:1161)."""
    ids = np.unique(np.asarray(ids, np.int64))
    if not ids.size:
        return bv
    bv._flush()
    present = bv.get_bits(ids)
    if present.any():
        bv.clear_many(ids[present])
    if (~present).any():
        bv.set_many(ids[~present])
    return bv


def combine_sub(bv: BitVector, ids):
    """bv -= set(ids) (reference combine_sub, src/bmalgo_impl.h:1248)."""
    ids = np.asarray(ids, np.int64)
    if ids.size:
        bv.clear_many(np.unique(ids))
    return bv


def combine_and(bv: BitVector, ids):
    """bv &= set(ids) (reference combine_and, src/bmalgo_impl.h:1365)."""
    ids = np.unique(np.asarray(ids, np.int64))
    mask = (BitVector.from_indices(ids, bv.size or C.ID_MAX48)
            if ids.size else BitVector(bv.size or 1))
    bv.bit_and(mask)
    return bv


def combine_and_sorted(bv: BitVector, ids):
    """Sorted-input variant (reference combine_and_sorted,
    src/bmalgo_impl.h:1333); same bulk path, input checked sorted."""
    ids = np.asarray(ids, np.int64)
    if ids.size and (np.diff(ids) < 0).any():
        raise ValueError("combine_and_sorted needs sorted ids")
    return combine_and(bv, ids)


def export_array(bv: BitVector, arr):
    """Import a raw typed array as the bit image of ``bv`` (reference
    export_array, src/bmalgo_impl.h:1423 — despite the name it exports the
    ARRAY into the bvector).  Accepts any 8/16/32/64-bit integer dtype."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype.kind not in "ui":
        raise ValueError("integer array required")
    raw = arr.view(np.uint8)
    pad = (-raw.size) % 4
    if pad:
        raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
    words = raw.view(np.uint32)
    bit_cnt = arr.size * arr.dtype.itemsize * 8
    out = BitVector.from_words(words, size=max(bv.size, bit_cnt))
    if bit_cnt < bv.size:
        out.resize(bv.size)
    bv._flush()
    bv._adopt(out)
    return bv


def bit_import(bv: BitVector, words):
    """Build from a raw dense u32 word image (reference bit_import_u32,
    src/bmbvimport.h:52)."""
    words = np.ascontiguousarray(words, np.uint32)
    out = BitVector.from_words(words, size=max(bv.size, words.size * 32))
    bv._flush()
    bv._adopt(out)
    return bv


def build_similarity_batch(vectors, metric=COUNT_AND):
    """Builder-name alias of similarity_batch (reference
    build_similarity_batch, src/bmalgo_similarity.h:173)."""
    return similarity_batch(vectors, metric)


def distance_operation_any(a: BitVector, b: BitVector, metrics) -> dict:
    """Lazy boolean variant of distance_operation (reference
    distance_operation_any, src/bmalgo_impl.h:922): per requested metric,
    whether the corresponding combined vector has ANY bit — computed with
    the short-circuit any_* block walks, never full counts."""
    out = {}
    for m in metrics:
        if m == COUNT_AND:
            out[m] = any_and(a, b)
        elif m == COUNT_OR:
            out[m] = any_or(a, b)
        elif m == COUNT_XOR:
            out[m] = any_xor(a, b)
        elif m == COUNT_SUB_AB:
            out[m] = any_sub(a, b)
        elif m == COUNT_SUB_BA:
            out[m] = any_sub(b, a)
        elif m == COUNT_A:
            out[m] = a.any()
        elif m == COUNT_B:
            out[m] = b.any()
        else:
            raise ValueError(f"unknown metric {m}")
    return out


def build_jaccard_similarity_batch(sv) -> list:
    """Pairwise Jaccard similarity over the value slices of a sparse
    vector (reference build_jaccard_similarity_batch + similarity_batch
    calculate()/sort(), src/bmalgo_similarity.h:186): for every
    upper-triangular plane pair, one fused (COUNT_AND, COUNT_OR) distance
    pass; returns descriptors (i, j, count_and, count_or, jaccard) sorted
    by descending similarity."""
    planes = [(i, p) for i, p in enumerate(sv.planes) if p is not None]
    out = []
    for x in range(len(planes)):
        i, bi = planes[x]
        for y in range(x + 1, len(planes)):
            j, bj = planes[y]
            d = distance_operation(bi, bj, [COUNT_AND, COUNT_OR])
            c_and, c_or = d[COUNT_AND], d[COUNT_OR]
            jac = (c_and / c_or) if c_or else 0.0
            out.append((i, j, c_and, c_or, jac))
    out.sort(key=lambda t: t[4], reverse=True)
    return out


def bit_import_u32(bv: BitVector, words, size=None, optimize=False):
    """Name-parity front of bit_import (the reference free function
    bit_import_u32, src/bmbvimport.h:46): build bv from a raw dense LE
    u32 word image.  ``size`` clips the import to the first ``size`` bits
    (the reference's bits_size handling for non-word-multiple imports);
    default is 32*len(words)."""
    words = np.ascontiguousarray(words, np.uint32)
    if size is not None:
        n_bits = int(size)
        if n_bits > words.size * 32:
            raise ValueError("size exceeds the provided word image")
        full, rem = divmod(n_bits, 32)
        w = words[:full + (1 if rem else 0)].copy()
        if rem:
            w[-1] &= np.uint32((1 << rem) - 1)
        words = w
    bit_import(bv, words)
    if optimize:
        bv.optimize()
    return bv
