"""Hand-written Pallas TPU kernels for the hot block-op families.

These are the TPU-native equivalents of the reference's SIMD backend zoo
(src/bmsse4.h / bmavx2.h / bmavx512.h behind the 52 VECT_* hooks,
src/bmavx2.h:3432-3586).  The jnp/XLA paths in blockops.py are the canonical
semantics; these kernels add what XLA cannot express:

  * fused logical op + digest production in one VMEM pass
    (VECT_AND_DIGEST_2WAY family),
  * the K-way aggregator sweep with **data-dependent early exit**: per block,
    operand rows are streamed HBM->VMEM with manual double-buffered DMA, and
    as soon as the AND accumulator hits zero the remaining loads are skipped
    — the digest-narrowing compute-avoidance of the reference aggregator
    (src/bmaggregator.h:1764, bit_block_and_5way digest cascades) expressed
    as conditional DMA.

Pools are uint32[n_rows, 2048]; one block row = 2048 lanes = 16x(8,128)
tiles.  On non-TPU hosts the kernels run in interpret mode (used by tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import config

U32 = jnp.uint32
BLOCK_TILE = 8          # block rows per grid cell for elementwise kernels


def _interpret():
    return config.interpret_mode()


# ---------------------------------------------------------------------------
# fused 2-way logical op + digest (VECT_AND_DIGEST_2WAY etc.)
# ---------------------------------------------------------------------------
def _logical_digest_body(op):
    def kernel(a_ref, b_ref, out_ref, dig_ref):
        a = a_ref[...]
        b = b_ref[...]
        if op == "and":
            r = a & b
        elif op == "or":
            r = a | b
        elif op == "xor":
            r = a ^ b
        else:
            r = a & ~b
        out_ref[...] = r
        # digest via a tiny MXU matmul: nonzero-word flags [tile, 2048] @
        # wave-selector [2048, 64] -> per-wave nonzero counts (3D reshape
        # reductions don't lower well in Mosaic; this does, and rides the MXU)
        nz = (r != 0).astype(jnp.float32)
        sel = (jax.lax.broadcasted_iota(
            jnp.int32, (C.SET_BLOCK_SIZE, C.BLOCK_WAVES), 0) // C.WAVE_WORDS
            == jax.lax.broadcasted_iota(
                jnp.int32, (C.SET_BLOCK_SIZE, C.BLOCK_WAVES), 1)
        ).astype(jnp.float32)
        counts = jnp.dot(nz, sel, preferred_element_type=jnp.float32)
        dig_ref[...] = (counts > 0).astype(jnp.int32)
    return kernel


@functools.partial(jax.jit, static_argnums=0)
def logical_op_digest_pallas(op, a, b):
    """(a OP b, wave-digest) in ONE HBM pass (reference bit_block_and_2way
    returning digest, src/bmfunc.h:7824)."""
    n = a.shape[0]
    if n == 0:
        return a, jnp.zeros((0, C.BLOCK_WAVES), jnp.int32)
    grid = (pl.cdiv(n, BLOCK_TILE),)
    bs = lambda: pl.BlockSpec((BLOCK_TILE, C.SET_BLOCK_SIZE),
                              lambda i: (i, 0), memory_space=pltpu.VMEM)
    dig_bs = pl.BlockSpec((BLOCK_TILE, C.BLOCK_WAVES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out, dig = pl.pallas_call(
        _logical_digest_body(op),
        grid=grid,
        in_specs=[bs(), bs()],
        out_specs=[bs(), dig_bs],
        out_shape=[jax.ShapeDtypeStruct(a.shape, U32),
                   jax.ShapeDtypeStruct((n, C.BLOCK_WAVES), jnp.int32)],
        interpret=_interpret(),
    )(a, b)
    return out, dig


# ---------------------------------------------------------------------------
# per-block popcount (VECT_BITCOUNT) and fused op-count (VECT_BITCOUNT_AND...)
# ---------------------------------------------------------------------------
def _count_body(op):
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]
        b = b_ref[...]
        if op == "and":
            r = a & b
        elif op == "or":
            r = a | b
        elif op == "xor":
            r = a ^ b
        else:
            r = a & ~b
        out_ref[...] = jnp.sum(
            jax.lax.population_count(r).astype(jnp.int32), axis=1,
            keepdims=True)
    return kernel


@functools.partial(jax.jit, static_argnums=0)
def count_op_pallas(op, a, b):
    """Per-block popcount of (a OP b) without materializing the result
    (reference bit_operation_and_count family, src/bmfunc.h:8022)."""
    n = a.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    grid = (pl.cdiv(n, BLOCK_TILE),)
    bs = lambda: pl.BlockSpec((BLOCK_TILE, C.SET_BLOCK_SIZE),
                              lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _count_body(op),
        grid=grid,
        in_specs=[bs(), bs()],
        out_specs=pl.BlockSpec((BLOCK_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=_interpret(),
    )(a, b)
    return out[:, 0]


def _popcount_body(a_ref, out_ref):
    out_ref[...] = jnp.sum(
        jax.lax.population_count(a_ref[...]).astype(jnp.int32), axis=1,
        keepdims=True)


@jax.jit
def block_counts_pallas(a):
    n = a.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    out = pl.pallas_call(
        _popcount_body,
        grid=(pl.cdiv(n, BLOCK_TILE),),
        in_specs=[pl.BlockSpec((BLOCK_TILE, C.SET_BLOCK_SIZE),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=_interpret(),
    )(a)
    return out[:, 0]


# ---------------------------------------------------------------------------
# K-way aggregator sweep with early exit (the reference's
# combine_and_sub/process_bit_blocks_* digest cascade, src/bmaggregator.h)
# ---------------------------------------------------------------------------
_AGG_COLS = 8      # block columns per grid cell (>= min sublane tile)


def _agg_sweep_body(n_and, n_sub):
    """Kernel: process 8 block columns per grid cell.  For each operand k,
    the 8 columns' rows are streamed out of the combined HBM pool by slot id
    (scalar-prefetched) with double-buffered DMA (prefetch k+1 while folding
    k), AND/AND-NOT'ed full-width into the VMEM accumulator; once the whole
    accumulator is zero the remaining operand loads are skipped (the
    golden-block early exit of the reference aggregator)."""
    K = n_and + n_sub
    # block rows are viewed as (8, 256) tiles: a whole tile is the DMA unit,
    # which satisfies Mosaic's 8-sublane slice alignment for both the HBM
    # source row and the VMEM destination
    TILE = (8, C.SET_BLOCK_SIZE // 8)

    def kernel(slots_ref, pool_hbm, out_ref, acc_ref, buf_ref, sem):
        i = pl.program_id(0)
        acc_ref[...] = jnp.full((_AGG_COLS,) + TILE, 0xFFFFFFFF, U32)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (_AGG_COLS,) + TILE, 0)

        def copies(k, parity):
            cps = []
            for j in range(_AGG_COLS):           # static unroll: 8 DMAs
                slot = jnp.maximum(slots_ref[k, i * _AGG_COLS + j], 0)
                cps.append(pltpu.make_async_copy(
                    pool_hbm.at[slot],
                    buf_ref.at[parity, j],
                    sem.at[parity, j]))
            return cps

        def issue(k, parity):
            for cp in copies(k, parity):
                cp.start()

        def wait(k, parity):
            for cp in copies(k, parity):
                cp.wait()

        issue(0, 0)

        def step(k, alive):
            parity = k % 2

            @pl.when(alive & (k + 1 < K))
            def _():
                issue(k + 1, (k + 1) % 2)

            @pl.when(alive)
            def _():
                wait(k, parity)
                rows = buf_ref[parity]
                # per-column validity mask (slot -1 = identity operand)
                valid = jnp.zeros((_AGG_COLS,) + TILE, jnp.int32)
                for j in range(_AGG_COLS):
                    vj = (slots_ref[k, i * _AGG_COLS + j] >= 0).astype(jnp.int32)
                    valid = jnp.where(row_iota == j, vj, valid)
                is_and = k < n_and
                ident = jnp.where(is_and, U32(0xFFFFFFFF), U32(0))
                rows = jnp.where(valid == 1, rows, ident)
                acc_ref[...] = jnp.where(is_and, acc_ref[...] & rows,
                                         acc_ref[...] & ~rows)

            nz = jnp.sum((acc_ref[...] != 0).astype(jnp.int32))
            return alive & (nz > 0)

        jax.lax.fori_loop(0, K, step, jnp.bool_(True))
        out_ref[...] = acc_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1))
def _agg_and_sub_call(n_and, n_sub, slots_padded, pool):
    K, n_cols = slots_padded.shape
    tile_h = C.SET_BLOCK_SIZE // 8
    pool3 = pool.reshape(pool.shape[0], 8, tile_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cols // _AGG_COLS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_AGG_COLS, 8, tile_h),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_AGG_COLS, 8, tile_h), U32),
            pltpu.VMEM((2, _AGG_COLS, 8, tile_h), U32),
            pltpu.SemaphoreType.DMA((2, _AGG_COLS)),
        ],
    )
    out = pl.pallas_call(
        _agg_sweep_body(n_and, n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cols, 8, tile_h), U32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(2 * 1024 * 1024)),
    )(slots_padded.astype(jnp.int32), pool3)
    return out.reshape(n_cols, C.SET_BLOCK_SIZE)


def agg_and_sub_pallas(n_and, n_sub, slots, pool):
    """AND(rows of the first n_and slot lists) & ~OR(rows of the next n_sub)
    over a combined pool.

    slots: int32[n_and+n_sub, n_blocks]; slot -1 = identity for that operand
    (FULL for AND side, ZERO for SUB side — resolved by the host planner).
    pool: uint32[n_rows, 2048] (combined arena of all operand pools).
    Returns uint32[n_blocks, 2048].
    """
    K, n_blocks = slots.shape
    assert K == n_and + n_sub
    if n_blocks == 0:
        return jnp.zeros((0, C.SET_BLOCK_SIZE), U32)
    n_cols = -(-n_blocks // _AGG_COLS) * _AGG_COLS
    if n_cols != n_blocks:
        slots = jnp.concatenate(
            [jnp.asarray(slots, jnp.int32),
             jnp.full((K, n_cols - n_blocks), -1, jnp.int32)], axis=1)
    out = _agg_and_sub_call(n_and, n_sub, slots, pool)
    return out[:n_blocks]


# ---------------------------------------------------------------------------
# fused bit-sliced equality scan (scanner find_eq over a plane arena):
# value decomposition is done in-kernel from a scalar (VECT-style fusion of
# prepare_and_sub_aggregator + combine_and_sub, src/bmsparsevec_algo.h:2286)
# ---------------------------------------------------------------------------
def _scan_eq_body(n_planes):
    def kernel(value_ref, planes_ref, out_ref):
        value = value_ref[0]
        acc = jnp.full(out_ref.shape, 0xFFFFFFFF, U32)
        for s in range(n_planes):
            bit = (value >> np.uint32(s)) & np.uint32(1)
            p = planes_ref[s]
            acc = jnp.where(bit == 1, acc & p, acc & ~p)
        out_ref[...] = acc
    return kernel


@functools.partial(jax.jit, static_argnums=0)
def scan_eq_pallas(n_planes, planes, value):
    """planes uint32[n_planes, n_blocks, 2048] (aligned plane arena), value
    scalar -> hit mask uint32[n_blocks, 2048] in one pass."""
    _, n_blocks, _ = planes.shape
    cols = _AGG_COLS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(n_blocks, cols),),
        in_specs=[pl.BlockSpec((n_planes, cols, C.SET_BLOCK_SIZE),
                               lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cols, C.SET_BLOCK_SIZE), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scan_eq_body(n_planes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, C.SET_BLOCK_SIZE), U32),
        interpret=_interpret(),
    )(jnp.asarray([value], U32), planes)


# ---------------------------------------------------------------------------
# batched scanner pipeline: counts for MANY values in one device call
# (reference scanner/aggregator pipeline, src/bmsparsevec_algo.h:653).
#
# Key: the VALUE batch is a resident VMEM *vector* dimension — each grid
# step loads one column of plane blocks ONCE and applies it to every value
# (arena read ONCE total), all as [V, …] vector ops.  An earlier variant
# that walked values as scalar items hit a Mosaic scalar-path
# serialization; keeping V vectorized avoids it.  HBM traffic drops from
# V x arena (the lax.map fallback below) to 1 x arena.
# ---------------------------------------------------------------------------
# tiling (VMEM budget bound; measured on v5e): 2 block columns x 128
# value rows; fewer kernel calls beat larger per-call tiles because
# dispatch RTT dominates on the tunneled chip.
# Negative results (round 3, measured through the production path on-chip
# at the bench-4b shape): a loop-interchanged variant walking V in 8/16/32-
# value sub-tiles inside the kernel (hoping Mosaic keeps the small acc in
# vector registers across the unrolled plane loop) measured within noise
# of this kernel (-3%..+9%) — the acc spills to VMEM either way, and the
# kernel stays VMEM-traffic-bound at ~2 full-size passes per (value,
# plane).  Standalone pallas_call compiles of the same body can OOM the
# 16 MB scoped-vmem limit even though the production jit compiles fine.
_PIPE_TILING = {False: (2, 128), True: (2, 128)}


def _pipeline_counts_body(S, V, cols, has_skip):
    def kernel(sel_ref, planes_ref, out_ref):
        acc = jnp.full((V, cols, 16, 128), 0xFFFFFFFF, U32)
        for s in range(S):
            p = planes_ref[s][None]                  # [1, cols, 16, 128]
            selv = sel_ref[:, s][:, None, None, None]
            if has_skip:
                # tri-state select (1/-1/0): double-where form — the
                # 3-op polarity variant measured slower AND blew the
                # VMEM budget at this tile
                acc = jnp.where(selv == 1, acc & p,
                                jnp.where(selv == -1, acc & ~p, acc))
            else:
                # polarity mask: the select runs at [V,1,1,1] and the
                # full-size work is XOR+AND (2 ops/plane) — measured
                # ~20% over the double-where form on skip-free batches
                inv = jnp.where(selv == -1, U32(0xFFFFFFFF), U32(0))
                acc &= p ^ inv
        counts = jnp.sum(
            jax.lax.population_count(acc).astype(jnp.int32), axis=(1, 2))

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[...] += counts
    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def _pipeline_counts_call(S, nb_pad, planes, has_skip, selectors):
    cols = _PIPE_TILING[has_skip][0]
    V = selectors.shape[0]
    planes4 = planes.reshape(S, nb_pad, 16, 128)
    lanes = pl.pallas_call(
        _pipeline_counts_body(S, V, cols, has_skip),
        grid=(nb_pad // cols,),
        in_specs=[
            pl.BlockSpec((V, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, cols, 16, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((V, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 128), jnp.int32),
        interpret=_interpret(),
    )(selectors, planes4)
    return jnp.sum(lanes, axis=1)


@jax.jit
def _pipeline_counts_map(planes, selectors):
    """XLA fallback: lax.map over values (V x arena HBM traffic)."""
    S = planes.shape[0]

    def one(selv):
        def body(s, acc):
            p = planes[s]
            acc = jnp.where(selv[s] == 1, acc & p, acc)
            acc = jnp.where(selv[s] == -1, acc & ~p, acc)
            return acc
        # all-ones init derived from planes so the carry keeps the same
        # varying axes under shard_map (a plain constant would not)
        acc = jax.lax.fori_loop(0, S, body, planes[0] | ~planes[0])
        # int32 per the device convention (x64 stays off); callers needing
        # >2^31 totals sum per-block partials on host
        return jnp.sum(jax.lax.population_count(acc).astype(jnp.int32))

    return jax.lax.map(one, selectors)


def pipeline_counts(planes, selectors):
    """planes: uint32[S, n_blocks, 2048] (plane arena); selectors:
    int32[V, S] with 1=AND, -1=AND-NOT, 0=skip per (value, slice).
    Returns int32/int64[V] hit counts per value."""
    if not config.pallas_enabled():
        return _pipeline_counts_map(planes, selectors)
    S, nb, _ = planes.shape
    V = selectors.shape[0]
    try:
        has_skip = bool((np.asarray(selectors) == 0).any())
    except Exception:                 # traced selectors: be conservative
        has_skip = True
    cols, vtile = _PIPE_TILING[has_skip]
    nb_pad = ((nb + cols - 1) // cols) * cols
    if nb_pad != nb:
        # zero-pad the block axis: every selector row has >= 1 AND plane,
        # so a zero block contributes 0 hits
        planes = jnp.concatenate(
            [planes, jnp.zeros((S, nb_pad - nb, C.SET_BLOCK_SIZE), U32)],
            axis=1)
    out = []
    for v0 in range(0, V, vtile):
        sel = selectors[v0:v0 + vtile]
        vp = ((sel.shape[0] + 7) // 8) * 8
        if vp != sel.shape[0]:
            sel = jnp.concatenate(
                [sel, jnp.zeros((vp - sel.shape[0], S), sel.dtype)], axis=0)
        out.append(_pipeline_counts_call(S, nb_pad, planes, has_skip,
                                         sel)[:min(vtile, V - v0)])
    return jnp.concatenate(out) if len(out) > 1 else out[0]
