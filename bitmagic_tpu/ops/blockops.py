"""Block-level kernels over dense pools ``uint32[n_blocks, 2048]`` — the
canonical-semantics layer, equivalent in role to the reference's scalar block
kernels in `src/bmfunc.h` (bit_block_and/or/xor/sub + digest, bit_block_count,
count_range, find first/last, shifts, etc.).

Everything here is a pure jnp (XLA) program: on TPU, XLA fuses the elementwise
logical ops with the digest / popcount reductions into single HBM passes.  The
hand-written Pallas variants of the hottest families live in
``pallas_kernels.py``; ``dispatch.py`` selects between them.

Conventions:
  * bit *n* of a block = word ``n >> 5``, in-word bit ``n & 31`` (LSB-first),
    identical to the reference so serialized images match;
  * a *digest* is an ``int32[n, 64]`` 0/1 wave-nonzero mask (the reference
    packs it into one ``bm::id64_t``, src/bmfunc.h:1230; unpacked form is the
    natural TPU layout and packs to u64 only for serialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (ALL_ONES_WORD, BITS_PER_BLOCK, BLOCK_WAVES,
                         SET_BLOCK_SIZE, WAVE_WORDS, WORD_BITS)
from .bitops import popcount

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------
def zero_pool(n):
    return jnp.zeros((n, SET_BLOCK_SIZE), U32)


def full_block_np():
    return np.full((SET_BLOCK_SIZE,), ALL_ONES_WORD, np.uint32)


# ---------------------------------------------------------------------------
# counts & digests (reference bit_block_count src/bmfunc.h:5799,
# calc_block_digest0 src/bmfunc.h:1230)
# ---------------------------------------------------------------------------
@jax.jit
def block_counts(pool):
    """Per-block popcount -> int32[n]."""
    return jnp.sum(popcount(pool).astype(I32), axis=-1)


@jax.jit
def wave_counts(pool):
    """Per-wave popcount -> int32[n, 64]."""
    n = pool.shape[0]
    w = pool.reshape(n, BLOCK_WAVES, WAVE_WORDS)
    return jnp.sum(popcount(w).astype(I32), axis=-1)


@jax.jit
def calc_digest(pool):
    """Wave-nonzero digest -> int32[n, 64] of 0/1."""
    n = pool.shape[0]
    w = pool.reshape(n, BLOCK_WAVES, WAVE_WORDS)
    nz = jnp.any(w != 0, axis=-1)
    return nz.astype(I32)


def pack_digest(digest):
    """int32[n, 64] 0/1 -> uint32[n, 2] packed (lo, hi) halves of the
    reference's 64-bit digest."""
    n = digest.shape[0]
    d = digest.reshape(n, 2, 32).astype(U32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=U32))
    return jnp.sum(d * weights, axis=-1, dtype=U32)


@jax.jit
def is_zero_blocks(pool):
    return ~jnp.any(pool != 0, axis=-1)


@jax.jit
def is_full_blocks(pool):
    return jnp.all(pool == ALL_ONES_WORD, axis=-1)


@jax.jit
def gap_counts(pool):
    """Per-block 'gap count' GC: 1 + number of 01/10 transitions in the
    block's bit string (reference bit_block_calc_change, src/bmfunc.h:5893).
    Used by best_representation / serialization format choice."""
    n = pool.shape[0]
    flat = pool.reshape(n, -1)
    # transitions inside words: popcount(w ^ (w >> 1)) counting 31 pairs
    shifted = (flat >> U32(1)) | (jnp.roll(flat, -1, axis=1) << U32(31))
    # last word of each block: bring in 0 as the "next" bit? Reference counts
    # transitions within the 65536-bit string only: pairs (i, i+1) for
    # i in [0, 65534]; the cross-word carry for the last word must be masked.
    x = flat ^ shifted
    cnt = jnp.sum(popcount(x).astype(I32), axis=-1)
    # subtract the contribution of the top bit of the last word pairing with
    # the rolled-in first word bit
    last_top = (flat[:, -1] >> U32(31)).astype(I32)
    first_bot = (flat[:, 0] & U32(1)).astype(I32)
    cnt = cnt - (last_top ^ first_bot)
    return cnt + 1


def block_counts_np(words: np.ndarray) -> np.ndarray:
    """Host mirror of block_counts (for host-resident pools: no upload)."""
    return np.bitwise_count(words).sum(axis=1, dtype=np.int64)


def gap_counts_np(words: np.ndarray) -> np.ndarray:
    """Host mirror of gap_counts (bit_block_calc_change on numpy)."""
    flat = words.reshape(words.shape[0], -1)
    shifted = (flat >> np.uint32(1)) | (
        np.roll(flat, -1, axis=1) << np.uint32(31))
    x = flat ^ shifted
    cnt = np.bitwise_count(x).sum(axis=1, dtype=np.int64)
    last_top = (flat[:, -1] >> np.uint32(31)).astype(np.int64)
    first_bot = (flat[:, 0] & np.uint32(1)).astype(np.int64)
    return cnt - (last_top ^ first_bot) + 1


# ---------------------------------------------------------------------------
# logical families (reference src/bmfunc.h:7606-9291).  Plain jnp — XLA fuses
# the op with any consumer reduction (digest / popcount) into one pass.
# ---------------------------------------------------------------------------
def and_blocks(a, b):
    return a & b


def or_blocks(a, b):
    return a | b


def xor_blocks(a, b):
    return a ^ b


def sub_blocks(a, b):
    return a & ~b


_OPS = {"and": and_blocks, "or": or_blocks, "xor": xor_blocks, "sub": sub_blocks}


def logical_op(op, a, b):
    return _OPS[op](a, b)


@functools.partial(jax.jit, static_argnums=0)
def logical_op_digest(op, a, b):
    """Fused op + digest (reference bit_block_and_2way returning digest,
    src/bmfunc.h:7824)."""
    out = _OPS[op](a, b)
    return out, calc_digest(out)


@functools.partial(jax.jit, static_argnums=0)
def count_op(op, a, b):
    """Fused per-block popcount of (a OP b) without materializing the result
    (reference bit_operation_*_count family, src/bmfunc.h:8022-9291)."""
    return block_counts(_OPS[op](a, b))


# ---------------------------------------------------------------------------
# range masks.  The range is given pre-split on the HOST as word index +
# in-word bit offset (both fit int32 — global 48-bit bit addresses never
# cross to the device).  XLA fuses the mask construction into the consumer,
# so no 8KB/block materialization happens.
# ---------------------------------------------------------------------------
def range_mask(n_blocks, lo_w, lo_b, hi_w, hi_b):
    """uint32[n_blocks, 2048] with bits [lo, hi] set, where lo = lo_w*32+lo_b
    etc. (word index relative to the pool's first block)."""
    total_words = n_blocks * SET_BLOCK_SIZE
    widx = jax.lax.broadcasted_iota(I32, (total_words,), 0)
    lo_w = jnp.asarray(lo_w, I32)
    hi_w = jnp.asarray(hi_w, I32)
    lo_b = jnp.asarray(lo_b, U32)
    hi_b = jnp.asarray(hi_b, U32)
    full = jnp.where((widx > lo_w) & (widx < hi_w), ALL_ONES_WORD, U32(0))
    lo_mask = ALL_ONES_WORD << lo_b
    hi_mask = jnp.where(hi_b == 31, ALL_ONES_WORD,
                        (U32(1) << (hi_b + U32(1))) - U32(1))
    m = full
    m = jnp.where(widx == lo_w, jnp.where(lo_w == hi_w, lo_mask & hi_mask, lo_mask), m)
    m = jnp.where((widx == hi_w) & (hi_w != lo_w), hi_mask, m)
    m = jnp.where((widx < lo_w) | (widx > hi_w), U32(0), m)
    return m.reshape(n_blocks, SET_BLOCK_SIZE)


def _split_range(lo, hi):
    lo, hi = int(lo), int(hi)
    return (np.int32(lo >> 5), np.uint32(lo & 31),
            np.int32(hi >> 5), np.uint32(hi & 31))


@jax.jit
def _count_range_jit(pool, lo_w, lo_b, hi_w, hi_b):
    m = range_mask(pool.shape[0], lo_w, lo_b, hi_w, hi_b)
    # per-block partials stay int32 (<= 65536); final sum on host if the
    # total could exceed int32 — callers' pools are < 2^31 bits in practice
    return jnp.sum(popcount(pool & m).astype(I32), axis=-1)


def count_range_pool(pool, lo, hi):
    """popcount of bits [lo, hi] of the flattened pool (reference
    bit_block_calc_count_range, src/bmfunc.h:6138, generalized cross-block).
    Returns a host int."""
    per_block = np.asarray(_count_range_jit(pool, *_split_range(lo, hi)))
    return int(per_block.astype(np.int64).sum())


def any_range_pool(pool, lo, hi):
    m = range_mask(pool.shape[0], *_split_range(lo, hi))
    return jnp.any((pool & m) != 0)


def is_all_one_range_pool(pool, lo, hi):
    """reference is_all_one_range (src/bmfunc.h:6049)."""
    m = range_mask(pool.shape[0], *_split_range(lo, hi))
    return jnp.all((pool & m) == m)


# ---------------------------------------------------------------------------
# find first / last (reference bit_find_first src/bmfunc.h:9490,
# bit_find_last :9456, block_find_first_diff :10268)
# ---------------------------------------------------------------------------
@jax.jit
def find_first_in_blocks(pool):
    """Per block: index of first set bit in [0, 65536), or BITS_PER_BLOCK if
    none."""
    n = pool.shape[0]
    nz = pool != 0
    widx = jax.lax.broadcasted_iota(I32, (n, SET_BLOCK_SIZE), 1)
    first_w = jnp.min(jnp.where(nz, widx, SET_BLOCK_SIZE), axis=-1)
    safe_w = jnp.minimum(first_w, SET_BLOCK_SIZE - 1)
    w = jnp.take_along_axis(pool, safe_w[:, None].astype(I32), axis=-1)[:, 0]
    iso = w & (U32(0) - w)
    bit = 31 - jax.lax.clz(iso).astype(I32)
    return jnp.where(first_w == SET_BLOCK_SIZE, I32(BITS_PER_BLOCK),
                     first_w * WORD_BITS + bit)


@jax.jit
def find_last_in_blocks(pool):
    """Per block: index of last set bit, or -1 if none."""
    n = pool.shape[0]
    nz = pool != 0
    widx = jax.lax.broadcasted_iota(I32, (n, SET_BLOCK_SIZE), 1)
    last_w = jnp.max(jnp.where(nz, widx, -1), axis=-1)
    safe_w = jnp.maximum(last_w, 0)
    w = jnp.take_along_axis(pool, safe_w[:, None].astype(I32), axis=-1)[:, 0]
    bit = 31 - jax.lax.clz(w).astype(I32)
    return jnp.where(last_w < 0, I32(-1), last_w * WORD_BITS + bit)


# ---------------------------------------------------------------------------
# per-row 1-bit shifts with cross-word carry (reference
# bit_block_shift_r1_unr src/bmfunc.h:6459, _l1_unr :6559); cross-BLOCK
# carries come in/out through tiny edge-bit vectors so sparse vectors
# shift O(own blocks) with adjacency stitched from host metadata.
# ---------------------------------------------------------------------------
@jax.jit
def shift_rows_up1(pool, carry_bits):
    """PER-ROW shift towards higher bit indices by 1; carry_bits uint32[n]
    (0/1) becomes each row's bit 0.  Cross-block carries are stitched by
    the caller (adjacency is a host-metadata fact, not a pool-layout one:
    consecutive pool rows need not be consecutive blocks)."""
    hi = pool >> U32(31)
    prev = jnp.concatenate([carry_bits[:, None] & U32(1), hi[:, :-1]],
                           axis=1)
    return (pool << U32(1)) | prev


@jax.jit
def shift_rows_down1(pool, carry_bits):
    """PER-ROW shift towards lower bit indices by 1; carry_bits uint32[n]
    (0/1) becomes each row's top bit."""
    lo = pool & U32(1)
    nxt = jnp.concatenate([lo[:, 1:], carry_bits[:, None] & U32(1)],
                          axis=1)
    return (pool >> U32(1)) | (nxt << U32(31))


@jax.jit
def edge_bits(pool):
    """(bottom, top) uint32[n]: each row's bit 0 and bit 65535 — the only
    host-visible data a cross-block shift stitch needs (8 B/block instead
    of fetching the 8 KB rows)."""
    return pool[:, 0] & U32(1), pool[:, -1] >> U32(31)


# ---------------------------------------------------------------------------
# bit unpack / pack (enumerator + import support)
# ---------------------------------------------------------------------------
def unpack_words_to_bits(words):
    """uint32[...] -> uint8[..., 32] little-endian bit expansion."""
    shifts = jnp.arange(32, dtype=U32)
    return ((words[..., None] >> shifts) & U32(1)).astype(jnp.uint8)


def pack_bits_to_words(bits):
    """uint{8,32}[..., 32] 0/1 -> uint32[...] little-endian pack."""
    weights = jnp.uint32(1) << jnp.arange(32, dtype=U32)
    return jnp.sum(bits.astype(U32) * weights, axis=-1, dtype=U32)


# ---------------------------------------------------------------------------
# scatter bulk bit-set (reference bulk import: src/bm.h:2073-2161
# import/import_block; VECT_SET_BLOCK_BITS kernels)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=2)
def scatter_set_bits(rows, bits_in_block, n_blocks):
    """Build a pool from (row, bit) pairs: ``rows`` int[k] = pool row per bit,
    ``bits_in_block`` int[k] in [0, 65536).

    Callers must pass *deduplicated* (row, bit) pairs (bulk import dedupes via
    ``np.unique`` on global bit ids); then each pair contributes a distinct
    power of two exactly once, so a scatter-add is exactly a scatter-OR.
    """
    # pool-row addressing fits int32 (pools are bounded by HBM, far below
    # 2^31 words); global 48-bit bit ids were already reduced on the host
    word_idx = rows.astype(I32) * SET_BLOCK_SIZE + (bits_in_block >> 5).astype(I32)
    bit_val = U32(1) << (bits_in_block & 31).astype(U32)
    flat = jnp.zeros((n_blocks * SET_BLOCK_SIZE,), U32)
    flat = flat.at[word_idx].add(bit_val, mode="drop")
    return flat.reshape(n_blocks, SET_BLOCK_SIZE)
