"""Word-level bit utilities (uint32), the `src/bmutil.h` / low `src/bmfunc.h`
equivalent, expressed as jnp programs usable both inside and outside kernels.

No PDEP/TZCNT on TPU: trailing/leading zero counts come from `lax.clz`, and
in-word select uses a nibble-wise prefix-sum descent (reference scalar
`bm::word_select32`/`word_select64`, src/bmfunc.h:1048-1106, does a similar
popcount descent when BMI2 is unavailable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
_ONE = jnp.uint32(1)


def popcount(w):
    """Per-element population count (any uint dtype)."""
    return jax.lax.population_count(w)


def clz32(w):
    """Count leading zeros of uint32 (32 for zero input)."""
    return jax.lax.clz(w.astype(U32))


def ctz32(w):
    """Count trailing zeros of uint32 (32 for zero input).

    ctz(w) = 31 - clz(w & -w) for nonzero w (reference count_trailing_zeros,
    src/bmutil.h:190).
    """
    w = w.astype(U32)
    iso = w & (jnp.uint32(0) - w)          # isolate lowest set bit
    return jnp.where(w == 0, jnp.int32(32), 31 - clz32(iso).astype(jnp.int32))


def bit_scan_forward32(w):
    """Index of lowest set bit (undefined semantics for 0 -> returns 32)."""
    return ctz32(w)


def bit_scan_reverse32(w):
    """Index of highest set bit (reference bmutil.h:305)."""
    return 31 - clz32(w).astype(jnp.int32)


def word_select32(w, rank):
    """In-word select: position of the ``rank``-th (1-based) set bit of a
    uint32 word.  Reference: bm::word_select32 (src/bmfunc.h:1075).

    Vectorized nibble descent: 8 nibbles x 4 bits; prefix popcounts over
    nibbles find the nibble, then a 4-step scan finds the bit.  Works on
    arrays of words/ranks elementwise.
    """
    w = w.astype(U32)
    rank = rank.astype(jnp.int32)
    # popcount of each half/quarter via masking
    pos = jnp.zeros_like(rank)
    r = rank
    cur = w
    # binary descent over 16/8/4/2/1 bit halves
    for width in (16, 8, 4, 2, 1):
        mask = jnp.uint32((1 << width) - 1)
        lo = cur & mask
        c = popcount(lo).astype(jnp.int32)
        go_hi = r > c
        r = jnp.where(go_hi, r - c, r)
        pos = pos + jnp.where(go_hi, width, 0)
        cur = jnp.where(go_hi, cur >> jnp.uint32(width), lo)
    return pos


def parity(w):
    return popcount(w) & 1


def gap_mask(n_bits):
    """Low-bit mask of n_bits (n_bits in [0, 32])."""
    n = jnp.asarray(n_bits, jnp.uint32)
    return jnp.where(n >= 32, jnp.uint32(0xFFFFFFFF),
                     (_ONE << n) - _ONE)
