"""Batched in-pool select: rank -> bit position.

The wave-descent formulation (SURVEY.md §7 design decision 4): instead of
gathering the whole 8KB block row per query, descend through a per-block
*wave* popcount prefix table (256 B/row) and gather only the 128 B wave —
a ~64x HBM traffic cut per query.  In-word select is the vectorized binary
popcount descent (bm::word_select32 analog, src/bmfunc.h:1075 — the
no-PDEP path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from .bitops import word_select32

_I32 = jnp.int32


@jax.jit
def wave_prefix(pool):
    """Inclusive per-wave popcount prefix -> int32[n_rows, 64]."""
    n = pool.shape[0]
    w = pool.reshape(n, C.BLOCK_WAVES, C.WAVE_WORDS)
    pc = jnp.sum(jax.lax.population_count(w).astype(_I32), axis=-1)
    return jnp.cumsum(pc, axis=1, dtype=_I32)


@jax.jit
def global_wave_prefix(pool):
    """Inclusive popcount prefix over ALL waves of the pool, flattened ->
    int32[n_rows * 64].  (Totals must fit int32: pools < 2^31 set bits.)"""
    n = pool.shape[0]
    w = pool.reshape(n * C.BLOCK_WAVES, C.WAVE_WORDS)
    pc = jnp.sum(jax.lax.population_count(w).astype(_I32), axis=-1)
    return jnp.cumsum(pc, dtype=_I32)


@jax.jit
def select_flat(pool, gwc, ranks):
    """Batched select over the whole pool: ONE sort-based searchsorted over
    the global wave prefix (TPU-friendly: sorts the query batch instead of
    per-query binary-search gathers), one 128 B wave ROW gather per query,
    then the in-word descent.  ranks are 1-based global ranks (int32);
    out-of-range behavior is undefined (callers mask).
    Returns global bit position = pool_row * 65536 + in-block offset.
    (Variant comparison on v5e, 1M queries over a 100M-bit pool:
    flat-index gather + scan search 2.3 Mq/s; row gather 6.5; row gather +
    sort search 18.0 Mq/s.)"""
    wave = jnp.searchsorted(gwc, ranks, side="left",
                            method="sort").astype(_I32)
    wave = jnp.minimum(wave, gwc.shape[0] - 1)
    prev = jnp.where(wave > 0, gwc[jnp.maximum(wave - 1, 0)], 0)
    rem = ranks - prev                                   # 1-based in wave
    words = jnp.take(pool.reshape(-1, C.WAVE_WORDS), wave, axis=0)
    pc = jax.lax.population_count(words).astype(_I32)
    cum = jnp.cumsum(pc, axis=1)
    w = jnp.sum((cum < rem[:, None]).astype(_I32), axis=1)
    w = jnp.minimum(w, C.WAVE_WORDS - 1)
    prev_w = jnp.where(w > 0,
                       jnp.take_along_axis(cum, jnp.maximum(w - 1, 0)[:, None],
                                           axis=1)[:, 0], 0)
    word_val = jnp.take_along_axis(words, w[:, None], axis=1)[:, 0]
    bit = word_select32(word_val, rem - prev_w)
    return wave * C.WAVE_BITS + w * C.WORD_BITS + bit


@jax.jit
def select_in_pool(pool, wave_cum, rows, rem):
    """For each query: pool row ``rows[q]`` (int32) and 1-based in-block rank
    ``rem[q]`` -> bit position int32[q] in [0, 65536)."""
    wt = jnp.take(wave_cum, rows, axis=0)                 # [q, 64]
    wave = jnp.sum((wt < rem[:, None]).astype(_I32), axis=1)
    wave = jnp.minimum(wave, C.BLOCK_WAVES - 1)
    prev_w = jnp.where(wave > 0,
                       jnp.take_along_axis(wt, jnp.maximum(wave - 1, 0)[:, None],
                                           axis=1)[:, 0], 0)
    rem2 = rem - prev_w                                    # rank within wave
    wrow = rows * C.BLOCK_WAVES + wave
    words = jnp.take(pool.reshape(-1, C.WAVE_WORDS), wrow, axis=0)  # [q, 32]
    pc = jax.lax.population_count(words).astype(_I32)
    cum = jnp.cumsum(pc, axis=1)
    w = jnp.sum((cum < rem2[:, None]).astype(_I32), axis=1)
    w = jnp.minimum(w, C.WAVE_WORDS - 1)
    prev = jnp.where(w > 0,
                     jnp.take_along_axis(cum, jnp.maximum(w - 1, 0)[:, None],
                                         axis=1)[:, 0], 0)
    word_val = jnp.take_along_axis(words, w[:, None], axis=1)[:, 0]
    bit = word_select32(word_val, rem2 - prev)
    return wave * C.WAVE_BITS + w * C.WORD_BITS + bit
