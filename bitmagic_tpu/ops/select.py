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
import numpy as np
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


_BUCKET = 128            # waves per bucket in the sampled wave search
# numpy constants: safe to close over under jit (device constants leak
# tracers when first materialized inside a trace)
_IOTA_W = np.arange(C.WAVE_WORDS, dtype=np.int32)
_TRI_W = (np.arange(C.WAVE_WORDS)[:, None]
          <= np.arange(C.WAVE_WORDS)[None, :]).astype(np.float32)


def _wave_consts():
    return _IOTA_W, _TRI_W


def _in_wave_descent(words, rem):
    """words uint32[Q, 32], rem 1-based in-wave rank -> bit offset in the
    1024-bit wave.  The word cumsum runs as a [Q,32]@[32,32] MXU matmul
    (exact in f32: values <= 65536 < 2^24) and the word pick as masked
    sums — both avoid the row-wise scan/gather ops that serialize on the
    VPU (3x measured vs cumsum + take_along_axis).  A fused Pallas tile
    kernel for this stage was tried and measured SLOWER (22.8 vs 19 ms
    per 1M queries end-to-end): the wave gather outside dominates and the
    per-tile [1024,32]@[32,32] MXU dot under-utilizes — keep the XLA
    formulation."""
    iota, tri = _wave_consts()
    pc = jax.lax.population_count(words).astype(_I32)
    cum = jnp.dot(pc.astype(jnp.float32), tri,
                  preferred_element_type=jnp.float32).astype(_I32)
    w = jnp.sum((cum < rem[:, None]).astype(_I32), axis=1)
    w = jnp.minimum(w, C.WAVE_WORDS - 1)
    prev_w = jnp.sum(jnp.where(iota[None, :] < w[:, None], pc, 0), axis=1)
    word_val = jnp.sum(jnp.where(iota[None, :] == w[:, None], words, 0),
                       axis=1, dtype=jnp.uint32)
    bit = word_select32(word_val, rem - prev_w)
    return w * C.WORD_BITS + bit


@jax.jit
def select_flat(pool, gwc, ranks):
    """Batched select over the whole pool: a sampled two-level bucket
    search over the global wave prefix (broadcast compare against the
    bucket maxima, then one G-entry slab gather — pure vector ops, no
    sort), one 128 B wave ROW gather per query, then the MXU in-wave
    descent.  ranks are 1-based global ranks (int32); out-of-range
    behavior is undefined (callers mask).
    Returns global bit position = pool_row * 65536 + in-block offset.
    (Variant comparison on v5e, 1M queries over a 100M-bit pool:
    flat gather + scan search 2.3 Mq/s; row gather + sort search 18;
    bucket search + MXU descent 52-62 Mq/s.  Also measured and REJECTED
    in round 2: bucket sizes 64/256 and three-level searches (5-8%
    slower — extra gather latency), and 256-bit sub-wave granularity
    with 32 B leaf gathers (20-36 ms: the finer prefix makes the bucket
    compare O(Q x bucket) dominant).  The 128-wave two-level structure
    is the measured optimum.)"""
    n_waves = gwc.shape[0]
    pad = (-n_waves) % _BUCKET
    gwc_pad = jnp.concatenate(
        [gwc, jnp.full((pad,), jnp.iinfo(_I32).max, _I32)])
    buckets = gwc_pad.reshape(-1, _BUCKET)
    gs = buckets[:, -1]                                  # bucket maxima
    b = jnp.sum((gs[None, :] < ranks[:, None]).astype(_I32), axis=1)
    b = jnp.minimum(b, gs.shape[0] - 1)
    slab = jnp.take(buckets, b, axis=0)                  # [Q, G]
    wave = jnp.minimum(
        b * _BUCKET + jnp.sum((slab < ranks[:, None]).astype(_I32), axis=1),
        n_waves - 1)
    prev = jnp.where(wave > 0, gwc[jnp.maximum(wave - 1, 0)], 0)
    rem = ranks - prev                                   # 1-based in wave
    words = jnp.take(pool.reshape(-1, C.WAVE_WORDS), wave, axis=0)
    return wave * C.WAVE_BITS + _in_wave_descent(words, rem)


@jax.jit
def select_in_pool(pool, wave_cum, rows, rem):
    """For each query: pool row ``rows[q]`` (int32) and 1-based in-block rank
    ``rem[q]`` -> bit position int32[q] in [0, 65536)."""
    wt = jnp.take(wave_cum, rows, axis=0)                 # [q, 64]
    wave = jnp.sum((wt < rem[:, None]).astype(_I32), axis=1)
    wave = jnp.minimum(wave, C.BLOCK_WAVES - 1)
    iota64 = jnp.arange(C.BLOCK_WAVES, dtype=_I32)
    prev_w = jnp.sum(jnp.where(iota64[None, :] == wave[:, None] - 1, wt, 0),
                     axis=1)
    rem2 = rem - prev_w                                    # rank within wave
    wrow = rows * C.BLOCK_WAVES + wave
    words = jnp.take(pool.reshape(-1, C.WAVE_WORDS), wrow, axis=0)  # [q, 32]
    return wave * C.WAVE_BITS + _in_wave_descent(words, rem2)
