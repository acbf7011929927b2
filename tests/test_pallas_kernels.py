"""Pallas kernel equivalence tests (interpret mode on CPU — the 'portable
vs SIMD build matrix' of the reference, tests/stress/build_all.sh, becomes
jnp-reference vs pallas-kernel equivalence)."""
import numpy as np
import pytest

import jax.numpy as jnp

from bitmagic_tpu.constants import BITS_PER_BLOCK
from bitmagic_tpu.ops import blockops
from bitmagic_tpu.ops import pallas_kernels as pk


@pytest.fixture
def pools(rng):
    n = 13   # non-multiple of BLOCK_TILE on purpose
    a = rng.integers(0, 2**32, (n, 2048), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, (n, 2048), dtype=np.uint64).astype(np.uint32)
    a[3] = 0
    b[7] = 0xFFFFFFFF
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.parametrize("op", ["and", "or", "xor", "sub"])
def test_logical_digest(pools, op):
    a, b = pools
    out, dig = pk.logical_op_digest_pallas(op, a, b)
    want, want_dig = blockops.logical_op_digest(op, a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(dig), np.asarray(want_dig))


@pytest.mark.parametrize("op", ["and", "or", "xor", "sub"])
def test_count_op(pools, op):
    a, b = pools
    got = pk.count_op_pallas(op, a, b)
    want = blockops.count_op(op, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_block_counts(pools):
    a, _ = pools
    np.testing.assert_array_equal(
        np.asarray(pk.block_counts_pallas(a)),
        np.asarray(blockops.block_counts(a)))


def test_agg_and_sub_sweep(rng):
    """K-way aggregator kernel vs numpy reduction, with -1 identity slots."""
    n_rows, n_blocks = 24, 5
    pool_np = rng.integers(0, 2**32, (n_rows, 2048),
                           dtype=np.uint64).astype(np.uint32)
    pool_np |= 0xF000000F     # keep blocks non-zero so no early exit here
    n_and, n_sub = 3, 2
    slots = rng.integers(0, n_rows, (n_and + n_sub, n_blocks)).astype(np.int32)
    slots[1, 2] = -1          # FULL AND operand
    slots[4, 0] = -1          # missing SUB operand
    got = np.asarray(pk.agg_and_sub_pallas(
        n_and, n_sub, jnp.asarray(slots), jnp.asarray(pool_np)))
    want = np.full((n_blocks, 2048), 0xFFFFFFFF, np.uint32)
    for k in range(n_and):
        for i in range(n_blocks):
            if slots[k, i] >= 0:
                want[i] &= pool_np[slots[k, i]]
    for k in range(n_and, n_and + n_sub):
        for i in range(n_blocks):
            if slots[k, i] >= 0:
                want[i] &= ~pool_np[slots[k, i]]
    np.testing.assert_array_equal(got, want)


def test_agg_early_exit_correctness(rng):
    """Zero accumulator must yield zero result regardless of later operands."""
    pool_np = rng.integers(0, 2**32, (4, 2048), dtype=np.uint64).astype(np.uint32)
    pool_np[1] = 0                                   # zero block kills the AND
    slots = np.asarray([[0], [1], [2]], np.int32)    # and: 0,1  sub: 2
    got = np.asarray(pk.agg_and_sub_pallas(2, 1, jnp.asarray(slots),
                                           jnp.asarray(pool_np)))
    assert (got == 0).all()


def test_scan_eq(rng):
    n_planes, n_blocks = 8, 3
    vals = rng.integers(0, 2**n_planes, n_blocks * BITS_PER_BLOCK).astype(np.uint32)
    planes = np.zeros((n_planes, n_blocks, 2048), np.uint32)
    for s in range(n_planes):
        bits = ((vals >> s) & 1).astype(np.uint8)
        planes[s] = np.packbits(bits, bitorder="little").view(
            np.uint32).reshape(n_blocks, 2048)
    target = 42
    got = np.asarray(pk.scan_eq_pallas(n_planes, jnp.asarray(planes),
                                       np.uint32(target)))
    hits = np.unpackbits(got.view(np.uint8), bitorder="little")
    np.testing.assert_array_equal(np.flatnonzero(hits),
                                  np.flatnonzero(vals == target))
