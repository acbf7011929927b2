"""Scanner tests: compressed-form search (reference TestSparseVectorScan,
tests/stress/t.cpp:32401)."""
import numpy as np
import pytest

from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.scanner import scanner
from bitmagic_tpu.sv import algo as sv_algo
from bitmagic_tpu.core.bitvector import BitVector

N = 70000


def test_find_eq_unsigned(rng):
    vals = rng.integers(0, 50, N).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    for v in [0, 1, 7, 49, 200]:
        got = scanner.find_eq(sv, v).indices()
        got = got[got < N]
        np.testing.assert_array_equal(got, np.flatnonzero(vals == v)), v


def test_find_eq_nullable(rng):
    vals = rng.integers(0, 10, 1000).astype(np.uint32)
    nulls = rng.random(1000) < 0.3
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nulls)
    for v in [0, 3]:
        got = scanner.find_eq(sv, v).indices()
        want = np.flatnonzero((vals == v) & ~nulls)
        np.testing.assert_array_equal(got[got < 1000], want)


def test_find_eq_signed(rng):
    vals = rng.integers(-20, 20, 5000).astype(np.int32)
    sv = SparseVector.from_array(vals)
    for v in [-20, -1, 0, 5, 19]:
        got = scanner.find_eq(sv, v).indices()
        np.testing.assert_array_equal(got[got < 5000], np.flatnonzero(vals == v))


@pytest.mark.parametrize("signed", [False, True])
def test_ordered_searches(rng, signed):
    if signed:
        vals = rng.integers(-100, 100, 5000).astype(np.int32)
        probes = [-150, -100, -37, -1, 0, 1, 42, 99, 150]
    else:
        vals = rng.integers(0, 200, 5000).astype(np.uint32)
        probes = [0, 1, 77, 199, 250]
    sv = SparseVector.from_array(vals)
    for v in probes:
        for name, op in [("gt", np.greater), ("ge", np.greater_equal),
                         ("lt", np.less), ("le", np.less_equal)]:
            got = getattr(scanner, "find_" + name)(sv, v).indices()
            got = got[got < vals.size]
            want = np.flatnonzero(op(vals.astype(np.int64), v))
            np.testing.assert_array_equal(got, want), (name, v)


def test_find_range(rng):
    vals = rng.integers(0, 1000, 5000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    got = scanner.find_range(sv, 100, 200).indices()
    want = np.flatnonzero((vals >= 100) & (vals <= 200))
    np.testing.assert_array_equal(got[got < vals.size], want)


def test_find_zero_nonzero(rng):
    vals = rng.integers(0, 3, 3000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    z = scanner.find_zero(sv).indices()
    np.testing.assert_array_equal(z[z < 3000], np.flatnonzero(vals == 0))
    nz = scanner.find_nonzero(sv).indices()
    np.testing.assert_array_equal(nz[nz < 3000], np.flatnonzero(vals != 0))


def test_sorted_search(rng):
    vals = np.unique(rng.integers(0, 10**6, 2000)).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    for v in [int(vals[0]), int(vals[100]), int(vals[-1])]:
        assert scanner.bfind_eq(sv, v) == int(np.searchsorted(vals, v))
    missing = int(vals[50]) + 1
    if missing not in vals:
        assert scanner.bfind_eq(sv, missing) == -1
    assert scanner.lower_bound(sv, 0) == 0


def test_bound_sorted_search(rng):
    """bind() sample-index descent == plain binary search (reference
    bind/sv_sample_index, src/bmsparsevec_algo.h:493)."""
    vals = np.unique(rng.integers(0, 10**7, 3000)).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    queries = np.concatenate([rng.integers(0, 10**7, 40),
                              vals[[0, 1, 555, len(vals) - 1]],
                              [0, 10**7 + 5]])
    plain = [scanner.lower_bound(sv, int(q)) for q in queries]
    scanner.bind(sv)
    try:
        bound = [scanner.lower_bound(sv, int(q)) for q in queries]
        assert bound == plain
        assert scanner.bfind_eq(sv, int(vals[77])) == 77
        # window boundary cases: exact sample positions land on pos[k]
        rate = scanner.BIND_SAMPLE_RATE
        if len(vals) > rate:
            assert scanner.lower_bound(sv, int(vals[rate])) == rate
    finally:
        scanner.unbind()


def test_bound_sorted_search_str(rng):
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    import bisect
    words = sorted({f"k{int(x):06d}" for x in rng.integers(0, 10**6, 1200)})
    ssv = StrSparseVector(8)
    for w in words:
        ssv.push_back(w)
    ssv.remap()
    qs = [f"k{int(x):06d}" for x in rng.integers(0, 10**6, 25)] + \
        [words[0], words[-1], "a", "z"]
    scanner.bind(ssv)
    try:
        for q in qs:
            assert scanner.lower_bound_str(ssv, q) == \
                bisect.bisect_left(words, q)
        assert scanner.bfind_eq_str(ssv, words[33]) == 33
    finally:
        scanner.unbind()


def test_pipeline_find_eq(rng):
    vals = rng.integers(0, 20, 4000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    counts = scanner.pipeline_find_eq(sv, list(range(20)), counts_only=True)
    want = [int((vals == v).sum()) for v in range(20)]
    assert counts == want


def test_first_mismatch(rng):
    vals = rng.integers(0, 1000, 3000).astype(np.uint32)
    a = SparseVector.from_array(vals)
    b = SparseVector.from_array(vals)
    assert sv_algo.find_first_mismatch(a, b) == -1
    v2 = vals.copy(); v2[1234] += 1
    b2 = SparseVector.from_array(v2)
    assert sv_algo.find_first_mismatch(a, b2) == 1234
    # size mismatch -> first index past the shorter
    c = SparseVector.from_array(vals[:2000])
    assert sv_algo.find_first_mismatch(a, c) == 2000


def test_set2set_transform(rng):
    vals = rng.integers(0, 500, 1000).astype(np.uint32)
    sv = SparseVector.from_array(vals)
    keys = BitVector.from_indices([1, 5, 999], 2**48)
    out = sv_algo.set2set_transform(sv, keys)
    want = np.unique(vals[[1, 5, 999]])
    np.testing.assert_array_equal(out.indices(), want)


def test_pipeline_counts_bulk(rng):
    """Bulk counts-only pipeline: one device call for the whole value
    batch; must agree with per-value find_eq counts, including values
    needing a missing plane (0 hits) and value 0 (find_zero path)."""
    from bitmagic_tpu.sv.scanner import scanner
    vals = rng.integers(0, 1 << 12, 50_000).astype(np.uint32)
    vals[::9] = 0
    sv = SparseVector.from_array(vals, nullable=True)
    queries = list(rng.integers(0, 1 << 12, 40)) + [0, 1 << 20]
    got = scanner.pipeline_find_eq(sv, queries, counts_only=True)
    want = [int(scanner.find_eq(sv, q).count()) for q in queries]
    assert got == want


def test_pipeline_counts_with_full_blocks(rng):
    """FULL plane blocks (optimized dense slices / FULL null ranges) must
    map to all-ones rows in the bulk pipeline (regression: they briefly
    decoded as zero rows on-chip)."""
    from bitmagic_tpu.sv.scanner import scanner
    n = 150_000                       # > one block: null plane gets FULL
    vals = rng.integers(0, 16, n).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True)
    for p in sv.planes:
        if p is not None:
            p.optimize()
    sv.null_plane.optimize()
    queries = list(range(16))
    got = scanner.pipeline_find_eq(sv, queries, counts_only=True)
    want = [int((vals == q).sum()) for q in queries]
    assert got == want


def test_float_and_rsc_scanner(rng):
    """Scanner fronts for the float and RSC families (reference scanner
    float variants / rsc search)."""
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
    from bitmagic_tpu.sv.scanner import scanner

    fvals = np.round(rng.standard_normal(4000) * 50).astype(np.float32)
    fvals[::7] = 2.5
    fv = FloatSparseVector.from_array(fvals)
    np.testing.assert_array_equal(
        scanner.find_eq_float(fv, 2.5).indices(),
        np.flatnonzero(fvals == 2.5))
    for q in (-3.0, 0.0, 2.5, 17.0):
        got = scanner.find_gt_float(fv, q).indices()
        np.testing.assert_array_equal(got, np.flatnonzero(fvals > q),
                                      err_msg=f"gt {q}")
        got = scanner.find_lt_float(fv, q).indices()
        np.testing.assert_array_equal(got, np.flatnonzero(fvals < q),
                                      err_msg=f"lt {q}")

    n = 50_000
    vals = rng.integers(0, 64, n).astype(np.uint32)
    nn = rng.random(n) > 0.6
    arr = vals.copy(); arr[~nn] = 0
    sv = SparseVector.from_array(arr, nullable=True, null_mask=~nn)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    got = scanner.find_eq_rsc(rsc, 7).indices()
    np.testing.assert_array_equal(got, np.flatnonzero(nn & (vals == 7)))
    got = scanner.find_gt_rsc(rsc, 60).indices()
    np.testing.assert_array_equal(got, np.flatnonzero(nn & (vals > 60)))


def test_prepared_pipeline_reuse(rng):
    """prepare_pipeline builds the plane stack once; repeated batches
    agree with per-value find_eq."""
    from bitmagic_tpu.sv.scanner import scanner
    vals = rng.integers(0, 1 << 10, 30_000).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True)
    prep = scanner.prepare_pipeline(sv)
    assert prep.ok
    for _ in range(2):
        qs = list(rng.integers(0, 1 << 10, 16))
        got = prep.counts(qs)
        want = [int(scanner.find_eq(sv, q).count()) for q in qs]
        assert got == want


def test_str_pipeline_counts(rng):
    """Bulk string-equality counts: one device call per batch, matching
    per-string find_eq_str (incl. remapped vectors, empty and unmappable
    queries)."""
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    from bitmagic_tpu.sv.scanner import scanner
    words = ["chr%d" % rng.integers(1, 9) for _ in range(20_000)]
    ssv = StrSparseVector.from_strings(words, nullable=True)
    for remapped in (False, True):
        if remapped:
            ssv.remap()
        queries = ["chr1", "chr5", "chr8", "nope", ""]
        got = scanner.pipeline_find_eq_str(ssv, queries)
        want = [int(scanner.find_eq_str(ssv, q).count()) for q in queries]
        assert got == want, f"remapped={remapped}"
        prep = scanner.prepare_pipeline_str(ssv)
        assert prep.counts(queries) == want


def test_invert_and_find_eq_set(rng):
    """scanner.invert (EQ -> not-EQ with NULL correction) and the
    set-membership find_eq_set (A IN (...)), reference
    src/bmsparsevec_algo.h:2014 / :1092."""
    vals = rng.integers(0, 40, 30_000).astype(np.uint32)
    nm = rng.random(30_000) < 0.25
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nm)
    eq = scanner.find_eq(sv, 7)
    inv = scanner.invert(sv, eq)
    np.testing.assert_array_equal(
        np.asarray(inv.indices()), np.flatnonzero(~nm & (vals != 7)))
    # invert of empty result = all assigned
    assert scanner.invert(sv, BitVector(1)).count() == int((~nm).sum())
    got = scanner.find_eq_set(sv, [0, 7, 39, 1000])
    want = np.flatnonzero(~nm & np.isin(vals, [0, 7, 39, 1000]))
    np.testing.assert_array_equal(np.asarray(got.indices()), want)
    # non-nullable path
    sv2 = SparseVector.from_array(vals)
    np.testing.assert_array_equal(
        np.asarray(scanner.invert(sv2, scanner.find_eq(sv2, 3)).indices()),
        np.flatnonzero(vals != 3))


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint32, np.int64])
def test_out_of_dtype_range_queries(rng, dtype):
    """Queries not representable in the container dtype resolve
    symbolically (the reference's typed value_type argument makes the
    case impossible there; here it must never match rather than raise —
    round-3 fuzz finding: OverflowError in s2u)."""
    info = np.iinfo(dtype)
    vals = rng.integers(max(info.min, -100), min(info.max, 100),
                        20_000).astype(dtype)
    nm = rng.random(20_000) < 0.2
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nm)
    over = [int(info.max) + 1, int(info.max) * 2 + 7,
            int(info.min) - 1, int(info.min) * 2 - 1]
    for q in over:
        assert scanner.find_eq(sv, q).count() == 0
        # ne of an impossible value = all assigned
        assert scanner.find_ne(sv, q).count() == int((~nm).sum())
    # pipelines: mixed representable / unrepresentable batches
    batch = [0, over[0], 5, over[2]]
    counts = scanner.pipeline_find_eq(sv, batch, counts_only=True)
    want = [int((vals[~nm] == q).sum()) if info.min <= q <= info.max else 0
            for q in batch]
    assert counts == want
    res = scanner.pipeline_find_eq(sv, batch)
    for bv, w in zip(res, want):
        assert bv.count() == w
