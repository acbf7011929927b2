"""ShardedSparseVector: succinct-vector scans through the mesh container
(round-2 VERDICT item 2).  Results must equal the single-chip scanner.

Runs on the virtual 8-device CPU mesh (tests/conftest.py).
"""
import numpy as np
import pytest

import bitmagic_tpu.constants as C
from bitmagic_tpu.parallel.mesh import make_mesh
from bitmagic_tpu.parallel.sharded_sv import ShardedSparseVector
from bitmagic_tpu.sv.sparse_vector import SparseVector
from bitmagic_tpu.sv.scanner import scanner

N = 5 * C.BITS_PER_BLOCK + 12345      # several blocks + ragged tail


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _mk(rng, signed=False, nullable=False, hole_blocks=()):
    dtype = np.int32 if signed else np.uint32
    vals = rng.integers(-5000 if signed else 0, 5000, N).astype(dtype)
    null_mask = None
    if nullable:
        null_mask = rng.random(N) < 0.3          # True = NULL
    sv = SparseVector.from_array(vals, nullable=nullable,
                                 null_mask=null_mask)
    return sv, vals, null_mask


def _hits(sbv):
    return np.asarray(sbv.to_bitvector().indices())


def test_find_eq_matches_scanner(mesh):
    rng = np.random.default_rng(0)
    sv, vals, _ = _mk(rng)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    for v in (0, 1, 17, 4999, 12345):
        want = np.asarray(scanner.find_eq(sv, v).indices())
        got = _hits(ssv.find_eq(v))
        np.testing.assert_array_equal(got, want)
        assert ssv.find_eq_count(v) == want.size
    # impossible value (bit above every stored slice)
    assert ssv.find_eq_count(1 << 30) == 0
    assert _hits(ssv.find_eq(1 << 30)).size == 0


def test_find_eq_digest_narrowing_sparse(mesh):
    """A value present in few blocks: the digest pre-pass must skip the
    dead blocks (narrowing proxy asserted through the container API)."""
    vals = np.zeros(N, np.uint32)
    vals[3] = 0xABCDE
    vals[C.BITS_PER_BLOCK * 4 + 7] = 0xABCDE
    sv = SparseVector.from_array(vals)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    res = ssv.find_eq(0xABCDE)
    np.testing.assert_array_equal(
        _hits(res), [3, C.BITS_PER_BLOCK * 4 + 7])
    surv, total = res.last_narrowing
    assert surv <= 2 and total == ssv.n_blocks


def test_nullable_find_eq_zero(mesh):
    rng = np.random.default_rng(1)
    sv, vals, nm = _mk(rng, nullable=True)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    for v in (0, 42):
        want = np.asarray(scanner.find_eq(sv, v).indices())
        np.testing.assert_array_equal(_hits(ssv.find_eq(v)), want)


@pytest.mark.parametrize("signed", [False, True])
def test_ordered_searches(mesh, signed):
    rng = np.random.default_rng(2 + signed)
    sv, vals, _ = _mk(rng, signed=signed)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    for v in ([-3000, -1, 0, 1, 2500, 6000] if signed
              else [0, 1, 777, 2500, 6000]):
        np.testing.assert_array_equal(
            _hits(ssv.find_gt(v)), np.asarray(scanner.find_gt(sv, v).indices()),
            err_msg=f"gt {v}")
        np.testing.assert_array_equal(
            _hits(ssv.find_ge(v)), np.asarray(scanner.find_ge(sv, v).indices()),
            err_msg=f"ge {v}")
        np.testing.assert_array_equal(
            _hits(ssv.find_lt(v)), np.asarray(scanner.find_lt(sv, v).indices()),
            err_msg=f"lt {v}")
        np.testing.assert_array_equal(
            _hits(ssv.find_le(v)), np.asarray(scanner.find_le(sv, v).indices()),
            err_msg=f"le {v}")
    lo, hi = (-100, 300) if signed else (100, 500)
    np.testing.assert_array_equal(
        _hits(ssv.find_range(lo, hi)),
        np.asarray(scanner.find_range(sv, lo, hi).indices()))


@pytest.mark.parametrize("signed", [False, True])
def test_ordered_searches_out_of_range(mesh, signed):
    """Queries beyond the stored value range must resolve symbolically —
    the slice descent only sees n_eff bits, so without the range guards a
    query would be answered for value mod 2**n_eff (round-3 review repro)."""
    vals = (np.asarray([-3, -1, 0, 2], np.int32) if signed
            else np.asarray([1, 2, 3, 0, 3], np.uint32))
    sv = SparseVector.from_array(vals)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    queries = ([5, -10, 100, -100, 3, -4] if signed
               else [4, 5, 100, (1 << 31) - 1, 3])
    for v in queries:
        for name in ("find_gt", "find_ge", "find_lt", "find_le"):
            want = np.asarray(getattr(scanner, name)(sv, v).indices())
            got = _hits(getattr(ssv, name)(v))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{name} {v}")
    lo, hi = (-100, 100) if signed else (0, 100)
    np.testing.assert_array_equal(
        _hits(ssv.find_range(lo, hi)),
        np.asarray(scanner.find_range(sv, lo, hi).indices()))


def test_find_ne_zero_nonzero(mesh):
    rng = np.random.default_rng(9)
    sv, vals, nm = _mk(rng, nullable=True)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    for v in (0, 17, 1 << 30):
        np.testing.assert_array_equal(
            _hits(ssv.find_ne(v)),
            np.asarray(scanner.find_ne(sv, v).indices()), err_msg=f"ne {v}")
    np.testing.assert_array_equal(
        _hits(ssv.find_zero()), np.asarray(scanner.find_zero(sv).indices()))
    np.testing.assert_array_equal(
        _hits(ssv.find_nonzero()),
        np.asarray(scanner.find_nonzero(sv).indices()))


def test_pipeline_counts_match(mesh):
    rng = np.random.default_rng(4)
    sv, vals, _ = _mk(rng)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    queries = list(rng.integers(0, 5000, 24)) + [1 << 30]
    got = ssv.pipeline_find_eq(queries)
    want = [int((vals == q).sum()) for q in queries]
    assert got == want


def test_gather_decode(mesh):
    rng = np.random.default_rng(5)
    sv, vals, nm = _mk(rng, signed=True, nullable=True)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    ids = rng.integers(0, N, 300).astype(np.int64)
    want = vals.copy()
    want[nm] = 0                              # NULL positions read as 0
    np.testing.assert_array_equal(ssv.gather(ids), want[ids])
    np.testing.assert_array_equal(ssv.decode(100, 50), want[100:150])
    assert ssv.get(3) == want[3]
    with pytest.raises(IndexError):
        ssv.gather([N + C.BITS_PER_BLOCK * 8])


def test_roundtrip_and_checkpoint(mesh):
    rng = np.random.default_rng(6)
    sv, vals, _ = _mk(rng)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    back = ssv.to_sparse_vector()
    assert back.equal(sv)
    blob = ssv.checkpoint_bytes()
    again = ShardedSparseVector.from_checkpoint(blob, mesh)
    assert again.size == N
    np.testing.assert_array_equal(again.decode(0, 64), vals[:64])
    assert len(blob) < N * 4                  # actually compressed


# ---------------------------------------------------------------------------
# sharded STRING container (mesh-scale find_eq_str / gather / pipeline)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def str_data():
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "longer-string-here", "x"]
    strs = [words[i] for i in rng.integers(0, len(words), 50_000)]
    strs[12345] = "needle"
    return strs


def test_sharded_str_find_eq(mesh, str_data):
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    from bitmagic_tpu.sv.scanner import scanner
    ssv = StrSparseVector.from_strings(str_data)
    sh = ShardedStrSparseVector.from_str_vector(ssv, mesh)
    for q in ("beta", "needle", "absent", "x"):
        want = np.asarray(scanner.find_eq_str(ssv, q).indices())
        got = np.asarray(sh.find_eq_str(q).to_bitvector().indices())
        np.testing.assert_array_equal(got, want, err_msg=q)
        assert sh.find_eq_str_count(q) == want.size
    res = sh.find_eq_str("needle")
    surv, total = res.last_narrowing
    assert surv <= 2 and total == sh.n_blocks


def test_sharded_str_remap_and_pipeline(mesh, str_data):
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    ssv = StrSparseVector.from_strings(str_data)
    ssv.remap()
    sh = ShardedStrSparseVector.from_str_vector(ssv, mesh)
    queries = ["alpha", "needle", "nope", "zeta", "", "x"]
    # pin to the single-chip scanner (incl. the "" all-zero-octets edge)
    from bitmagic_tpu.sv.scanner import scanner
    want = [scanner.find_eq_str(ssv, q).count() for q in queries]
    got = sh.pipeline_find_eq_str(queries)
    assert got == want


def test_sharded_str_overlong_query(mesh, str_data):
    """A needle longer than max_str_size cannot exist in the container —
    must return 0 hits, not crash in remap_value (round-3 review repro)."""
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    ssv = StrSparseVector.from_strings(["aa", "bb", "cc"])
    sh = ShardedStrSparseVector.from_str_vector(ssv, mesh)
    long_q = "a" * (ssv.max_str_size + 9)
    assert sh.find_eq_str_count(long_q) == 0
    assert np.asarray(sh.find_eq_str(long_q).to_bitvector().indices()).size == 0
    assert sh.pipeline_find_eq_str(["aa", long_q, "cc"]) == [1, 0, 1]
    # single-host scanner path through the same remap_value
    from bitmagic_tpu.sv.scanner import scanner
    assert scanner.find_eq_str(ssv, long_q).count() == 0


def test_sharded_str_gather_roundtrip(mesh, str_data):
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    from bitmagic_tpu.sv.str_vector import StrSparseVector
    strs = list(str_data[:2000])
    strs[7] = None                       # NULL element
    ssv = StrSparseVector.from_strings(strs, nullable=True)
    ssv.remap()
    sh = ShardedStrSparseVector.from_str_vector(ssv, mesh)
    ids = [0, 7, 100, 1999]
    assert sh.gather(ids) == [strs[i] for i in ids]
    assert sh[7] is None and sh[100] == strs[100]
    back = sh.to_str_vector()
    assert back.gather(np.arange(50)) == strs[:50]
    blob = sh.checkpoint_bytes()
    again = ShardedStrSparseVector.from_checkpoint(blob, mesh)
    assert again.gather(ids) == [strs[i] for i in ids]


def test_sorted_search_on_sharded(mesh):
    """scanner.bind() sorted search runs on the MESH containers unchanged
    (sample gather + one window decode, all through mesh gather/decode)."""
    import bisect
    rng = np.random.default_rng(41)
    vals = np.sort(rng.integers(0, 100_000, 50_000).astype(np.uint32))
    ssv = ShardedSparseVector.from_array(vals, mesh)
    scanner.bind(ssv)
    for q in (0, int(vals[7]), int(vals[-1]), 100_001, 55_555):
        assert scanner.lower_bound(ssv, q) == bisect.bisect_left(vals, q), q
    hit = scanner.bfind_eq(ssv, int(vals[123]))
    assert vals[hit] == vals[123]
    assert scanner.bfind_eq(ssv, 100_001) == -1
    scanner.unbind()
    # sorted STRING container through the same path
    from bitmagic_tpu.parallel.sharded_sv import ShardedStrSparseVector
    words = sorted("w%05d" % v for v in rng.integers(0, 999, 5_000))
    sstr = ShardedStrSparseVector.from_strings(words, mesh)
    scanner.bind(sstr)
    for q in ("w00000", words[17], words[-1], "zzzzz"):
        assert scanner.lower_bound_str(sstr, q) == \
            bisect.bisect_left(words, q), q
    assert words[scanner.bfind_eq_str(sstr, words[42])] == words[42]
    assert scanner.bfind_eq_str(sstr, "zzzzz") == -1
    scanner.unbind()


# ---------------------------------------------------------------------------
# sharded FLOAT container (IEEE sign/exp/mantissa descent at mesh scale)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_sharded_float_matches_scanner(mesh, dtype):
    from bitmagic_tpu.parallel.sharded_sv import ShardedFloatVector
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    rng = np.random.default_rng(31)
    n = 2 * C.BITS_PER_BLOCK + 999
    vals = (rng.normal(0, 100, n) * rng.choice([1, 0, 0.5], n)).astype(dtype)
    vals[5] = -0.0                              # signed-zero edge
    vals[7] = 3.25
    fv = FloatSparseVector.from_array(vals)
    sfv = ShardedFloatVector.from_float_vector(fv, mesh)
    for q in (3.25, 0.0, -0.0, 12.75, -50.0, float(vals[123])):
        q = dtype(q)
        want = np.asarray(scanner.find_eq_float(fv, q).indices())
        got = _hits(sfv.find_eq(q))
        np.testing.assert_array_equal(got, want, err_msg=f"eq {q}")
        assert sfv.find_eq_count(q) == want.size
        np.testing.assert_array_equal(
            _hits(sfv.find_gt(q)),
            np.asarray(scanner.find_gt_float(fv, q).indices()),
            err_msg=f"gt {q}")
        np.testing.assert_array_equal(
            _hits(sfv.find_lt(q)),
            np.asarray(scanner.find_lt_float(fv, q).indices()),
            err_msg=f"lt {q}")
    # ge/le/range against ground truth
    for q in (0.0, -25.5, 60.0):
        np.testing.assert_array_equal(
            _hits(sfv.find_ge(dtype(q))), np.flatnonzero(vals >= dtype(q)))
        np.testing.assert_array_equal(
            _hits(sfv.find_le(dtype(q))), np.flatnonzero(vals <= dtype(q)))
    np.testing.assert_array_equal(
        _hits(sfv.find_range(dtype(-10), dtype(10))),
        np.flatnonzero((vals >= dtype(-10)) & (vals <= dtype(10))))
    # batch pipeline + gather/decode + checkpoint roundtrip
    qs = [dtype(3.25), dtype(0.0), dtype(999999.0)]
    assert sfv.pipeline_find_eq(qs) == [int((vals == q).sum()) for q in qs]
    ids = rng.integers(0, n, 200)
    np.testing.assert_array_equal(sfv.gather(ids), vals[ids])
    np.testing.assert_array_equal(sfv.decode(100, 40), vals[100:140])
    blob = sfv.checkpoint_bytes()
    again = ShardedFloatVector.from_checkpoint(blob, mesh)
    np.testing.assert_array_equal(again.decode(0, 64), vals[:64])


def test_sharded_float_nullable(mesh):
    from bitmagic_tpu.parallel.sharded_sv import ShardedFloatVector
    from bitmagic_tpu.sv.float_vector import FloatSparseVector
    rng = np.random.default_rng(33)
    n = 30_000
    vals = rng.normal(0, 10, n).astype(np.float32)
    fv = FloatSparseVector.from_array(vals, nullable=True)
    for i in (3, 100, 29_999):
        fv.set_null(i)
    sfv = ShardedFloatVector.from_float_vector(fv, mesh)
    q = np.float32(vals[3])
    want = np.asarray(scanner.find_eq_float(fv, q).indices())
    np.testing.assert_array_equal(_hits(sfv.find_eq(q)), want)
    assert 3 not in set(_hits(sfv.find_gt(np.float32(-1e9))).tolist())
    got = sfv.gather([2, 3, 4])
    assert got[1] == 0.0 and got[0] == vals[2] and got[2] == vals[4]


# ---------------------------------------------------------------------------
# sharded RSC container (compressed-domain search + sharded rank decompress)
# ---------------------------------------------------------------------------
def test_sharded_rsc_find_and_gather(mesh):
    from bitmagic_tpu.parallel.sharded_sv import ShardedRSCVector
    from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
    from bitmagic_tpu.sv.sparse_vector import SparseVector
    from bitmagic_tpu.sv.scanner import scanner
    rng = np.random.default_rng(21)
    n = 2 * C.BITS_PER_BLOCK + 777
    null_mask = rng.random(n) < 0.7              # 70% NULL -> compressive
    vals = rng.integers(1, 3000, n).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True, null_mask=null_mask)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    srsc = ShardedRSCVector.from_rsc(rsc, mesh)
    assert srsc.count() == int((~null_mask).sum())
    for q in (int(vals[np.flatnonzero(~null_mask)[0]]), 12345):
        want = np.asarray(scanner.find_eq_rsc(rsc, q).indices())
        got = np.asarray(srsc.find_eq(q).to_bitvector().indices())
        np.testing.assert_array_equal(got, want, err_msg=str(q))
    # gather semantics: NULL reads 0/None
    ids = np.asarray([0, 5, n - 1] + list(rng.integers(0, n, 100)))
    got_vals, got_ok = srsc.gather(ids)
    want_ok = ~null_mask[ids]
    np.testing.assert_array_equal(got_ok, want_ok)
    np.testing.assert_array_equal(got_vals[want_ok], vals[ids][want_ok])
    assert (got_vals[~want_ok] == 0).all()
    i_null = int(np.flatnonzero(null_mask)[0])
    i_val = int(np.flatnonzero(~null_mask)[0])
    assert srsc.try_get(i_null) is None
    assert srsc.try_get(i_val) == vals[i_val]
    # ordered + ne fronts: compressed-domain search, rank decompression
    for name, pred in (("find_gt", lambda a, q: a > q),
                       ("find_ge", lambda a, q: a >= q),
                       ("find_lt", lambda a, q: a < q),
                       ("find_le", lambda a, q: a <= q),
                       ("find_ne", lambda a, q: a != q)):
        q = 1500
        want = np.flatnonzero(~null_mask & pred(vals, q))
        got = np.asarray(getattr(srsc, name)(q).to_bitvector().indices())
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_sharded_rsc_roundtrip_checkpoint(mesh):
    from bitmagic_tpu.parallel.sharded_sv import ShardedRSCVector
    from bitmagic_tpu.sv.rsc_vector import RSCSparseVector
    from bitmagic_tpu.sv.sparse_vector import SparseVector
    rng = np.random.default_rng(22)
    n = 50_000
    null_mask = rng.random(n) < 0.9
    vals = rng.integers(1, 500, n).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True, null_mask=null_mask)
    srsc = ShardedRSCVector.from_sparse_vector(sv, mesh)
    blob = srsc.checkpoint_bytes()
    assert len(blob) < n                          # compressed at rest
    again = ShardedRSCVector.from_checkpoint(blob, mesh)
    ids = rng.integers(0, n, 200)
    v1, ok1 = srsc.gather(ids)
    v2, ok2 = again.gather(ids)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(ok1, ok2)
    counts = again.pipeline_find_eq([7, 9, 100000])
    want = [int((vals[~null_mask] == q).sum()) for q in (7, 9, 100000)]
    assert counts == want


def test_out_of_dtype_range_queries_sharded(mesh):
    """Unrepresentable values through the sharded container (round-3 fuzz
    finding: the selector's s2u cast raised OverflowError)."""
    rng = np.random.default_rng(55)
    vals = rng.integers(-100, 100, 30_000).astype(np.int16)
    sv = SparseVector.from_array(vals)
    ssv = ShardedSparseVector.from_sparse_vector(sv, mesh)
    for q in (1 << 15, (1 << 15) + 7, -(1 << 15) - 1, 1 << 40):
        assert ssv.find_eq_count(q) == 0
        assert _hits(ssv.find_eq(q)).size == 0
        # ne of an impossible value = everything assigned
        assert _hits(ssv.find_ne(q)).size == vals.size
    counts = ssv.pipeline_find_eq([0, 1 << 15, 17, -(1 << 20)])
    assert counts == [int((vals == 0).sum()), 0,
                      int((vals == 17).sum()), 0]
