"""Adversarial fuzz harness for the sharded container family + serial
iterators (the round-3 surfaces) + the ShardedBitVector surface itself
(set algebra, digest-narrowed group ops, rank/select both paths,
checkpoint, group exchange).

Every trial builds a random container (random dtype / size / distribution /
null mask, deliberately including dtype edges, empty strings, IEEE
specials, duplicate runs, ragged shard tails) and cross-checks the mesh
container against the single-chip scanner AND a numpy golden.  The
single-chip scanner itself is golden-tested in tests/; here it serves as
the oracle for the sharded layer (reference scanner semantics:
src/bmsparsevec_algo.h:612).

Run (virtual 8-device CPU mesh):
    python tools/fuzz_containers.py --trials 50 --seed 0
Exit code != 0 on the first mismatch, with a reproduction line.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

try:
    from jax._src import xla_bridge as _xb
    _backend_up = bool(getattr(_xb, "_backends", None))
except Exception:
    _backend_up = False
if not _backend_up:
    xf = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xf:
        os.environ["XLA_FLAGS"] = (
            xf + " --xla_force_host_platform_device_count=8").strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import bitmagic_tpu as bm  # noqa: E402
import bitmagic_tpu.constants as C  # noqa: E402
from bitmagic_tpu.parallel.mesh import make_mesh  # noqa: E402
from bitmagic_tpu.parallel.sharded_sv import (  # noqa: E402
    ShardedFloatVector, ShardedRSCVector, ShardedSparseVector,
    ShardedStrSparseVector)
from bitmagic_tpu.serial import (IteratorDeserializer,  # noqa: E402
                                 SerialStreamIterator)
from bitmagic_tpu.sv.float_vector import FloatSparseVector  # noqa: E402
from bitmagic_tpu.sv.rsc_vector import RSCSparseVector  # noqa: E402
from bitmagic_tpu.sv.scanner import scanner  # noqa: E402
from bitmagic_tpu.sv.sparse_vector import SparseVector  # noqa: E402
from bitmagic_tpu.sv.str_vector import StrSparseVector  # noqa: E402

MESH = make_mesh(8)

_INT_DTYPES = [np.int8, np.uint8, np.int16, np.uint16,
               np.int32, np.uint32, np.int64, np.uint64]


def _hits(sbv):
    return np.asarray(sbv.to_bitvector().indices())


def _rand_int_values(rng, n, dtype):
    """Random values with adversarial distributions."""
    info = np.iinfo(dtype)
    mode = rng.integers(0, 4)
    if mode == 0:        # uniform over a small window (many collisions)
        lo = max(info.min, -5000)
        hi = min(info.max, 5000)
        v = rng.integers(lo, hi + 1, n)
    elif mode == 1:      # clustered runs (GAP-friendly)
        k = max(1, n // max(1, int(rng.integers(1, 200))))
        centers = rng.integers(max(info.min, -50), min(info.max, 50) + 1, k)
        v = np.repeat(centers, int(np.ceil(n / k)))[:n]
    elif mode == 2:      # dtype edges sprinkled into zeros
        v = np.zeros(n, dtype)
        if n:
            idx = rng.integers(0, n, max(1, n // 20))
            v[idx] = rng.choice(
                np.array([info.min, info.max, 0, 1,
                          info.max // 2, info.min // 2], dtype),
                idx.size)
        return v
    else:                # full-range uniform
        v = rng.integers(info.min, info.max, n, dtype=dtype,
                         endpoint=True)
        return v
    return v.astype(dtype)


def _queries_int(rng, vals, dtype):
    info = np.iinfo(dtype)
    qs = [0, 1, info.min, info.max,
          int(info.max) + 1, int(info.min) - 1, 1 << 70]
    if info.min < 0:
        qs += [-1, int(info.min) + 1]
    if vals.size:
        qs += [int(x) for x in
               rng.choice(vals, min(4, vals.size), replace=True)]
    return qs


def _fail(msg, seed, t):
    print(f"FAIL seed={seed} trial={t}: {msg}")
    sys.exit(1)


def trial_int(rng, seed, t):
    n = int(rng.choice([1, 7, 65_536, 65_537,
                        int(rng.integers(2, 400_000))]))
    dtype = _INT_DTYPES[rng.integers(0, len(_INT_DTYPES))]
    info = np.iinfo(dtype)
    vals = _rand_int_values(rng, n, dtype)
    nullable = bool(rng.integers(0, 2))
    nm = (rng.random(n) < rng.choice([0.0, 0.2, 0.95])) if nullable else None
    sv = SparseVector.from_array(vals, nullable=nullable, null_mask=nm)
    ssv = ShardedSparseVector.from_sparse_vector(sv, MESH)
    assigned = ~nm if nm is not None else np.ones(n, bool)
    v_obj = vals.astype(object)   # exact golden domain (uint64 > 2^63 safe)
    for q in _queries_int(rng, vals, dtype):
        in_range = info.min <= q <= info.max
        want_eq = (np.flatnonzero(assigned & (vals == dtype(q)))
                   if in_range else np.empty(0, np.int64))
        got = _hits(ssv.find_eq(q))
        if not np.array_equal(got, want_eq):
            _fail(f"int find_eq({q}) dtype={dtype} n={n}: "
                  f"{got.size} vs {want_eq.size}", seed, t)
        if ssv.find_eq_count(q) != want_eq.size:
            _fail(f"int find_eq_count({q})", seed, t)
        # scanner cross-check (oracle parity, independent of golden)
        sc = np.asarray(scanner.find_eq(sv, q).indices())
        if not np.array_equal(got, sc):
            _fail(f"sharded vs scanner find_eq({q})", seed, t)
        want_gt = np.flatnonzero(assigned & (v_obj > int(q)))
        got_gt = _hits(ssv.find_gt(q))
        if not np.array_equal(got_gt, want_gt):
            _fail(f"int find_gt({q}) dtype={dtype} n={n}", seed, t)
        sc_gt = np.asarray(scanner.find_gt(sv, q).indices())
        if not np.array_equal(got_gt, sc_gt):
            _fail(f"sharded vs scanner find_gt({q})", seed, t)
        want_le = np.flatnonzero(assigned & (v_obj <= int(q)))
        if not np.array_equal(_hits(ssv.find_le(q)), want_le):
            _fail(f"int find_le({q})", seed, t)
    # ne + range on a random in-range pair
    lo, hi = sorted(int(x) for x in
                    rng.integers(max(info.min, -6000),
                                 min(info.max, 6000) + 1, 2))
    want_rng = np.flatnonzero(assigned & (v_obj >= lo) & (v_obj <= hi))
    if not np.array_equal(_hits(ssv.find_range(lo, hi)), want_rng):
        _fail(f"int find_range({lo},{hi}) dtype={dtype} n={n}", seed, t)
    qv = int(vals[rng.integers(0, n)]) if n else 0
    want_ne = np.flatnonzero(assigned & (vals != dtype(qv)))
    if not np.array_equal(_hits(ssv.find_ne(qv)), want_ne):
        _fail(f"int find_ne({qv})", seed, t)
    # find_nonnegative (NULLs INCLUDED, reference no_mask semantics) +
    # find_first_eq (early-exit) + the external AND mask
    want_nn = np.flatnonzero((vals >= 0) | ~assigned)
    got_nn = np.asarray(scanner.find_nonnegative(sv).indices())
    if not np.array_equal(got_nn, want_nn):
        _fail(f"find_nonnegative dtype={dtype} n={n}", seed, t)
    want_first = np.flatnonzero(assigned & (vals == dtype(qv)))
    first = scanner.find_first_eq(sv, qv)
    if first != (int(want_first[0]) if want_first.size else -1):
        _fail(f"find_first_eq({qv}): {first}", seed, t)
    if n > 2:
        mlo, mhi = sorted(int(x) for x in rng.integers(0, n, 2))
        mask = bm.BitVector(C.ID_MAX48)
        mask.set_range(mlo, mhi)
        scanner.set_and_mask(mask)
        try:
            got_m = np.asarray(scanner.find_eq(sv, qv).indices())
            want_m = want_first[(want_first >= mlo) & (want_first <= mhi)]
            if not np.array_equal(got_m, want_m):
                _fail(f"masked find_eq({qv}) [{mlo},{mhi}]", seed, t)
            first_m = scanner.find_first_eq(sv, qv)
            if first_m != (int(want_m[0]) if want_m.size else -1):
                _fail(f"masked find_first_eq({qv})", seed, t)
        finally:
            scanner.reset_and_mask()
    # pipeline counts vs per-query
    batch = _queries_int(rng, vals, dtype)[:6]
    pipe = ssv.pipeline_find_eq(batch)
    single = [ssv.find_eq_count(q) for q in batch]
    if pipe != single:
        _fail(f"pipeline {pipe} vs single {single}", seed, t)
    # gather/decode (NULL positions are unassigned -> 0, reference
    # sparse_vector::gather semantics)
    if n:
        ids = rng.integers(0, n, min(64, n))
        g = np.asarray(ssv.gather(ids)).astype(object)
        want_g = np.where(assigned[ids], v_obj[ids], 0)
        if not np.array_equal(g, want_g):
            _fail("int gather", seed, t)
        gs = np.asarray(sv.gather(ids)).astype(object)
        if not np.array_equal(g, gs):
            _fail("int gather sharded vs single-chip", seed, t)
    # checkpoint round-trip (sampled)
    if rng.random() < 0.25:
        again = ShardedSparseVector.from_checkpoint(
            ssv.checkpoint_bytes(), MESH)
        if again.find_eq_count(qv) != ssv.find_eq_count(qv):
            _fail("int checkpoint", seed, t)


def trial_float(rng, seed, t):
    n = int(rng.choice([1, 3, 65_537, int(rng.integers(2, 200_000))]))
    dtype = np.float32 if rng.random() < 0.7 else np.float64
    base = rng.normal(0, 1000, n)
    specials = np.array([0.0, -0.0, np.inf, -np.inf, 1e-40, -1e-40,
                         np.finfo(dtype).max, np.finfo(dtype).tiny])
    idx = rng.integers(0, n, max(1, n // 10))
    base[idx] = rng.choice(specials, idx.size)
    vals = base.astype(dtype)
    fv = FloatSparseVector.from_array(vals, dtype=dtype)
    sfv = ShardedFloatVector.from_float_vector(fv, MESH)
    qs = [0.0, -0.0, 1.5, np.inf, -np.inf, float(np.finfo(dtype).max)]
    if n:
        qs += [float(x) for x in rng.choice(vals, min(3, n))]
    qs = [q for q in qs if not np.isnan(q)]
    for q in qs:
        want = np.flatnonzero(vals == dtype(q))   # ±0.0 equal, IEEE
        got = _hits(sfv.find_eq(q))
        if not np.array_equal(got, want):
            _fail(f"float find_eq({q!r}) dtype={dtype} n={n}", seed, t)
        sc = np.asarray(scanner.find_eq_float(fv, q).indices())
        if not np.array_equal(got, sc):
            _fail(f"sharded vs scanner find_eq_float({q!r})", seed, t)
        want_gt = np.flatnonzero(vals.astype(np.float64) > float(q))
        if not np.array_equal(_hits(sfv.find_gt(q)), want_gt):
            _fail(f"float find_gt({q!r}) dtype={dtype} n={n}", seed, t)
        want_le = np.flatnonzero(vals.astype(np.float64) <= float(q))
        if not np.array_equal(_hits(sfv.find_le(q)), want_le):
            _fail(f"float find_le({q!r})", seed, t)
        want_ge = np.flatnonzero(vals.astype(np.float64) >= float(q))
        if not np.array_equal(
                np.asarray(scanner.find_ge_float(fv, q).indices()), want_ge):
            _fail(f"find_ge_float({q!r})", seed, t)
    # closed + open range on a random query pair (bounds may be reversed)
    if len(qs) >= 2:
        lo = float(qs[int(rng.integers(0, len(qs)))])
        hi = float(qs[int(rng.integers(0, len(qs)))])
        v64, a, b = vals.astype(np.float64), min(lo, hi), max(lo, hi)
        got_r = np.asarray(scanner.find_range_float(fv, lo, hi).indices())
        if not np.array_equal(got_r, np.flatnonzero((v64 >= a) & (v64 <= b))):
            _fail(f"find_range_float({lo},{hi})", seed, t)
        got_o = np.asarray(
            scanner.find_range_float_unbounded(fv, lo, hi).indices())
        if not np.array_equal(got_o, np.flatnonzero((v64 > a) & (v64 < b))):
            _fail(f"find_range_float_unbounded({lo},{hi})", seed, t)
    if n:
        ids = rng.integers(0, n, min(32, n))
        g = np.asarray(sfv.gather(ids))
        if not np.array_equal(g.view(np.uint64) if dtype == np.float64
                              else g.view(np.uint32),
                              vals[ids].view(np.uint64) if dtype == np.float64
                              else vals[ids].view(np.uint32)):
            _fail("float gather (bitwise)", seed, t)


def _rand_strings(rng, n, max_len):
    alpha = "ACGT" if rng.random() < 0.4 else \
        "abcdefghijklmnopqrstuvwxyz0123456789_-"
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, max_len + 1))
        out.append("".join(rng.choice(list(alpha), ln)) if ln else "")
    return out


def trial_str(rng, seed, t):
    n = int(rng.choice([1, 5, 40_000, int(rng.integers(2, 80_000))]))
    max_len = int(rng.integers(1, 12))
    strs = _rand_strings(rng, n, max_len)
    ssv1 = StrSparseVector.from_strings(strs, max_str_size=max_len + 1)
    if rng.random() < 0.5:
        ssv1.remap()
    sss = ShardedStrSparseVector.from_str_vector(ssv1, MESH)
    qs = ["", "zzz_overlong_way_beyond_max" * 3]
    if n:
        qs += [strs[int(rng.integers(0, n))] for _ in range(3)]
    qs += ["".join(rng.choice(list("ACGTxyz"), 3)) for _ in range(2)]
    arr = np.array(strs)
    for q in qs:
        want = np.flatnonzero(arr == q)
        got = _hits(sss.find_eq_str(q))
        if not np.array_equal(got, want):
            _fail(f"str find_eq_str({q!r}) n={n} max_len={max_len}",
                  seed, t)
        if sss.find_eq_str_count(q) != want.size:
            _fail(f"str count({q!r})", seed, t)
    pipe = sss.pipeline_find_eq_str(qs)   # counts, like the int pipeline
    want_pipe = [int((arr == q).sum()) for q in qs]
    if pipe != want_pipe:
        _fail(f"str pipeline {pipe} vs {want_pipe}", seed, t)
    # prefix search: sharded vs single-host scanner vs golden
    prefs = ["".join(rng.choice(list("ACGTab0"), 2))]
    if n:
        s0 = strs[int(rng.integers(0, n))]
        if s0:
            prefs.append(s0[:int(rng.integers(1, len(s0) + 1))])
    for p in prefs:
        want = np.flatnonzero(np.char.startswith(arr, p)) if p else \
            np.flatnonzero(arr == "")
        got = _hits(sss.find_eq_str_prefix(p))
        if not np.array_equal(got, want):
            _fail(f"str prefix({p!r}) n={n}", seed, t)
        sc1 = np.asarray(scanner.find_eq_str_prefix(ssv1, p).indices())
        if not np.array_equal(got, sc1):
            _fail(f"sharded vs scanner prefix({p!r})", seed, t)
    if n:
        q = strs[int(rng.integers(0, n))]
        first = scanner.find_first_eq_str(ssv1, q)
        if first != int(np.flatnonzero(arr == q)[0]):
            _fail(f"find_first_eq_str({q!r}): {first}", seed, t)
    if n:
        ids = rng.integers(0, n, min(32, n))
        if sss.gather(ids) != [strs[i] for i in ids]:
            _fail("str gather", seed, t)


def trial_rsc(rng, seed, t):
    n = int(rng.choice([2, 65_537, int(rng.integers(2, 150_000))]))
    dtype = _INT_DTYPES[rng.integers(0, len(_INT_DTYPES))]
    info = np.iinfo(dtype)
    vals = _rand_int_values(rng, n, dtype)
    nm = rng.random(n) < rng.choice([0.3, 0.9, 0.999])
    sv = SparseVector.from_array(vals, nullable=True, null_mask=nm)
    rsc = RSCSparseVector.from_sparse_vector(sv)
    srsc = ShardedRSCVector.from_rsc(rsc, MESH)
    assigned = ~nm
    v_obj = vals.astype(object)
    qs = [0, 1, int(info.min), int(info.max)]
    if (~nm).any():
        qs.append(int(vals[~nm][0]))
    for q in qs:
        want = np.flatnonzero(assigned & (v_obj == q))
        if not np.array_equal(_hits(srsc.find_eq(q)), want):
            _fail(f"rsc find_eq({q}) dtype={dtype} n={n}", seed, t)
        want_gt = np.flatnonzero(assigned & (v_obj > q))
        if not np.array_equal(_hits(srsc.find_gt(q)), want_gt):
            _fail(f"rsc find_gt({q}) dtype={dtype}", seed, t)
    ids = rng.integers(0, n, min(48, n))
    got_vals, got_ok = srsc.gather(ids)
    if not np.array_equal(got_ok, ~nm[ids]):
        _fail("rsc gather not_null mask", seed, t)
    if not np.array_equal(got_vals[got_ok], vals[ids][~nm[ids]]):
        _fail("rsc gather values", seed, t)
    for gid in ids[:8]:
        tg = srsc.try_get(int(gid))
        want = None if nm[gid] else int(vals[gid])
        if (tg is None) != (want is None) or \
                (tg is not None and int(tg) != want):
            _fail(f"rsc try_get({gid}): {tg} vs {want}", seed, t)
    if srsc.count() != int(assigned.sum()):
        _fail("rsc count", seed, t)


def trial_sorted(rng, seed, t):
    n = int(rng.choice([1, 2, 50_000, int(rng.integers(2, 120_000))]))
    dtype = _INT_DTYPES[rng.integers(0, len(_INT_DTYPES))]
    info = np.iinfo(dtype)
    vals = np.sort(_rand_int_values(rng, n, dtype))
    v_obj = vals.astype(object)
    sv = SparseVector.from_array(vals)
    scanner.bind(sv, sorted=True)
    qs = [0, int(vals[0]), int(vals[-1]), int(vals[-1]) + 1,
          int(info.min), int(info.max)]
    qs += [int(x) for x in rng.choice(vals, min(5, n))]
    qs += [int(x) + 1 for x in rng.choice(vals, min(3, n))]
    for q in qs:
        want_lb = int(np.sum(v_obj < q))   # exact for any-int q
        got_lb = scanner.lower_bound(sv, q)
        if got_lb != want_lb:
            _fail(f"lower_bound({q}) dtype={dtype} n={n}: "
                  f"{got_lb} vs {want_lb}", seed, t)
        got_bf = scanner.bfind_eq(sv, q)
        present = want_lb < n and int(vals[want_lb]) == q
        if present:
            if got_bf < 0 or int(vals[got_bf]) != q:
                _fail(f"bfind_eq({q}) returned {got_bf}", seed, t)
        elif got_bf >= 0:
            _fail(f"bfind_eq({q}) false positive {got_bf}", seed, t)
    scanner.bind(sv, sorted=False)   # unbind
    # sorted STRING search (bind/lower_bound_str/bfind_eq_str)
    m = int(rng.choice([1, 3, 2_000, int(rng.integers(2, 20_000))]))
    strs = sorted(_rand_strings(rng, m, int(rng.integers(1, 10))))
    ssv1 = StrSparseVector.from_strings(strs, max_str_size=10)
    if rng.random() < 0.5:
        ssv1.remap()
    scanner.bind(ssv1, sorted=True)
    sq = [strs[int(rng.integers(0, m))] for _ in range(3)]
    sq += ["", "zz~~", strs[0], strs[-1], strs[-1] + "a",
           "overlong_beyond_max_str_size_" * 2]
    import bisect
    for q in sq:
        want_lb = bisect.bisect_left(strs, q)
        got_lb = scanner.lower_bound_str(ssv1, q)
        if got_lb != want_lb:
            _fail(f"lower_bound_str({q!r}) m={m}: {got_lb} vs {want_lb}",
                  seed, t)
        got_bf = scanner.bfind_eq_str(ssv1, q)
        present = want_lb < m and strs[want_lb] == q
        if present != (got_bf >= 0) or (present and strs[got_bf] != q):
            _fail(f"bfind_eq_str({q!r}) -> {got_bf}", seed, t)
    scanner.bind(ssv1, sorted=False)


def trial_stream(rng, seed, t):
    # up to 120 blocks so set_range spans can exceed RUN_MIN — blobs then
    # carry FULL_RUN records and fuzz the decode-then-apply route
    size = int(rng.integers(1, 120) * C.BITS_PER_BLOCK
               + rng.integers(0, C.BITS_PER_BLOCK))
    dens = rng.choice([5, 500, 20_000])
    ids_b = np.unique(rng.integers(0, size, dens))
    b = bm.BitVector.from_indices(ids_b, size)
    if rng.random() < 0.5:
        b.set_range(int(rng.integers(0, size // 2)),
                    int(rng.integers(size // 2, size)))
    if rng.random() < 0.5:
        b.optimize()
    level = int(rng.choice([0, 3, 5, 6]))
    blob = bm.serialize(b, level=level)
    # walk: record count sanity + decoded-words parity
    it = SerialStreamIterator(blob)
    cnt = 0
    while it.next():
        cnt += 1
        if rng.random() < 0.5:
            w = it.get_block_words()
            if w is not None and w.shape != (2048,):
                _fail("stream get_block_words shape", seed, t)
    a_strategy = C.BM_GAP if rng.random() < 0.5 else C.BM_BIT
    a = bm.BitVector.from_indices(
        np.unique(rng.integers(0, size, 3000)), size, strategy=a_strategy)
    for op, gold in ((C.SET_AND, lambda x, y: x & y),
                     (C.SET_OR, lambda x, y: x | y),
                     (C.SET_XOR, lambda x, y: x ^ y),
                     (C.SET_SUB, lambda x, y: x - y)):
        tgt = a.copy()
        IteratorDeserializer().deserialize_streamed(
            tgt, SerialStreamIterator(blob), op)
        if not tgt.equal(gold(a.copy(), b)):
            _fail(f"stream set op {op} size={size} level={level}",
                  seed, t)
    for op, gold in ((C.SET_COUNT_AND, lambda x, y: (x & y).count()),
                     (C.SET_COUNT_OR, lambda x, y: (x | y).count()),
                     (C.SET_COUNT_XOR, lambda x, y: (x ^ y).count()),
                     (C.SET_COUNT_SUB_AB, lambda x, y: (x - y).count()),
                     (C.SET_COUNT_SUB_BA, lambda x, y: (y - x).count())):
        got = IteratorDeserializer().deserialize_streamed(
            a.copy(), SerialStreamIterator(blob), op)
        want = gold(a.copy(), b)
        if got != want:
            _fail(f"stream count op {op}: {got} vs {want} "
                  f"size={size} level={level}", seed, t)
    # OperationDeserializer over BOTH wire formats (streamed, no
    # materialize) against the same goldens
    from bitmagic_tpu.serial.opdeser import OperationDeserializer
    from bitmagic_tpu.serial.refcodec import ref_serialize
    blobs = [blob, ref_serialize(b, level=6)]
    od = OperationDeserializer()
    for fmt, bb in zip(("bmt1", "ref"), blobs):
        for op, gold in ((C.SET_AND, lambda x, y: x & y),
                         (C.SET_OR, lambda x, y: x | y),
                         (C.SET_XOR, lambda x, y: x ^ y),
                         (C.SET_SUB, lambda x, y: x - y)):
            tgt = a.copy()
            od.deserialize(tgt, bb, op)
            if not tgt.equal(gold(a.copy(), b)):
                _fail(f"opdeser {fmt} set op {op} size={size} "
                      f"level={level}", seed, t)
        for op, gold in ((C.SET_COUNT_AND, lambda x, y: (x & y).count()),
                         (C.SET_COUNT_SUB_BA, lambda x, y: (y - x).count())):
            got = od.deserialize(a.copy(), bb, op)
            want = gold(a.copy(), b)
            if got != want:
                _fail(f"opdeser {fmt} count op {op}: {got} vs {want}",
                      seed, t)
    # range deserialize (selective decode) from both wire formats
    from bitmagic_tpu.serial import Deserializer
    from bitmagic_tpu.serial.refcodec import RefDeserializer
    lo = int(rng.integers(0, size))
    hi = int(rng.integers(lo, size))
    want_rng = ids_full = np.asarray(b.indices())
    want_rng = ids_full[(ids_full >= lo) & (ids_full <= hi)]
    part = Deserializer().deserialize_range(blob, lo, hi)
    if not np.array_equal(np.asarray(part.indices()), want_rng):
        _fail(f"bmt1 range deser [{lo},{hi}] level={level}", seed, t)
    rpart = RefDeserializer().deserialize_range(blobs[1], lo, hi)
    if not np.array_equal(np.asarray(rpart.indices()), want_rng):
        _fail(f"ref range deser [{lo},{hi}]", seed, t)
    # XOR-ref reference blobs through the streamed op deserializer
    # (reference deserialize_xor, src/bmserial.h:1093): build a ref
    # vector similar to b so the XOR filter actually fires
    from bitmagic_tpu.serial.refcodec import RefSerializer
    ref_ids = np.asarray(b.indices())
    if ref_ids.size:
        drop = rng.random(ref_ids.size) < 0.02
        extra = np.unique(rng.integers(0, size, 200))
        ref_ids = np.union1d(ref_ids[~drop], extra)
    bv_ref = bm.BitVector.from_indices(ref_ids, size)
    xser = RefSerializer(6, ref_vectors=[(0, bv_ref)])
    xblob = xser.serialize(b)
    odx = OperationDeserializer(ref_vectors=[(0, bv_ref)])
    for op, gold in ((C.SET_AND, lambda x, y: x & y),
                     (C.SET_OR, lambda x, y: x | y),
                     (C.SET_XOR, lambda x, y: x ^ y),
                     (C.SET_SUB, lambda x, y: x - y)):
        tgt = a.copy()
        odx.deserialize(tgt, xblob, op)
        if not tgt.equal(gold(a.copy(), b)):
            _fail(f"opdeser xor-ref set op {op} size={size}", seed, t)
    for op, gold in ((C.SET_COUNT_AND, lambda x, y: (x & y).count()),
                     (C.SET_COUNT_OR, lambda x, y: (x | y).count()),
                     (C.SET_COUNT_XOR, lambda x, y: (x ^ y).count()),
                     (C.SET_COUNT_SUB_AB, lambda x, y: (x - y).count()),
                     (C.SET_COUNT_SUB_BA, lambda x, y: (y - x).count())):
        got = odx.deserialize(a.copy(), xblob, op)
        want = gold(a.copy(), b)
        if got != want:
            _fail(f"opdeser xor-ref count {op}: {got} vs {want}", seed, t)


def trial_stress_serial(rng, seed, t):
    """The reference StressTest pattern (tests/stress/t.cpp:11378):
    randomized mutations mirrored into a numpy golden, with a FULL
    serialization round-trip + streamed op INSIDE the mutation loop."""
    from bitmagic_tpu.serial.opdeser import OperationDeserializer
    size = int(rng.integers(2, 80) * C.BITS_PER_BLOCK
               + rng.integers(1, C.BITS_PER_BLOCK))
    bv = bm.BitVector(size)
    gold = np.zeros(size, bool)
    od = OperationDeserializer()
    for step in range(int(rng.integers(6, 14))):
        act = rng.integers(0, 6)
        if act == 0:
            ids = rng.integers(0, size, int(rng.integers(1, 2000)))
            bv.set_many(ids); gold[ids] = True
        elif act == 1:
            ids = rng.integers(0, size, int(rng.integers(1, 2000)))
            bv.clear_many(ids); gold[ids] = False
        elif act == 2:
            lo = int(rng.integers(0, size)); hi = int(rng.integers(lo, size))
            val = bool(rng.integers(0, 2))
            bv.set_range(lo, hi, val); gold[lo:hi + 1] = val
        elif act == 3:
            bv.invert(); gold = ~gold
        elif act == 4:
            bv.optimize()
        else:
            i = int(rng.integers(0, size))
            bv.flip_bit(i); gold[i] ^= True
        if step % 3 == 2:
            level = int(rng.choice([0, 5, 6]))
            blob = bm.serialize(bv, level=level)
            back = bm.deserialize(blob)
            if not np.array_equal(back.to_numpy(size), gold):
                _fail(f"stress-serial round-trip step={step} "
                      f"level={level} size={size}", seed, t)
            if bv.count() != int(gold.sum()):
                _fail(f"stress-serial count step={step}", seed, t)
            other = bm.BitVector.from_indices(
                np.unique(rng.integers(0, size, 500)), size)
            got = od.deserialize(other.copy(), blob, C.SET_COUNT_AND)
            want = int((gold & other.to_numpy(size)).sum())
            if got != want:
                _fail(f"stress-serial blob-count step={step}: "
                      f"{got} vs {want}", seed, t)
    if not np.array_equal(bv.to_numpy(size), gold):
        _fail("stress-serial final content", seed, t)


def trial_refbridge(rng, seed, t):
    """Cross-check against the REFERENCE'S OWN codec (strongest oracle;
    skipped when the bridge can't build).  Random bit-vectors round-trip
    ours->reference and reference->ours; random signed i64 SVs likewise."""
    from bitmagic_tpu.serial import ref_sv, refcodec, refformat
    if not refformat.available():
        return
    size = int(rng.integers(1, 30) * C.BITS_PER_BLOCK
               + rng.integers(1, C.BITS_PER_BLOCK))
    dens = int(rng.choice([3, 800, 30_000]))
    ids = np.unique(rng.integers(0, size, dens))
    bv = bm.BitVector.from_indices(ids, size)
    if rng.random() < 0.4:
        bv.set_range(int(rng.integers(0, size // 2)),
                     int(rng.integers(size // 2, size)))
        ids = bv.indices()
    if rng.random() < 0.5:
        bv.optimize()
    # ours -> reference decoder (every compression level)
    blob = refcodec.ref_serialize(bv, level=int(rng.choice([0, 1, 2, 3,
                                                            4, 5, 6])))
    got = refformat.deserialize_reference_blob(blob)
    if not got.equal(bv):
        _fail(f"refbridge: reference failed to decode our blob "
              f"(size={size} bits={len(ids)})", seed, t)
    # reference encoder -> our decoder
    rblob = refformat.serialize_reference_blob(bv)
    back = refcodec.ref_deserialize(rblob)
    if not back.equal(bv):
        _fail(f"refbridge: our decoder mismatched on a reference blob "
              f"(size={size} bits={len(ids)})", seed, t)
    # signed i64 SV both directions
    n = int(rng.integers(1, 40_000))
    vals = _rand_int_values(rng, n, np.int64)
    nn = rng.random(n) < rng.choice([0.5, 0.95])
    vals = np.where(nn, vals, 0)
    sv = SparseVector.from_array(vals, nullable=True, null_mask=~nn)
    rv, rm = refformat.deserialize_reference_sv_i64(
        ref_sv.serialize_sv_blob(sv))
    if not (np.array_equal(rm[:n], nn)
            and np.array_equal(rv[:n][nn], vals[nn])):
        _fail(f"refbridge: signed SV ours->reference n={n}", seed, t)
    rblob = refformat.serialize_reference_sv_i64(vals, nn)
    sv2 = ref_sv.deserialize_sv_blob(rblob, np.int64)
    idx = np.flatnonzero(nn).astype(np.int64)
    if idx.size and not np.array_equal(
            np.asarray(sv2.gather(idx), np.int64), vals[idx]):
        _fail(f"refbridge: signed SV reference->ours n={n}", seed, t)


def trial_sbv(rng, seed, t):
    """ShardedBitVector surface vs a dense numpy golden: set algebra,
    digest-narrowed group ops, counts (per-shard-partial paths), rank /
    select on BOTH paths (fused + rs_index) incl. out-of-range ranks,
    get_bits, checkpoint round-trip, group_and_exchange."""
    from bitmagic_tpu.parallel.sharded import (ShardedBitVector,
                                               group_and_exchange,
                                               sharded_and_many,
                                               sharded_and_sub_count)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    nblk = int(rng.integers(1, 33))
    size = nblk * C.BITS_PER_BLOCK - int(rng.integers(0, C.BITS_PER_BLOCK))
    size = max(size, 1)

    def rand_mask():
        g = np.zeros(size, bool)
        mode = rng.integers(0, 3)
        if mode == 0:                                  # sparse uniform
            n = int(rng.integers(0, max(size // 50, 2)))
            g[rng.integers(0, size, n)] = True
        elif mode == 1:                                # dense runs
            for _ in range(int(rng.integers(1, 6))):
                lo = int(rng.integers(0, size))
                hi = min(size - 1, lo + int(rng.integers(0, size // 2 + 1)))
                g[lo:hi + 1] = True
        # mode 2: empty
        return g

    ga, gb = rand_mask(), rand_mask()
    a = ShardedBitVector.from_indices(np.flatnonzero(ga), size, MESH)
    b = ShardedBitVector.from_indices(np.flatnonzero(gb), size, MESH)

    if a.count() != int(ga.sum()) or a.count_shardmap() != int(ga.sum()):
        _fail(f"sbv count size={size}", seed, t)
    lo = int(rng.integers(0, size))
    hi = int(rng.integers(lo, size))
    if a.count_range(lo, hi) != int(ga[lo:hi + 1].sum()):
        _fail(f"sbv count_range [{lo},{hi}] size={size}", seed, t)

    for op, gold in (("&", ga & gb), ("|", ga | gb),
                     ("^", ga ^ gb), ("-", ga & ~gb)):
        got = {"&": a & b, "|": a | b, "^": a ^ b, "-": a - b}[op]
        if got.count() != int(gold.sum()):
            _fail(f"sbv op {op} size={size}", seed, t)

    # digest-narrowed group AND over 2-4 vectors with ragged survivors
    masks = [rand_mask() for _ in range(int(rng.integers(2, 5)))]
    vs = [ShardedBitVector.from_indices(np.flatnonzero(m), size, MESH)
          for m in masks]
    want_and = np.logical_and.reduce(masks)
    agg = sharded_and_many(vs)
    if not np.array_equal(_hits(agg), np.flatnonzero(want_and)):
        _fail(f"sbv sharded_and_many size={size} k={len(masks)}", seed, t)
    if sharded_and_sub_count(vs, [b]) != int((want_and & ~gb).sum()):
        _fail(f"sbv and_sub_count size={size}", seed, t)

    # rank/select on both paths; out-of-range ranks answer -1
    n_set = int(ga.sum())
    pos = np.flatnonzero(ga)
    ranks = np.asarray(
        [0, -3, n_set, n_set + 1, 2**40]
        + list(rng.integers(1, n_set + 1, 16) if n_set else []), np.int64)
    want_sel = np.full(ranks.shape, -1, np.int64)
    ok = (ranks >= 1) & (ranks <= n_set)
    if n_set:
        want_sel[ok] = pos[ranks[ok] - 1]
    got_fused = a.select_batch(ranks)
    if not np.array_equal(got_fused, want_sel):
        _fail(f"sbv select fused size={size} n={n_set}", seed, t)
    idx = a.build_rs_index()
    if not np.array_equal(a.select_batch(ranks), want_sel):
        _fail(f"sbv select indexed size={size} n={n_set}", seed, t)
    qids = rng.integers(0, size, 8)
    cum = np.cumsum(ga)
    if not np.array_equal(idx.rank_batch(qids),
                          cum[np.minimum(qids, size - 1)]):
        _fail(f"sbv rank size={size}", seed, t)

    # get_bits incl. out-of-range ids
    gq = np.concatenate([qids, [-1, size, size + 12345]]).astype(np.int64)
    want_bits = np.zeros(gq.shape, bool)
    inr = (gq >= 0) & (gq < size)
    want_bits[inr] = ga[gq[inr]]
    if not np.array_equal(a.get_bits(gq), want_bits):
        _fail(f"sbv get_bits size={size}", seed, t)

    # checkpoint round-trip (compressed BLOB)
    back = ShardedBitVector.from_checkpoint(a.checkpoint_bytes(), MESH)
    if not np.array_equal(_hits(back), pos):
        _fail(f"sbv checkpoint size={size}", seed, t)

    # vector-axis group exchange (count mode) vs golden
    k = 8
    gmasks = [rand_mask() for _ in range(k)]
    stack_h = np.stack([
        np.packbits(m, bitorder="little").copy() for m in
        (np.pad(g2, (0, nblk * C.BITS_PER_BLOCK - size)) for g2 in gmasks)
    ]).view(np.uint32).reshape(k, nblk, C.SET_BLOCK_SIZE)
    vmesh = Mesh(MESH.devices.reshape(-1), ("v",))
    stack = jax.device_put(stack_h, NamedSharding(vmesh, P("v", None, None)))
    cnt, _, traffic = group_and_exchange(stack, vmesh, "v", count_only=True)
    want_cnt = int(np.logical_and.reduce(gmasks).sum())
    if cnt != want_cnt:
        _fail(f"sbv group_and_exchange {cnt} != {want_cnt}", seed, t)


def trial_bounds(rng, seed, t):
    """48-bit address-space torture: random keep/clear/copy/set ranges,
    inserts/erases and logic ops on vectors whose ids span every scale up
    to 2^48, cross-checked against a pure-Python id-set golden (the ops
    were O(blocks-in-range) before round 4 — this family pins the
    narrowed formulation at every span size)."""
    TOP = C.ID_MAX48
    scales = [1 << 16, 1 << 32, 1 << 40, TOP]
    parts = [rng.integers(0, scales[int(rng.integers(0, len(scales)))],
                          int(rng.integers(1, 1500)))
             for _ in range(3)]
    ids = np.unique(np.concatenate(parts).astype(np.int64))
    strat = C.BM_GAP if rng.integers(0, 2) else C.BM_BIT
    bv = bm.BitVector.from_indices(ids, TOP, strategy=strat)
    gold = set(int(x) for x in ids)

    def rand_span(max_len=None):
        lo = int(rng.integers(0, TOP - 2))
        if max_len is None:
            hi = int(rng.integers(lo, TOP - 1))
        else:
            hi = min(lo + int(rng.integers(0, max_len)), TOP - 1)
        return lo, hi

    for _ in range(int(rng.integers(2, 6))):
        op = int(rng.integers(0, 7))
        if op == 0:
            lo, hi = rand_span()
            bv.keep_range(lo, hi)
            gold = {i for i in gold if lo <= i <= hi}
        elif op == 1:
            lo, hi = rand_span()
            bv.set_range(lo, hi, False)
            gold = {i for i in gold if not (lo <= i <= hi)}
        elif op == 2:
            lo, hi = rand_span(max_len=100_000)
            bv.set_range(lo, hi, True)
            gold |= set(range(lo, hi + 1))
        elif op == 3:
            src = bv.copy()
            lo, hi = rand_span()
            bv.copy_range(src, lo, hi)
            gold = {i for i in gold if lo <= i <= hi}
        elif op == 4:
            other_ids = np.unique(rng.integers(
                0, scales[int(rng.integers(0, len(scales)))],
                int(rng.integers(1, 800))).astype(np.int64))
            other = bm.BitVector.from_indices(other_ids, TOP)
            so = set(int(x) for x in other_ids)
            which = int(rng.integers(0, 4))
            if which == 0:
                bv &= other; gold &= so
            elif which == 1:
                bv |= other; gold |= so
            elif which == 2:
                bv ^= other; gold ^= so
            else:
                bv -= other; gold -= so
        elif op == 5:
            i = int(rng.integers(0, TOP - 1))
            val = bool(rng.integers(0, 2))
            bv.insert(i, val)
            gold = {x + 1 if x >= i else x for x in gold if x + 1 < TOP}
            if val:
                gold.add(i)
        else:
            i = int(rng.integers(0, TOP - 1))
            bv.erase(i)
            gold = {x - 1 if x > i else x for x in gold if x != i}
        if rng.integers(0, 3) == 0:
            bv.optimize()
    if sorted(gold) != bv.indices().tolist():
        _fail(f"bounds id-set mismatch ({len(gold)} golden)", seed, t)
    if len(gold) != bv.count():
        _fail("bounds count mismatch", seed, t)
    lo, hi = rand_span()
    want = sum(1 for i in gold if lo <= i <= hi)
    if bv.count_range(lo, hi) != want:
        _fail(f"bounds count_range({lo},{hi})", seed, t)
    if gold:
        srt = sorted(gold)
        bv.build_rs_index()
        probe = srt[int(rng.integers(0, len(srt)))]
        if bv.count_to(probe) != srt.index(probe) + 1:
            _fail(f"bounds count_to({probe})", seed, t)
        k = int(rng.integers(1, len(srt) + 1))
        if bv.select(k) != srt[k - 1]:
            _fail(f"bounds select({k})", seed, t)
    blob = bm.Serializer(6).serialize(bv)
    if not bm.Deserializer().deserialize(blob).equal(bv):
        _fail("bounds blob round-trip", seed, t)
    lo, hi = rand_span()
    win = bm.Deserializer().deserialize_range(blob, lo, hi)
    if win.indices().tolist() != sorted(i for i in gold if lo <= i <= hi):
        _fail(f"bounds range-deser({lo},{hi})", seed, t)


def trial_misc(rng, seed, t):
    """Randomized depth for the L3 algorithm family: Kleene truth tables,
    rank compressor round-trips, interval views, enumerator skip/rank
    walks, random_subset exactness, and per-plane SV insert/erase —
    all vs plain-Python goldens."""
    size = int(rng.integers(2, 40)) * C.BITS_PER_BLOCK
    n = int(rng.integers(1, 3000))
    ids_a = np.unique(rng.integers(0, size, n)).astype(np.int64)
    ids_b = np.unique(rng.integers(0, size, n)).astype(np.int64)
    a = bm.BitVector.from_indices(ids_a, size)
    b = bm.BitVector.from_indices(ids_b, size)
    sa, sb = set(ids_a.tolist()), set(ids_b.tolist())

    # Kleene: set random trinary values, check get/invert/and tables
    val_a, kn_a = bm.init_kleene(a.copy(), b.copy())
    probes = np.unique(rng.integers(0, size, 50).astype(np.int64))
    vals = rng.integers(-1, 2, probes.size)
    gold_tri = {}
    for p, v in zip(probes, vals):
        bm.set_value_kleene(val_a, kn_a, int(p), int(v))
        gold_tri[int(p)] = int(v)
    for p in probes:
        if bm.get_value_kleene(val_a, kn_a, int(p)) != gold_tri[int(p)]:
            _fail(f"kleene get({p})", seed, t)
    ik_ = kn_a.copy()
    iv_ = bm.invert_kleene(val_a.copy(), ik_)
    for p in probes:
        if bm.get_value_kleene(iv_, ik_, int(p)) != -gold_tri[int(p)]:
            _fail(f"kleene invert({p})", seed, t)
    # AND truth table on a second random trinary vector
    val_b, kn_b = bm.init_kleene(b.copy(), a.copy())
    av, ak = bm.and_kleene(val_a.copy(), kn_a.copy(), val_b, kn_b)
    table = {(1, 1): 1, (1, 0): 0, (0, 1): 0, (0, 0): 0,
             (1, -1): -1, (-1, 1): -1, (0, -1): -1, (-1, 0): -1,
             (-1, -1): -1}
    for p in probes[:20]:
        x = bm.get_value_kleene(val_a, kn_a, int(p))
        y = bm.get_value_kleene(val_b, kn_b, int(p))
        if bm.get_value_kleene(av, ak, int(p)) != table[(x, y)]:
            _fail(f"kleene and({p}): {x},{y}", seed, t)

    # rank compressor round-trip: compress by index then decompress
    idx_bv = bm.BitVector.from_indices(ids_b, size)
    comp = bm.rank_compress.compress(a, idx_bv)
    dec = bm.rank_compress.decompress(comp, idx_bv)
    want_dec = sorted(sa & sb)
    if dec.indices().tolist() != want_dec:
        _fail("rank_compress round-trip", seed, t)

    # intervals vs golden runs
    srt = sorted(sa)
    gold_runs = []
    for i in srt:
        if gold_runs and gold_runs[-1][1] == i - 1:
            gold_runs[-1][1] = i
        else:
            gold_runs.append([i, i])
    from bitmagic_tpu.algo.intervals import count_intervals, intervals as _iv
    got_runs = _iv(a).tolist()
    if got_runs != gold_runs:
        _fail("intervals runs", seed, t)
    want_ci = (2 * len(gold_runs) + 1
               - (1 if gold_runs and gold_runs[0][0] == 0 else 0)
               - (1 if gold_runs and gold_runs[-1][1] == size - 1 else 0))         if gold_runs else 1
    if count_intervals(a) != want_ci:
        _fail("count_intervals", seed, t)

    # enumerator skip / skip_to_rank walks
    if srt:
        e = a.get_enumerator(0)
        k = int(rng.integers(0, len(srt)))
        e.skip(k)
        if e.value() != srt[k]:
            _fail(f"enumerator skip({k})", seed, t)
        pos = int(rng.integers(0, size))
        e2 = a.get_enumerator(0)
        ok = e2.go_to(pos)
        nxt = [i for i in srt if i >= pos]
        if bool(ok and e2.valid()) != bool(nxt) or (nxt and e2.value() != nxt[0]):
            _fail(f"enumerator go_to({pos})", seed, t)

    # random_subset: exact count, subset property
    if srt:
        want_n = int(rng.integers(1, len(srt) + 1))
        sub = bm.random_subset(a, want_n, seed=seed)
        sids = sub.indices().tolist()
        if len(sids) != want_n or not set(sids) <= sa:
            _fail(f"random_subset({want_n})", seed, t)

    # SV element insert/erase at random (incl. block-edge) positions
    m = int(rng.integers(1, 400))
    vals_sv = rng.integers(0, 2**16, m).astype(np.uint32)
    sv = SparseVector.from_array(vals_sv)
    gold_list = vals_sv.tolist()
    for _ in range(int(rng.integers(1, 4))):
        i = int(rng.integers(0, len(gold_list) + 1)) if gold_list else 0
        if rng.integers(0, 2) and gold_list:
            i = min(i, len(gold_list) - 1)
            sv.erase(i)
            gold_list.pop(i)
        else:
            v = int(rng.integers(0, 2**16))
            sv.insert(i, v)
            gold_list.insert(i, v)
    if sv.to_numpy()[:len(gold_list)].tolist() != gold_list:
        _fail("sv insert/erase", seed, t)


def trial_corrupt(rng, seed, t):
    """Adversarial decode robustness: corrupt/truncate VALID blobs of
    every format and decode with a consistency contract — either a clean
    exception (ValueError/IndexError family) or an internally consistent
    result (count <= size, count == len(indices)); never a hang, OOM, or
    count() > size (the round-5 hardening findings)."""
    import signal

    size = int(rng.integers(1, 24)) * C.BITS_PER_BLOCK
    ids = np.unique(rng.integers(0, size, int(rng.integers(10, 4000))))
    bv = bm.BitVector.from_indices(ids, size)
    if rng.random() < 0.5:
        lo = int(rng.integers(0, size // 2))
        bv.set_range(lo, int(rng.integers(lo, size - 1)))
    if rng.random() < 0.5:
        bv.optimize()
    from bitmagic_tpu.serial.refcodec import RefDeserializer, ref_serialize
    sv = bm.SparseVector.from_array(
        rng.integers(0, 1 << 16, 2000).astype(np.uint32))
    from bitmagic_tpu.serial.sv_serial import (SparseVectorDeserializer,
                                               SparseVectorSerializer)
    from bitmagic_tpu.serial import ref_sv
    corpora = [
        (bm.serialize(bv), lambda b: bm.deserialize(b)),
        (ref_serialize(bv, level=int(rng.choice([0, 4, 6]))),
         lambda b: RefDeserializer().deserialize(b)),
        (SparseVectorSerializer().serialize(sv),
         lambda b: SparseVectorDeserializer().deserialize(b)),
        (ref_sv.serialize_sv_blob(sv),
         lambda b: ref_sv.deserialize_sv_blob(b)),
    ]
    blob, decode = corpora[int(rng.integers(0, len(corpora)))]
    blob = bytearray(blob)
    mode = int(rng.integers(0, 3))
    if mode == 0 and len(blob) > 2:              # truncate
        blob = blob[:int(rng.integers(1, len(blob)))]
    elif mode == 1:                              # flip random bytes
        for _ in range(int(rng.integers(1, 6))):
            blob[int(rng.integers(0, len(blob)))] ^= int(
                rng.integers(1, 256))
    else:                                        # splice random garbage
        at = int(rng.integers(0, len(blob)))
        blob[at:at] = bytes(rng.integers(0, 256, 16, dtype=np.uint8))

    def _alarm(signum, frame):
        raise TimeoutError("decode hang")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(20)
    try:
        got = decode(bytes(blob))
    except TimeoutError:
        _fail(f"corrupt decode HANG (mode {mode})", seed, t)
    except Exception:
        return                                   # clean rejection
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    # accepted decode: must be internally consistent
    if isinstance(got, bm.BitVector):
        c = got.count()
        if not (0 <= c <= got.size):
            _fail(f"corrupt decode count {c} > size {got.size}", seed, t)
        if c <= 1 << 22 and c != got.indices().size:
            _fail("corrupt decode count/indices mismatch", seed, t)
    else:
        n = len(got)
        if not (0 <= n <= 1 << 34):
            _fail(f"corrupt decode size {n}", seed, t)


TRIALS = [trial_int, trial_float, trial_str, trial_rsc, trial_sorted,
          trial_stream, trial_refbridge, trial_sbv, trial_bounds,
          trial_misc, trial_stress_serial, trial_corrupt]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--family", type=str, default=None,
                    help="int|float|str|rsc|sorted|stream|refbridge|sbv|"
                         "bounds|misc|stress_serial")
    ap.add_argument("--soak", action="store_true",
                    help="long soak: EVERY family x --trials trials "
                         "(>=200 recommended), seeds logged for replay "
                         "(the reference StressTest shape)")
    args = ap.parse_args()
    fams = {f.__name__.removeprefix("trial_"): f for f in TRIALS}
    if args.soak:
        n = max(args.trials, 200)
        for name, fn in fams.items():
            for t in range(n):
                seed = args.seed + t
                rng = np.random.default_rng(seed)
                fn(rng, seed, t)
            print(f"soak family {name}: {n} trials ok "
                  f"(seeds {args.seed}..{args.seed + n - 1})", flush=True)
        print(f"SOAK PASSED: {len(fams)} families x {n} trials")
        return
    for t in range(args.trials):
        seed = args.seed + t
        rng = np.random.default_rng(seed)
        fn = fams[args.family] if args.family else \
            TRIALS[int(rng.integers(0, len(TRIALS)))]
        fn(rng, seed, t)
        print(f"trial {t} ({fn.__name__}) ok", flush=True)
    print(f"ALL {args.trials} TRIALS PASSED")


if __name__ == "__main__":
    main()
