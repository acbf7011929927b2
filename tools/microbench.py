"""Microbenchmark harness mirroring the reference's tests/perf families.

The reference ships a perf binary (tests/perf/perf.cpp, REPEATS=1200) that
times every subsystem with chrono_taker: memcpy baseline, popcounts, the
logic-op family, enumerators, find/select/rank, SV access, scanner and
aggregator runs, serialization.  bench.py covers the five judged BASELINE
configs; this tool is the breadth equivalent — one timing line per family,
all through the PUBLIC container APIs.

Run on the real chip:      python tools/microbench.py
Run on the CPU backend:    python tools/microbench.py --cpu
Subset:                    python tools/microbench.py --only count,logic

Timing discipline: memcpy/count use bench.timeit's slope method (repeat
loop inside one jitted fori_loop, RTT-free).  The container-API families
time whole public calls synchronized by a SCALAR result fetch (min of 5),
so through the axon tunnel they include one dispatch+RTT (~29 ms) — they
measure the API, not the bare kernel; read them relative to each other.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
ap.add_argument("--only", type=str, default=None,
                help="comma list: memcpy,count,logic,enum,select,sv,"
                     "scanner,agg,serial")
ap.add_argument("--blocks", type=int, default=768,
                help="vector size in 64K blocks (default ~50M bits)")
args = ap.parse_args()

import jax  # noqa: E402

if args.cpu:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (timeit/timeit_stats, slope-method timing)
import bitmagic_tpu as bm  # noqa: E402

SIZE = args.blocks * 65536
MB = SIZE / 8 / 1e6
rng = np.random.default_rng(1234)


def _mk(density=0.5):
    ids = np.unique(rng.integers(0, SIZE, int(SIZE * density // 16)))
    bv = bm.BitVector.from_indices(ids.astype(np.int64), SIZE)
    return bv


def _report(name, secs, unit_val, unit):
    print(f"[{name:8s}] {secs * 1e3:8.3f} ms  -> {unit_val:10.2f} {unit}")


def fam_memcpy():
    # XOR-by-salt before the reduction forces a full pass per iteration
    # (sum(p + salt) would algebraically simplify to sum(p) + salt*N and
    # the whole loop constant-folds — observed on the real chip)
    pool = bench.make_pool(rng, args.blocks)
    pool_gb = args.blocks * 2048 * 4 / 1e9

    def step(salt, p):
        return jnp.sum(p ^ salt, dtype=jnp.uint32) + salt

    t = bench.timeit(step, pool, iters=10)
    _report("stream", t, pool_gb / t, "GB/s")       # one full read


def fam_count():
    a = _mk()
    a._flush()
    pool = a._pool

    def step(salt, p):
        return jnp.sum(jax.lax.population_count(p ^ salt),
                       dtype=jnp.uint32) + salt

    t = bench.timeit(step, pool, iters=10)
    _report("count", t, MB / 1e3 / t, "GB/s")


def fam_logic():
    # synchronize on a SCALAR count fetch (one RTT), never the result
    # pool — fetching the pool would time the tunnel transfer, and
    # block_until_ready does not actually wait through the tunnel
    # (see CLAUDE.md / bench.py).  Numbers include one dispatch+RTT;
    # bench.py's slope method is the RTT-free reference for config 1.
    a, b = _mk(), _mk()
    for name, fn in [("and", lambda: (a & b).count()),
                     ("or", lambda: (a | b).count()),
                     ("xor", lambda: (a ^ b).count()),
                     ("sub", lambda: (a - b).count()),
                     ("and_cnt", lambda: bm.count_and(a, b)),
                     ("or_cnt", lambda: bm.count_or(a, b))]:
        for _ in range(2):
            fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        _report(name, t, 2 * MB / 1e3 / t, "GB/s")


def fam_enum():
    a = _mk(0.03)
    n = a.count()
    for _ in range(2):
        a.indices()
    t0 = time.perf_counter()
    ids = a.indices()
    t = time.perf_counter() - t0
    _report("enum", t, n / 1e6 / t, "Mint/s")


def fam_select():
    a = _mk()
    a.build_rs_index()
    total = a.count()
    ranks = rng.integers(1, total, 100_000).astype(np.int64)
    rs = a.build_rs_index()
    for _ in range(2):
        rs.select_batch(ranks[:100])
    t0 = time.perf_counter()
    rs.select_batch(ranks)
    t = time.perf_counter() - t0
    _report("select", t, len(ranks) / 1e6 / t, "Mq/s")
    probes = rng.integers(0, SIZE, 100_000).astype(np.int64)
    t0 = time.perf_counter()
    rs.rank_batch(probes)
    t = time.perf_counter() - t0
    _report("rank", t, len(probes) / 1e6 / t, "Mq/s")


def fam_sv():
    n = SIZE // 32
    vals = rng.integers(0, 2**20, n).astype(np.uint32)
    sv = bm.SparseVector.from_array(vals)
    ids = rng.integers(0, n, 1_000_000).astype(np.int64)
    for _ in range(2):
        sv.gather(ids[:1000])
    t0 = time.perf_counter()
    sv.gather(ids)
    t = time.perf_counter() - t0
    _report("sv_gath", t, len(ids) / 1e6 / t, "Melem/s")
    t0 = time.perf_counter()
    sv.decode(0, n)
    t = time.perf_counter() - t0
    _report("sv_dec", t, n / 1e6 / t, "Melem/s")


def fam_scanner():
    n = SIZE // 32
    vals = (rng.integers(0, 64, n) * 7).astype(np.uint32)
    sv = bm.SparseVector.from_array(vals)
    sc = bm.SparseVectorScanner()
    for _ in range(2):
        sc.find_eq(sv, 21)
    t0 = time.perf_counter()
    r = sc.find_eq(sv, 21)
    r.count()
    t = time.perf_counter() - t0
    _report("scan_eq", t, n / 1e9 / t, "Gelem/s")
    t0 = time.perf_counter()
    r = sc.find_gt(sv, 200)
    r.count()
    t = time.perf_counter() - t0
    _report("scan_gt", t, n / 1e9 / t, "Gelem/s")


def fam_agg():
    k = 50
    vs = [_mk(0.2) for _ in range(6)] * (k // 6)
    agg = bm.Aggregator()
    for _ in range(2):
        agg.combine_or(vs[:4])
    t0 = time.perf_counter()
    r = agg.combine_and_sub(vs[: k // 2], vs[k // 2:])
    r.count()
    t = time.perf_counter() - t0
    _report("agg", t, k * MB / 1e3 / t, "GB/s")


def fam_serial():
    a = _mk(0.12)
    blob = None
    for lvl in (1, 4, 6):
        s = bm.Serializer(lvl)
        for _ in range(2):
            blob = s.serialize(a)
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            blob = s.serialize(a)
        t = (time.perf_counter() - t0) / n
        _report(f"ser_L{lvl}", t, MB / t / 1e3, "GB/s")
        print(f"          blob {len(blob) / 1e3:.1f} KB")
    d = bm.Deserializer()
    for _ in range(2):
        d.deserialize(blob)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        d.deserialize(blob)
    t = (time.perf_counter() - t0) / n
    _report("deser_L6", t, MB / t / 1e3, "GB/s")


FAMS = {"memcpy": fam_memcpy, "count": fam_count, "logic": fam_logic,
        "enum": fam_enum, "select": fam_select, "sv": fam_sv,
        "scanner": fam_scanner, "agg": fam_agg, "serial": fam_serial}


def main():
    only = args.only.split(",") if args.only else list(FAMS)
    print(f"devices: {jax.devices()}  size: {SIZE / 1e6:.0f} Mbit")
    for name in only:
        FAMS[name]()


if __name__ == "__main__":
    main()
