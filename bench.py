"""Benchmark harness — BASELINE.md configs on the real TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Per-config detail goes to stderr.

Headline metric: logical-op throughput (GB/s/chip) on BASELINE config 1
(bvsetalgebra: AND + count over two 100M-bit vectors).  vs_baseline is the
ratio against the same operation on the host CPU via numpy (the stand-in for
the reference's single-node SIMD path until the reference perf harness is
built on this host; see BASELINE.md action items).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache (same dir as tests/conftest.py): tunnel
# up-windows can be shorter than a cold-compile full run, so repeated bench
# attempts must re-use compiled programs — each retry then makes forward
# progress instead of starting the ~20-40 s/shape AOT from scratch.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/bitmagic_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

WORDS = 2048
N_BLOCKS = 1536            # ~100.6M bits
BYTES_PER_POOL = N_BLOCKS * WORDS * 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit_stats(fn, *args, iters=20, warmup=2, passes=3):
    """timeit returning (min, median) over ``passes`` slope measurements."""
    ts = [timeit(fn, *args, iters=iters, warmup=(warmup if i == 0 else 0))
          for i in range(passes)]
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def timeit(fn, *args, iters=20, warmup=2):
    """Time fn with the repeat loop INSIDE one jitted program: the remote
    (axon-tunneled) device makes per-call host timing unreliable, so we chain
    `iters` data-dependent evaluations in one fori_loop kernel, fetch the
    final scalar, and divide.

    fn must have signature fn(salt, *args) -> int-like scalar; the salt input
    forces a true dependency chain (no loop hoisting / elision)."""

    def make(n_iters):
        @jax.jit
        def repeated(*a):
            def body(i, salt):
                return fn(salt, *a).astype(jnp.uint32) & jnp.uint32(1)
            return jax.lax.fori_loop(0, n_iters, body, jnp.uint32(0))
        return repeated

    # slope method: the tunnel adds a large fixed RTT per fetch; run the
    # chained loop at two iteration counts and divide the difference;
    # tunnel RTT jitter is removed by taking the min of several passes.
    lo_fn, hi_fn = make(iters), make(5 * iters)
    for _ in range(warmup):
        np.asarray(lo_fn(*args))
        np.asarray(hi_fn(*args))
    t_lo = t_hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(lo_fn(*args))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(hi_fn(*args))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return max(t_hi - t_lo, 1e-9) / (4 * iters)


def make_pool(rng, nblk=N_BLOCKS, density=0.5):
    if density >= 0.5:
        w = rng.integers(0, 2**32, (nblk, WORDS), dtype=np.uint64).astype(np.uint32)
    else:
        w = (rng.random((nblk, WORDS)) < density).astype(np.uint32)
    return jnp.asarray(w)


# ---------------------------------------------------------------- config 1
def bench_logical(rng):
    a, b = make_pool(rng), make_pool(rng)

    def and_count(salt, a, b):
        ax = a ^ salt.astype(jnp.uint32)
        return jnp.sum(jax.lax.population_count(ax & b), dtype=jnp.uint32)

    t_count, t_count_med = timeit_stats(and_count, a, b, iters=100,
                                        passes=5)

    # materializing AND: carry the full result array through the loop so
    # every iteration writes all 12.6 MB (no DCE/slicing possible); slope
    # method over two iteration counts removes the fixed fetch RTT
    def make_mat(n_iters):
        @jax.jit
        def rep_mat(a, b):
            def body(i, acc):
                # roll makes the op non-pointwise: fetching one output element
                # then requires the whole loop (XLA narrows pointwise loops to
                # the fetched element); '+' avoids XOR-algebra telescoping
                return (jnp.roll(acc, 1, axis=1) & b) + jnp.uint32(i + 1)
            return jax.lax.fori_loop(0, n_iters, body, a)[0, 0]
        return rep_mat

    lo_fn, hi_fn = make_mat(100), make_mat(500)
    np.asarray(lo_fn(a, b)); np.asarray(hi_fn(a, b))
    t_lo = t_hi = float("inf")
    for _ in range(3):            # min-of-3: tunnel RTT jitter can exceed
        t0 = time.perf_counter()  # the slope and produce absurd rates
        np.asarray(lo_fn(a, b))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(hi_fn(a, b))
        t_hi = min(t_hi, time.perf_counter() - t0)
    # physics floor: 400 iterations cannot beat 10 TB/s of HBM traffic.
    # If tunnel jitter swallowed the slope (below the floor), the number is
    # NOT a measurement — report it as unmeasured rather than the cap.
    floor = 400 * 3 * BYTES_PER_POOL / 10e12
    slope = t_hi - t_lo
    gb = 2 * BYTES_PER_POOL / 1e9
    gbps_count = gb / t_count
    gbps_med = gb / t_count_med
    if slope <= floor:
        gbps_mat = None
        log(f"[1 bvsetalgebra] AND+count: {t_count*1e3:.3f} ms -> "
            f"{gbps_count:.1f} GB/s (median {gbps_med:.1f}); "
            f"AND materialize: UNMEASURED (slope {slope*1e3:.2f} ms below "
            f"jitter floor {floor*1e3:.2f} ms)")
    else:
        t_mat = slope / 400
        gbps_mat = (3 * BYTES_PER_POOL / 1e9) / t_mat
        log(f"[1 bvsetalgebra] AND+count: {t_count*1e3:.3f} ms -> "
            f"{gbps_count:.1f} GB/s (median {gbps_med:.1f}); "
            f"AND materialize: {t_mat*1e3:.3f} ms -> {gbps_mat:.1f} GB/s")
    return gbps_count, gbps_med, gbps_mat


def bench_shift(rng):
    """Device-side per-row shift kernel (ops/blockops.shift_rows_up1) —
    the round-4 shift/insert/erase rewrite's hot op, first measured
    on-chip in round 5 (VERDICT r4 weak #1)."""
    from bitmagic_tpu.ops import blockops
    rows = make_pool(rng)
    carry = jnp.zeros(N_BLOCKS, jnp.uint32)

    def sh(salt, rows, carry):
        out = blockops.shift_rows_up1(rows ^ salt.astype(jnp.uint32), carry)
        return jnp.sum(jax.lax.population_count(out), dtype=jnp.uint32)

    t, t_med = timeit_stats(sh, rows, carry, iters=100, passes=5)
    gb = BYTES_PER_POOL / 1e9
    log(f"[1c shift] shift_r1+count over {N_BLOCKS} blocks: "
        f"{t*1e3:.3f} ms -> {gb/t:.1f} GB/s (median {gb/t_med:.1f})")
    return gb / t, gb / t_med


def bench_logical_cpu(rng):
    """Baseline = the REFERENCE C++ implementation's measured count_and
    throughput on this host (tools/make_fixtures.cpp, g++ -O3 -march=native
    against /root/reference headers), recorded in tests/fixtures/timing.txt.
    Falls back to a numpy measurement if fixtures are absent."""
    import os
    timing = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "fixtures", "timing.txt")
    if os.path.exists(timing):
        for line in open(timing):
            if line.startswith("count_and_gbps"):
                gbps = float(line.split()[1])
                log(f"[baseline] reference C++ count_and: {gbps:.2f} GB/s "
                    f"(measured, AVX-native build)")
                return gbps
    a = rng.integers(0, 2**32, (N_BLOCKS, WORDS), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, (N_BLOCKS, WORDS), dtype=np.uint64).astype(np.uint32)
    popcount = getattr(np, "bitwise_count", None)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        x = a & b
        total = popcount(x).sum() if popcount else np.unpackbits(
            x.view(np.uint8)).sum()
    dt = (time.perf_counter() - t0) / iters
    gbps = 2 * BYTES_PER_POOL / 1e9 / dt
    log(f"[baseline cpu] numpy AND+count: {dt*1e3:.2f} ms -> {gbps:.2f} GB/s")
    return gbps


# ---------------------------------------------------------------- config 2
def bench_rank_select(rng):
    """The library's wave-descent select kernel (ops/select.py): gathers a
    256 B wave table row + one 128 B wave per query instead of the 8 KB
    block row."""
    from bitmagic_tpu.ops.select import global_wave_prefix, select_flat
    pool = make_pool(rng, density=0.5)
    gwc = global_wave_prefix(pool)
    n_q = 1_000_000
    ranks = jnp.asarray(
        rng.integers(1, N_BLOCKS * WORDS * 16, n_q).astype(np.int32))

    def sel(salt, pool, gwc, ranks):
        pos = select_flat(pool, gwc, ranks + (salt & 1).astype(jnp.int32))
        return jnp.sum(pos.astype(jnp.uint32))

    t, t_med = timeit_stats(sel, pool, gwc, ranks, passes=5)
    qps = n_q / t
    log(f"[2 rank-select] {n_q} select1 queries (wave descent): "
        f"{t*1e3:.2f} ms -> {qps/1e6:.1f} Mq/s (median {n_q/t_med/1e6:.1f})")
    return qps, n_q / t_med


# ---------------------------------------------------------------- config 3
def bench_aggregator(rng):
    K, nblk = 200, 128          # 200 vectors x 8.4M bits
    stack = jnp.asarray(
        rng.integers(0, 2**32, (K, nblk, WORDS), dtype=np.uint64).astype(np.uint32))

    def and_sub_200(salt, stack):
        # unrolled like the library's _agg_kernel; EVERY operand is salted
        # or XLA reassociates the AND chain and hoists it out of the
        # timing loop (fori_loop variant measured 473 GB/s, 1.26x low)
        s = salt.astype(jnp.uint32)
        acc = stack[0] ^ s
        for i in range(1, K // 2):
            acc = acc & (stack[i] ^ s)
        for i in range(K // 2, K):
            acc = acc & ~(stack[i] ^ s)
        return jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)

    # 9 passes + iters=25: config 3 showed the widest median/best spread of
    # any config in round 2 — at iters=5 the slope (~6 ms) sat inside the
    # tunnel RTT jitter band; 25 chained iterations make the slope dominate
    # (the fori_loop body compiles once, so the extra runtime is ~1 s total)
    t, t_med = timeit_stats(and_sub_200, stack, iters=25, passes=9)
    gb = K * nblk * WORDS * 4 / 1e9
    log(f"[3 aggregator] fused AND-SUB over {K} vectors ({gb:.2f} GB): "
        f"{t*1e3:.2f} ms -> {gb/t:.1f} GB/s (median {gb/t_med:.1f})")
    return gb / t, gb / t_med


# ---------------------------------------------------------------- config 4
def bench_scan(rng):
    n_planes, nblk = 32, 512    # 33.5M elements
    planes = jnp.asarray(
        rng.integers(0, 2**32, (n_planes, nblk, WORDS), dtype=np.uint64)
        .astype(np.uint32))

    def scan_eq(salt, planes, value):
        # salt must perturb EVERY value bit, or XLA hoists the
        # salt-independent plane selects out of the timing loop
        value = value ^ (salt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        acc = jnp.full((nblk, WORDS), jnp.uint32(0xFFFFFFFF))
        for s in range(n_planes):
            bit = (value >> jnp.uint32(s)) & jnp.uint32(1)
            acc = jnp.where(bit, acc & planes[s], acc & ~planes[s])
        return jnp.sum(jax.lax.population_count(acc), dtype=jnp.uint32)

    t, t_med = timeit_stats(scan_eq, planes, jnp.uint32(123456789),
                            iters=25, passes=5)
    n_elem = nblk * WORDS * 32
    log(f"[4 sv-scan] find_eq over {n_elem/1e6:.0f}M u32 elements: "
        f"{t*1e3:.2f} ms -> {n_elem/t/1e9:.2f} Gelem/s "
        f"({n_planes*nblk*WORDS*4/1e9/t:.1f} GB/s, "
        f"median {n_elem/t_med/1e9:.2f} Gelem/s)")
    return n_elem / t, n_elem / t_med


def bench_scan_pipeline(rng):
    """Library-path bulk search: a prepared scanner pipeline counts whole
    value batches, one Pallas sweep per batch with the value batch resident
    in VMEM (arena read ONCE per batch, not once per value)."""
    from bitmagic_tpu.sv.sparse_vector import SparseVector
    from bitmagic_tpu.sv.scanner import scanner
    n = 16_000_000
    vals = rng.integers(0, 1 << 20, n).astype(np.uint32)
    sv = SparseVector.from_array(vals, nullable=True)
    prep = scanner.prepare_pipeline(sv)
    queries = list(rng.integers(1, 1 << 20, 256))
    prep.counts(queries)                                         # warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        prep.counts(queries)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt, dt_med = ts[0], ts[len(ts) // 2]
    rate, rate_med = len(queries) * n / dt, len(queries) * n / dt_med
    log(f"[4b scan-pipeline] {len(queries)} find_eq counts over "
        f"{n/1e6:.0f}M elems: {dt_med*1e3:.1f} ms -> "
        f"{rate_med/1e9:.1f} Gsearch-elem/s (best {rate/1e9:.1f})")
    return rate, rate_med


# ---------------------------------------------------------------- config 5
def bench_serialization(rng):
    from bitmagic_tpu import BitVector
    from bitmagic_tpu.serial import Serializer, Deserializer
    from bitmagic_tpu.serial.opdeser import OperationDeserializer
    import bitmagic_tpu.constants as C

    size = 512 * C.BITS_PER_BLOCK           # ~33.5M bits
    idx = np.unique(rng.integers(0, size, size // 100))
    bv = BitVector.from_indices(idx, size)
    bv.set_range(2 * C.BITS_PER_BLOCK, 4 * C.BITS_PER_BLOCK - 1)
    bv.optimize()
    def best(fn, n=21):
        fn()                                # warm-up: jits + device fetch
        b = float("inf")
        r = None
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            b = min(b, time.perf_counter() - t0)
        return b, r
    ser = Serializer(6)
    _, blob = best(lambda: ser.serialize(bv))
    t_ser, _ = best(lambda: ser.serialize(bv))
    t_deser, back = best(lambda: Deserializer().deserialize(blob))
    assert back.equal(bv)
    raw_mb = size / 8 / 1e6
    od = OperationDeserializer()
    t_op, cnt = best(
        lambda: od.deserialize(bv, blob, C.SET_COUNT_AND))  # COUNT_* are
    # read-only on the target — no defensive copy in the timed lambda.
    # MEASUREMENT CHANGE (round 3): rounds 1-2 timed bv.copy() + COUNT
    # inside the lambda; 5_count_and_on_blob numbers before BENCH_r03 are
    # not directly comparable to later rounds (they include the copy).
    log(f"[5 serial] {raw_mb:.1f} MB bitmap -> {len(blob)/1e3:.1f} KB blob "
        f"({raw_mb*1e6/len(blob):.0f}x); ser {raw_mb/t_ser:.1f} MB/s, "
        f"deser {raw_mb/t_deser:.1f} MB/s, count-AND-on-blob {t_op*1e3:.1f} ms "
        f"(= {cnt})")
    out = {"ser_mbps": raw_mb / t_ser, "deser_mbps": raw_mb / t_deser,
           "count_and_blob_ms": t_op * 1e3,
           "blob_kb": len(blob) / 1e3}
    # same-session reference A/B: the host's codec throughput swings ~2x
    # between sessions, so a stored constant misstates the ratio in either
    # direction.  Where the reference tree is present, time the reference's
    # OWN codec on the same content right now (refbridge, pure C++ timing).
    try:
        from bitmagic_tpu.serial import refformat
        live = refformat.bench_reference_codec(
            idx, size, 2 * C.BITS_PER_BLOCK, 4 * C.BITS_PER_BLOCK - 1,
            level=6, iters=11)
    except Exception:
        live = None
    if live:
        out["ref_live_ser_mbps"] = raw_mb / live["ser_s"]
        out["ref_live_deser_mbps"] = raw_mb / live["deser_s"]
        out["ref_live_blob_kb"] = live["blob_bytes"] / 1e3
        log(f"[5 serial] reference live (same session): "
            f"ser {out['ref_live_ser_mbps']:.1f} MB/s, "
            f"deser {out['ref_live_deser_mbps']:.1f} MB/s, "
            f"blob {out['ref_live_blob_kb']:.1f} KB")
    return out


# Reference ground truth on this host: tools/ref_perf.cpp (g++ -O3
# -march=native against /root/reference headers), measured round 1; see
def bench_gap_corpus(rng):
    """Config 5b: run/GAP-structured corpus — the inv_list/Gov2 shape the
    reference was built for (wide FULL spans + bursty clustered runs +
    sparse arrays).  Round-5 work under test: Structure.runs + BMT1
    FULL_RUN records + GAP-direct serialization.  Same-session live A/B
    against the reference's own codec on identical content."""
    from bitmagic_tpu import BitVector
    from bitmagic_tpu.serial import Serializer, Deserializer
    import bitmagic_tpu.constants as C

    n_blk = 512
    size = n_blk * C.BITS_PER_BLOCK
    lo, hi = 100 * C.BITS_PER_BLOCK, 300 * C.BITS_PER_BLOCK - 1
    # sparse array section (blocks 0-99)
    ids = np.unique(rng.integers(0, 100 * C.BITS_PER_BLOCK, 20_000))
    # bursty cluster section (blocks 300-511): 2000 runs of 30-300 bits
    starts = rng.integers(300 * C.BITS_PER_BLOCK, size - 400, 2000)
    lens = rng.integers(30, 300, 2000)
    burst = np.concatenate([np.arange(s, s + l)
                            for s, l in zip(starts, lens)])
    all_ids = np.unique(np.concatenate([ids, burst]))
    bv = BitVector.from_indices(all_ids, size)
    bv.set_range(lo, hi)
    bv.optimize()                       # GAP-classify + run-coalesce

    def best(fn, n=11):
        fn()
        b, r = float("inf"), None
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            b = min(b, time.perf_counter() - t0)
        return b, r

    ser = Serializer(6)
    t_ser, blob = best(lambda: ser.serialize(bv))
    t_deser, back = best(lambda: Deserializer().deserialize(blob))
    assert back.equal(bv)
    raw_mb = size / 8 / 1e6
    out = {"ser_mbps": raw_mb / t_ser, "deser_mbps": raw_mb / t_deser,
           "blob_kb": len(blob) / 1e3}
    log(f"[5b gap-corpus] {raw_mb:.1f} MB -> {len(blob)/1e3:.1f} KB; "
        f"ser {out['ser_mbps']:.1f} MB/s, deser {out['deser_mbps']:.1f} MB/s")
    try:
        # OUR encoder on the REFERENCE's own format (refcodec v3s codes):
        # the apples-to-apples size comparison against the reference's
        # serializer on this corpus shape
        from bitmagic_tpu.serial.refcodec import ref_serialize
        out["reffmt_blob_kb"] = len(ref_serialize(bv, level=6)) / 1e3
        log(f"[5b gap-corpus] our ref-format blob: "
            f"{out['reffmt_blob_kb']:.1f} KB")
    except Exception:
        pass
    try:
        from bitmagic_tpu.serial import refformat
        live = refformat.bench_reference_codec(all_ids, size, lo, hi,
                                               level=6, iters=7)
    except Exception:
        live = None
    if live:
        out["ref_live_ser_mbps"] = raw_mb / live["ser_s"]
        out["ref_live_deser_mbps"] = raw_mb / live["deser_s"]
        out["ref_live_blob_kb"] = live["blob_bytes"] / 1e3
        log(f"[5b gap-corpus] reference live: "
            f"ser {out['ref_live_ser_mbps']:.1f} MB/s, "
            f"deser {out['ref_live_deser_mbps']:.1f} MB/s, "
            f"blob {out['ref_live_blob_kb']:.1f} KB")
    return out


# BASELINE.md "Measured ground truth".
REF = {
    "1_and_count_gbps": 22.0,
    "2_select_mqps": 1.70,
    "3_agg_and_sub_gbps": 142.0,
    "4_scan_gelems": 6.0,
    "5_ser_mbps": 319.0,
    "5_deser_mbps": 1274.0,
    # reference's OWN serializer (refformat bridge, L6) on the exact
    # config-5 ids — measured round 3; the older 326 KB figure was below
    # the entropy floor of this data (~658 B/block x 510 random blocks)
    # and did not reproduce
    "5_blob_kb": 354.5,
}


def main():
    # watchdog: the axon tunnel can go fully down (jax.devices() itself
    # hangs) for hours at a stretch, including MID-RUN.  The timer is
    # re-armed after every completed config; if no config completes for
    # 600 s (normal worst case: first compile ~40 s, bad machine patches
    # ~3x), emit whatever HAS been measured — an honest partial beats a
    # driver timeout with no output — and exit.
    import os
    import threading

    rng = np.random.default_rng(42)
    configs = {}
    headline = {}                     # filled once config 1 lands
    emitted = threading.Event()

    def _emit(note=None):
        if emitted.is_set():
            return
        emitted.set()
        obj = {
            "metric": "bvsetalgebra_and_count_throughput",
            "value": headline.get("gbps_med"),
            "unit": "GB/s",
            "vs_baseline": headline.get("vs_baseline"),
            "configs": configs,
        }
        if note:
            obj["note"] = note
        print(json.dumps(obj), flush=True)

    timer_box = {}

    def _give_up():
        if headline:
            note = ("partial: tunnel lost mid-run; measured configs: "
                    + ",".join(sorted(configs)))
        else:
            note = ("unmeasured: device unreachable for 600 s "
                    "(axon tunnel outage); no benchmark was run")
        log("WATCHDOG: no progress for 600 s — emitting partial results")
        _emit(note)
        os._exit(0)

    def _arm():
        t = timer_box.pop("t", None)
        if t is not None:
            t.cancel()
        t = threading.Timer(600.0, _give_up)
        t.daemon = True
        t.start()
        timer_box["t"] = t

    _arm()
    cpu_gbps = bench_logical_cpu(rng)   # host-only; no tunnel involved
    log(f"devices: {jax.devices()}")
    gbps, gbps_med, gbps_mat = bench_logical(rng)
    headline["gbps_med"] = round(gbps_med, 2)
    headline["vs_baseline"] = round(gbps_med / cpu_gbps, 2)
    _arm()
    # PRIMARY values are medians over >=5 slope passes: tunnel RTT jitter
    # can shrink a two-point slope and inflate a min-side estimate beyond
    # physics, while the median stays inside the credible band
    configs["1_and_count"] = {
        "value": round(gbps_med, 1), "best": round(gbps, 1),
        "unit": "GB/s", "ref": REF["1_and_count_gbps"],
        "vs_ref": round(gbps_med / REF["1_and_count_gbps"], 2)}
    if gbps_mat is not None:
        configs["1_and_materialize"] = {"value": round(gbps_mat, 1),
                                        "unit": "GB/s"}
    else:
        configs["1_and_materialize"] = {"value": None, "unit": "GB/s",
                                        "note": "unmeasured: slope below "
                                                "tunnel jitter floor"}
    try:
        sh, sh_med = bench_shift(rng)
        configs["1c_shift_r1"] = {"value": round(sh_med, 1),
                                  "best": round(sh, 1), "unit": "GB/s"}
        _arm()
        qps, qps_med = bench_rank_select(rng)
        configs["2_select1"] = {
            "value": round(qps_med / 1e6, 2), "best": round(qps / 1e6, 2),
            "unit": "Mq/s", "ref": REF["2_select_mqps"],
            "vs_ref": round(qps_med / 1e6 / REF["2_select_mqps"], 2)}
        _arm()
        agg, agg_med = bench_aggregator(rng)
        configs["3_agg_and_sub"] = {
            "value": round(agg_med, 1), "best": round(agg, 1),
            "unit": "GB/s", "ref": REF["3_agg_and_sub_gbps"],
            "vs_ref": round(agg_med / REF["3_agg_and_sub_gbps"], 2)}
        _arm()
        sc, sc_med = bench_scan(rng)
        configs["4_scan_find_eq"] = {
            "value": round(sc_med / 1e9, 2), "best": round(sc / 1e9, 2),
            "unit": "Gelem/s", "ref": REF["4_scan_gelems"],
            "vs_ref": round(sc_med / 1e9 / REF["4_scan_gelems"], 2)}
        _arm()
        pipe, pipe_med = bench_scan_pipeline(rng)
        configs["4b_scan_pipeline"] = {
            "value": round(pipe_med / 1e9, 2), "best": round(pipe / 1e9, 2),
            "unit": "Gsearch-elem/s"}
        _arm()
        s5 = bench_serialization(rng)
        # prefer the same-session live measurement of the reference codec
        # (ref_mode="live"); fall back to the stored round-1 constants
        ref_ser = s5.get("ref_live_ser_mbps", REF["5_ser_mbps"])
        ref_deser = s5.get("ref_live_deser_mbps", REF["5_deser_mbps"])
        ref_blob = s5.get("ref_live_blob_kb", REF["5_blob_kb"])
        mode = "live" if "ref_live_ser_mbps" in s5 else "stored"
        configs["5_serialize"] = {
            "value": round(s5["ser_mbps"], 1), "unit": "MB/s",
            "ref": round(ref_ser, 1), "ref_mode": mode,
            "vs_ref": round(s5["ser_mbps"] / ref_ser, 2)}
        configs["5_deserialize"] = {
            "value": round(s5["deser_mbps"], 1), "unit": "MB/s",
            "ref": round(ref_deser, 1), "ref_mode": mode,
            "vs_ref": round(s5["deser_mbps"] / ref_deser, 2)}
        configs["5_count_and_on_blob"] = {
            "value": round(s5["count_and_blob_ms"], 2), "unit": "ms"}
        configs["5_blob_size"] = {
            "value": round(s5["blob_kb"], 1), "unit": "KB",
            "ref": round(ref_blob, 1), "ref_mode": mode,
            "vs_ref": round(ref_blob / s5["blob_kb"], 3)}
        _arm()
        s5b = bench_gap_corpus(rng)
        e = {"ser_mbps": round(s5b["ser_mbps"], 1),
             "deser_mbps": round(s5b["deser_mbps"], 1),
             "blob_kb": round(s5b["blob_kb"], 1), "unit": "MB/s,KB"}
        if "reffmt_blob_kb" in s5b:
            e["reffmt_blob_kb"] = round(s5b["reffmt_blob_kb"], 1)
        if "ref_live_ser_mbps" in s5b:
            e["ref_ser"] = round(s5b["ref_live_ser_mbps"], 1)
            e["ref_deser"] = round(s5b["ref_live_deser_mbps"], 1)
            e["ref_blob_kb"] = round(s5b["ref_live_blob_kb"], 1)
            e["vs_ref_ser"] = round(s5b["ser_mbps"]
                                    / s5b["ref_live_ser_mbps"], 2)
            e["vs_ref_deser"] = round(s5b["deser_mbps"]
                                      / s5b["ref_live_deser_mbps"], 2)
            e["vs_ref_size"] = round(s5b["ref_live_blob_kb"]
                                     / s5b["blob_kb"], 3)
            if "reffmt_blob_kb" in s5b:
                e["vs_ref_size_reffmt"] = round(
                    s5b["ref_live_blob_kb"] / s5b["reffmt_blob_kb"], 3)
        configs["5b_gap_corpus"] = e
    except Exception as e:          # detail benches must not kill the headline
        log("detail bench failed:", repr(e))
    t = timer_box.pop("t", None)
    if t is not None:
        t.cancel()
    _emit()


if __name__ == "__main__":
    main()
