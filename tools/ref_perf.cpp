// Reference performance ground truth on this host (BASELINE.md configs).
//
// Compiles against the reference headers (read-only) with the native SIMD
// flags and times the five BASELINE.json workloads using the reference's
// own containers — the CPU side of the "self-measured baseline"
// (SURVEY.md §6: the reference repo publishes no absolute numbers).
//
// Build/run:
//   g++ -O3 -march=native -std=c++17 -I/root/reference/src \
//       tools/ref_perf.cpp -o /tmp/ref_perf && /tmp/ref_perf

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

#include "bm.h"
#include "bmaggregator.h"
#include "bmalgo.h"
#include "bmserial.h"
#include "bmsparsevec.h"
#include "bmsparsevec_algo.h"

typedef bm::bvector<> bvect;
typedef bm::sparse_vector<unsigned, bvect> svect;

static double now_ms() {
    using namespace std::chrono;
    return duration<double, std::milli>(
        steady_clock::now().time_since_epoch()).count();
}

int main() {
    std::mt19937_64 rng(42);
    const unsigned SIZE = 100'000'000;

    // ---- config 1: AND + count over two 100M-bit vectors ----------------
    bvect a, b;
    {
        bvect::bulk_insert_iterator ia(a), ib(b);
        for (unsigned i = 0; i < SIZE; i += 37)
            ia = i + (unsigned)(rng() % 31);
        for (unsigned i = 0; i < SIZE; i += 41)
            ib = i + (unsigned)(rng() % 37);
        ia.flush(); ib.flush();
    }
    a.optimize(); b.optimize();
    volatile bm::id_t sink = 0;
    {
        const int R = 50;
        double t0 = now_ms();
        for (int r = 0; r < R; ++r)
            sink += bm::count_and(a, b);
        double dt = (now_ms() - t0) / R;
        double gb = 2.0 * SIZE / 8 / 1e9;
        printf("[1] count_and 100M-bit: %.3f ms -> %.2f GB/s\n",
               dt, gb / (dt / 1e3));
        fflush(stdout);
    }

    // ---- config 2: rank/select batch ------------------------------------
    {
        bvect::rs_index_type rsi;
        a.build_rs_index(&rsi);
        const int NQ = 1'000'000;
        bm::id_t total = a.count();
        std::vector<bm::id_t> qs(NQ);
        for (auto& q : qs) q = 1 + (bm::id_t)(rng() % total);
        double t0 = now_ms();
        bm::id_t acc = 0;
        for (auto q : qs) {
            bm::id_t pos = 0;
            a.select(q, pos, rsi);
            acc += pos;
        }
        double dt = now_ms() - t0;
        sink += acc;
        printf("[2] select1 x%d: %.1f ms -> %.2f Mq/s\n", NQ, dt,
               NQ / dt / 1e3);
        fflush(stdout);
    }

    // ---- config 3: aggregator AND-SUB over 200 vectors -------------------
    {
        const int K = 200;
        const unsigned VS = 8'400'000;    // ~128 blocks, matches bench.py
        std::vector<bvect*> vs(K);
        for (int k = 0; k < K; ++k) {
            vs[k] = new bvect();
            bvect::bulk_insert_iterator it(*vs[k]);
            for (unsigned i = 0; i < VS; i += 2)
                it = i + (unsigned)(rng() % 2);
            it.flush();
            vs[k]->optimize();
        }
        bm::aggregator<bvect> agg;
        agg.set_optimization();
        bvect target;
        const int R = 5;
        double t0 = now_ms();
        for (int r = 0; r < R; ++r) {
            agg.reset();
            for (int k = 0; k < K / 2; ++k)
                agg.add(vs[k], 0);                 // AND group
            for (int k = K / 2; k < K; ++k)
                agg.add(vs[k], 1);                 // SUB group
            agg.combine_and_sub(target);
        }
        double dt = (now_ms() - t0) / R;
        double gb = (double)K * VS / 8 / 1e9;
        printf("[3] aggregator AND-SUB %d vectors (%.2f GB): %.1f ms -> "
               "%.1f GB/s\n", K, gb, dt, gb / (dt / 1e3));
        for (auto* v : vs) delete v;
        fflush(stdout);
    }

    // ---- config 4: sparse_vector scanner find_eq -------------------------
    {
        const unsigned N = 33'554'432;    // 32 * 512 * 2048
        svect sv;
        {
            svect::back_insert_iterator it = sv.get_back_inserter();
            for (unsigned i = 0; i < N; ++i)
                it = (unsigned)(rng() & 0xFFFFF);
            it.flush();
        }
        sv.optimize();
        bm::sparse_vector_scanner<svect> scanner;
        bvect found;
        const int R = 5;
        double t0 = now_ms();
        for (int r = 0; r < R; ++r)
            scanner.find_eq(sv, (unsigned)(123456 + r), found);
        double dt = (now_ms() - t0) / R;
        printf("[4] scanner find_eq over %uM u32: %.1f ms -> %.2f Gelem/s\n",
               N / 1000000, dt, N / (dt / 1e3) / 1e9);
        fflush(stdout);
    }

    // ---- config 5: serialization round-trip -------------------------------
    {
        const unsigned S5 = 512 * 65536;
        bvect v5;
        {
            bvect::bulk_insert_iterator it(v5);
            for (unsigned i = 0; i < S5; i += 100)
                it = i + (unsigned)(rng() % 60);
            it.flush();
        }
        v5.set_range(2 * 65536, 4 * 65536 - 1);
        v5.optimize();
        bm::serializer<bvect> ser;
        ser.set_compression_level(6);
        bm::serializer<bvect>::buffer buf;
        ser.serialize(v5, buf);               // warm-up
        const int R = 20;
        double t0 = now_ms();
        for (int r = 0; r < R; ++r)
            ser.serialize(v5, buf);
        double t_ser = (now_ms() - t0) / R;
        bvect back;
        bm::deserialize(back, buf.data());
        t0 = now_ms();
        for (int r = 0; r < R; ++r) {
            bvect tmp;
            bm::deserialize(tmp, buf.data());
        }
        double t_des = (now_ms() - t0) / R;
        double mb = S5 / 8.0 / 1e6;
        printf("[5] serialize %.1f MB bitmap -> %.1f KB: ser %.1f MB/s, "
               "deser %.1f MB/s\n", mb, buf.size() / 1e3,
               mb / (t_ser / 1e3), mb / (t_des / 1e3));
    }

    return (int)(sink & 1);
}
