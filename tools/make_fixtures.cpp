// Fixture generator: runs the REFERENCE implementation (headers at
// /root/reference/src, used read-only at build time) on deterministic
// pseudo-random inputs and dumps expected results.  The outputs are used by
// tests/test_reference_parity.py to check this framework bit-for-bit against
// the reference on logical / rank ops (BASELINE acceptance), and to record
// the reference's single-node CPU throughput as perf ground truth.
//
// No reference code is copied into the framework: this tool only LINKS
// against the reference like any user program would (cf. samples/).
//
// Output format (all little-endian, written to the directory in argv[1]):
//   inputs.bin   : u64 n_a, a_indices[u64...], u64 n_b, b_indices[...]
//   expected.bin : u64 count_a, count_b, and, or, xor, sub_ab,
//                  u64 n_rank, (u64 pos, u64 rank)[n_rank],
//                  u64 n_sel, (u64 rank, u64 pos)[n_sel],
//                  u64 n_and_idx, and_result_indices[...]
//   blob_a.bin   : reference-serialized BLOB of vector A (level default)
//   timing.txt   : reference CPU timings (AND+count over the pair)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <string>
#include <vector>

#include "bm.h"
#include "bmserial.h"
#include "bmrandom.h"
#include "bmaggregator.h"

typedef bm::bvector<> bvect;

// deterministic xorshift so Python can regenerate identical inputs
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t xorshift64() {
    uint64_t x = rng_state;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    rng_state = x;
    return x;
}

static void fill_vector(bvect& bv, std::vector<uint64_t>& ids, uint64_t size,
                        uint64_t n, bool intervals) {
    for (uint64_t i = 0; i < n; ++i) {
        uint64_t pos = xorshift64() % size;
        if (intervals) {
            uint64_t len = 1 + (xorshift64() % 200);
            for (uint64_t j = 0; j < len && pos + j < size; ++j) {
                bv.set(static_cast<bm::id_t>(pos + j));
                ids.push_back(pos + j);
            }
        } else {
            bv.set(static_cast<bm::id_t>(pos));
            ids.push_back(pos);
        }
    }
}

static void write_u64(FILE* f, uint64_t v) { fwrite(&v, 8, 1, f); }

static void write_ids(FILE* f, const bvect& bv) {
    std::vector<uint64_t> out;
    bvect::enumerator en = bv.first();
    for (; en.valid(); ++en) out.push_back(*en);
    write_u64(f, out.size());
    fwrite(out.data(), 8, out.size(), f);
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : ".";
    const uint64_t SIZE = 100ull * 1000 * 1000;   // ~100M bits

    bvect a, b;
    std::vector<uint64_t> ia, ib;
    fill_vector(a, ia, SIZE, 200000, false);      // scattered
    fill_vector(a, ia, SIZE, 500, true);          // + interval runs
    fill_vector(b, ib, SIZE, 150000, false);
    fill_vector(b, ib, SIZE, 800, true);

    {   // inputs
        FILE* f = fopen((dir + "/inputs.bin").c_str(), "wb");
        write_ids(f, a);
        write_ids(f, b);
        fclose(f);
    }

    {   // expected results
        FILE* f = fopen((dir + "/expected.bin").c_str(), "wb");
        write_u64(f, a.count());
        write_u64(f, b.count());
        bvect t;
        t.bit_and(a, b, bvect::opt_compress); write_u64(f, t.count());
        bvect to; to.bit_or(a, b, bvect::opt_compress); write_u64(f, to.count());
        bvect tx; tx.bit_xor(a, b, bvect::opt_compress); write_u64(f, tx.count());
        bvect ts; ts.bit_sub(a, b, bvect::opt_compress); write_u64(f, ts.count());
        // rank samples
        const int NR = 64;
        write_u64(f, NR);
        bvect::rs_index_type rs;
        a.build_rs_index(&rs);
        for (int i = 0; i < NR; ++i) {
            uint64_t pos = xorshift64() % SIZE;
            uint64_t r = a.count_to(static_cast<bm::id_t>(pos), rs);
            write_u64(f, pos);
            write_u64(f, r);
        }
        // select samples
        write_u64(f, NR);
        uint64_t total = a.count();
        for (int i = 0; i < NR; ++i) {
            uint64_t rank = 1 + (xorshift64() % total);
            bm::id_t pos = 0;
            bool found = a.select(static_cast<bm::id_t>(rank), pos, rs);
            write_u64(f, rank);
            write_u64(f, found ? pos : UINT64_MAX);
        }
        // AND result indices (bit-for-bit logical parity)
        write_ids(f, t);
        fclose(f);
    }

    {   // reference BLOB of A (for decode-parity experiments later)
        bvect::statistics st;
        a.optimize(0, bvect::opt_compress, &st);
        bm::serializer<bvect> ser;
        bm::serializer<bvect>::buffer buf;
        ser.serialize(a, buf);
        FILE* f = fopen((dir + "/blob_a.bin").c_str(), "wb");
        fwrite(buf.data(), 1, buf.size(), f);
        fclose(f);
        // round-trip sanity inside the reference itself
        bvect back;
        bm::deserialize(back, buf.data());
        if (!back.equal(a)) {
            fprintf(stderr, "reference round-trip FAILED\n");
            return 2;
        }
    }

    {   // CPU ground truth timing: AND+count (the bvsetalgebra workload)
        using clk = std::chrono::high_resolution_clock;
        const int REPS = 50;
        volatile uint64_t sink = 0;
        auto t0 = clk::now();
        for (int i = 0; i < REPS; ++i)
            sink += bm::count_and(a, b);
        auto t1 = clk::now();
        double sec = std::chrono::duration<double>(t1 - t0).count() / REPS;
        // effective bytes: two operand streams
        double gbps = 2.0 * (SIZE / 8.0) / 1e9 / sec;
        FILE* f = fopen((dir + "/timing.txt").c_str(), "w");
        fprintf(f, "count_and_ms %.4f\ncount_and_gbps %.3f\n", sec * 1e3, gbps);
        printf("reference count_and: %.3f ms (%.2f GB/s effective)\n",
               sec * 1e3, gbps);

        // select1 throughput with rs_index (config 2 ground truth)
        bvect::rs_index_type rs2;
        a.build_rs_index(&rs2);
        uint64_t total2 = a.count();
        const int NQ = 200000;
        std::vector<bm::id_t> qs(NQ);
        for (int i = 0; i < NQ; ++i)
            qs[i] = static_cast<bm::id_t>(1 + (xorshift64() % total2));
        auto s0 = clk::now();
        uint64_t acc = 0;
        for (int i = 0; i < NQ; ++i) {
            bm::id_t pos = 0;
            a.select(qs[i], pos, rs2);
            acc += pos;
        }
        auto s1 = clk::now();
        double qsec = std::chrono::duration<double>(s1 - s0).count();
        double mqps = NQ / qsec / 1e6;
        fprintf(f, "select_mqps %.3f\n", mqps);
        printf("reference select1: %.2f Mq/s (acc=%llu)\n", mqps,
               (unsigned long long)acc);

        // aggregator AND over 200 vectors (config 3 ground truth)
        {
            const int NV = 200;
            const uint64_t ASIZE = 8ull * 1024 * 1024;   // 8.4M bits each
            std::vector<bvect*> vecs;
            for (int v = 0; v < NV; ++v) {
                bvect* bb = new bvect();
                for (int i = 0; i < 50000; ++i)
                    bb->set(static_cast<bm::id_t>(xorshift64() % ASIZE));
                vecs.push_back(bb);
            }
            bm::aggregator<bvect> agg;
            for (auto* bb : vecs) agg.add(bb);
            bvect target;
            auto a0 = clk::now();
            const int AREPS = 20;
            for (int r = 0; r < AREPS; ++r)
                agg.combine_and(target);
            auto a1 = clk::now();
            double asec = std::chrono::duration<double>(a1 - a0).count() / AREPS;
            double agbps = NV * (ASIZE / 8.0) / 1e9 / asec;
            fprintf(f, "agg_and200_ms %.4f\nagg_and200_gbps %.3f\n",
                    asec * 1e3, agbps);
            printf("reference aggregator AND(200): %.3f ms (%.2f GB/s)\n",
                   asec * 1e3, agbps);
            for (auto* bb : vecs) delete bb;
        }
        fclose(f);
    }
    printf("fixtures written to %s\n", dir.c_str());
    return 0;
}
