// Reference-format interop bridge.
//
// Compiles against the REFERENCE headers (read-only, path given at build
// time) to expose the reference's own serializer/deserializer as a C ABI.
// This gives the framework complete read/write compatibility with reference
// BLOBs (all ~67 block codes, XOR chains, bookmarks) the same way an
// application embedding the reference would get it — no reference code is
// copied into this repository.
//
// The framework core does NOT depend on this bridge; it is an optional
// interop extra (serial/refformat.py gates on its availability).  The
// from-scratch reference-format codec lives in serial/refcodec.py (decode
// of all ~70 block codes + encoder) — this bridge only generates fixtures
// and cross-checks against the reference's own implementation.

#include <chrono>
#include <cstdint>
#include <cstring>
#include <ostream>   // the reference's bmsparsevec_serial.h uses std::endl
#include <vector>

#include "bm.h"
#include "bmserial.h"
#include "bmsparsevec.h"
#include "bmsparsevec_compr.h"
#include "bmsparsevec_serial.h"
#include "bmstrsparsevec.h"
#include "bmsparsevec_float.h"
#include "bmsparsevec_float_serial.h"

typedef bm::bvector<> bvect;
typedef bm::sparse_vector<unsigned, bvect> svect_u32;
typedef bm::rsc_sparse_vector<unsigned, svect_u32> rsc_u32;
typedef bm::str_sparse_vector<char, bvect, 32> str_sv32;
typedef bm::sparse_vector_float<svect_u32> fsvect;

extern "C" {

// Deserialize a reference BLOB -> set-bit positions.
// Returns count of set bits, or -1 on error.  If out != nullptr, writes up
// to out_cap positions.
int64_t bmref_deserialize_to_indices(const uint8_t* blob, int64_t blob_size,
                                     uint64_t* out, int64_t out_cap) {
    (void)blob_size;
    try {
        bvect bv;
        bm::deserialize(bv, blob);
        int64_t n = 0;
        bvect::enumerator en = bv.first();
        for (; en.valid(); ++en) {
            if (out && n < out_cap) out[n] = *en;
            ++n;
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Serialize set-bit positions (sorted u64) into a reference-format BLOB.
// Returns the BLOB size, or -1 on error.  Call once with out=nullptr to get
// the size, then again with a buffer.
int64_t bmref_serialize_from_indices(const uint64_t* ids, int64_t n,
                                     uint64_t size_hint, uint8_t* out,
                                     int64_t out_cap) {
    try {
        bvect bv;
        bvect::bulk_insert_iterator ins(bv);
        for (int64_t i = 0; i < n; ++i)
            ins = static_cast<bm::id_t>(ids[i]);
        ins.flush();
        if (size_hint)
            bv.resize(static_cast<bm::id_t>(size_hint));
        bvect::statistics st;
        bv.optimize(0, bvect::opt_compress, &st);
        bm::serializer<bvect> ser;
        bm::serializer<bvect>::buffer buf;
        ser.serialize(bv, buf);
        if (out && out_cap >= static_cast<int64_t>(buf.size()))
            memcpy(out, buf.data(), buf.size());
        return static_cast<int64_t>(buf.size());
    } catch (...) {
        return -1;
    }
}

// Parameterized serializer: compression level 0-6, optional bookmarks
// (every `bookmarks` blocks when > 0), optional BM_GAP block strategy.
// Used to generate fixture BLOBs exercising the full block-code zoo.
int64_t bmref_serialize_ex(const uint64_t* ids, int64_t n, uint64_t size_hint,
                           int level, int bookmarks, int use_gap,
                           uint8_t* out, int64_t out_cap) {
    try {
        bvect bv;
        if (use_gap) bv.set_new_blocks_strat(bm::BM_GAP);
        {
            bvect::bulk_insert_iterator ins(bv);
            for (int64_t i = 0; i < n; ++i)
                ins = static_cast<bm::id_t>(ids[i]);
            ins.flush();
        }
        if (size_hint)
            bv.resize(static_cast<bm::id_t>(size_hint));
        bvect::statistics st;
        bv.optimize(0, bvect::opt_compress, &st);
        bm::serializer<bvect> ser;
        ser.set_compression_level(static_cast<unsigned>(level));
        if (bookmarks > 0)
            ser.set_bookmarks(true, static_cast<unsigned>(bookmarks));
        bm::serializer<bvect>::buffer buf;
        ser.serialize(bv, buf);
        if (out && out_cap >= static_cast<int64_t>(buf.size()))
            memcpy(out, buf.data(), buf.size());
        return static_cast<int64_t>(buf.size());
    } catch (...) {
        return -1;
    }
}

// Same-session reference-codec timing: build one bvector from ids (plus an
// optional FULL range [rng_lo, rng_hi]), then time the reference's OWN
// serialize/deserialize best-of-`iters` with std::chrono (pure codec work,
// no construction or ctypes overhead inside the timed region).  Writes
// out_res = {blob_bytes, ser_seconds_best, deser_seconds_best}.  Returns 0,
// or -1 on error/round-trip mismatch.  This makes bench vs_ref an honest
// A/B on the machine state of THE SAME RUN (host codec throughput swings
// ~2x between sessions).
int64_t bmref_bench_codec(const uint64_t* ids, int64_t n, uint64_t size_hint,
                          uint64_t rng_lo, uint64_t rng_hi,
                          int level, int iters, double* out_res) {
    using clk = std::chrono::steady_clock;
    try {
        bvect bv;
        {
            bvect::bulk_insert_iterator ins(bv);
            for (int64_t i = 0; i < n; ++i)
                ins = static_cast<bm::id_t>(ids[i]);
            ins.flush();
        }
        if (rng_hi >= rng_lo && rng_hi)
            bv.set_range(static_cast<bm::id_t>(rng_lo),
                         static_cast<bm::id_t>(rng_hi));
        if (size_hint)
            bv.resize(static_cast<bm::id_t>(size_hint));
        bvect::statistics st;
        bv.optimize(0, bvect::opt_compress, &st);
        const bvect::size_type want = bv.count();

        bm::serializer<bvect> ser;
        ser.set_compression_level(static_cast<unsigned>(level));
        bm::serializer<bvect>::buffer buf;
        ser.serialize(bv, buf);                 // warm-up + final blob
        double ser_best = 1e30;
        for (int it = 0; it < iters; ++it) {
            bm::serializer<bvect>::buffer b2;
            auto t0 = clk::now();
            ser.serialize(bv, b2);
            double dt = std::chrono::duration<double>(clk::now() - t0)
                            .count();
            if (dt < ser_best) ser_best = dt;
        }

        double deser_best = 1e30;
        bvect::size_type got = 0;
        for (int it = 0; it < iters + 1; ++it) {   // +1 warm-up
            bvect bv2;
            auto t0 = clk::now();
            bm::deserialize(bv2, buf.data());
            double dt = std::chrono::duration<double>(clk::now() - t0)
                            .count();
            if (it > 0 && dt < deser_best) deser_best = dt;
            got = bv2.count();
        }
        if (got != want) return -1;
        out_res[0] = static_cast<double>(buf.size());
        out_res[1] = ser_best;
        out_res[2] = deser_best;
        return 0;
    } catch (...) {
        return -1;
    }
}

// Serialize `target` with the XOR reference filter ON, using `ref` (row 0)
// and `target` (row 1) as the reference collection — produces BLOBs with
// xor_ref / ref_eq / xor_chain codes for decoder fixtures.
int64_t bmref_serialize_xor(const uint64_t* ids_t, int64_t nt,
                            const uint64_t* ids_r, int64_t nr,
                            const uint64_t* ids_r2, int64_t nr2,
                            uint64_t size_hint,
                            uint8_t* out, int64_t out_cap) {
    try {
        bvect bv_t, bv_r, bv_r2;
        {
            bvect::bulk_insert_iterator it(bv_t);
            for (int64_t i = 0; i < nt; ++i) it = (bm::id_t)ids_t[i];
            it.flush();
        }
        {
            bvect::bulk_insert_iterator it(bv_r);
            for (int64_t i = 0; i < nr; ++i) it = (bm::id_t)ids_r[i];
            it.flush();
        }
        if (nr2) {
            bvect::bulk_insert_iterator it(bv_r2);
            for (int64_t i = 0; i < nr2; ++i) it = (bm::id_t)ids_r2[i];
            it.flush();
        }
        if (size_hint) {
            bv_t.resize((bm::id_t)size_hint);
            bv_r.resize((bm::id_t)size_hint);
            if (nr2) bv_r2.resize((bm::id_t)size_hint);
        }
        bv_t.optimize();
        bv_r.optimize();
        if (nr2) bv_r2.optimize();

        // the xor scanner searches candidate matches only FORWARD in the
        // reference collection, so the target must precede its references
        bm::bv_ref_vector<bvect> ref;
        ref.add(&bv_t, 1);
        ref.add(&bv_r, 0);
        if (nr2) ref.add(&bv_r2, 2);

        bm::serializer<bvect> ser;
        ser.set_ref_vectors(&ref);
        bm::serializer<bvect>::xor_sim_model_type sim;
        bm::xor_sim_params xp;
        ser.compute_sim_model(sim, ref, xp);
        ser.set_sim_model(&sim);
        ser.set_curr_ref_idx(0);  // serializing position 0 (the target)

        bm::serializer<bvect>::buffer buf;
        ser.serialize(bv_t, buf);
        if (out && out_cap >= static_cast<int64_t>(buf.size()))
            memcpy(out, buf.data(), buf.size());
        return static_cast<int64_t>(buf.size());
    } catch (...) {
        return -1;
    }
}

// Deserialize a XOR-compressed BLOB given reference vectors (rows 0, 2).
int64_t bmref_deserialize_xor_to_indices(const uint8_t* blob,
                                         const uint64_t* ids_r, int64_t nr,
                                         const uint64_t* ids_r2, int64_t nr2,
                                         uint64_t size_hint,
                                         uint64_t* out, int64_t out_cap) {
    try {
        bvect bv_r, bv_r2;
        {
            bvect::bulk_insert_iterator it(bv_r);
            for (int64_t i = 0; i < nr; ++i) it = (bm::id_t)ids_r[i];
            it.flush();
        }
        if (nr2) {
            bvect::bulk_insert_iterator it(bv_r2);
            for (int64_t i = 0; i < nr2; ++i) it = (bm::id_t)ids_r2[i];
            it.flush();
        }
        if (size_hint) {
            bv_r.resize((bm::id_t)size_hint);
            if (nr2) bv_r2.resize((bm::id_t)size_hint);
        }
        bv_r.optimize();
        bm::bv_ref_vector<bvect> ref;
        ref.add(&bv_r, 0);
        if (nr2) { bv_r2.optimize(); ref.add(&bv_r2, 2); }

        bvect bv;
        bm::deserializer<bvect, bm::decoder> des;
        des.set_ref_vectors(&ref);
        des.deserialize(bv, blob);
        int64_t n = 0;
        bvect::enumerator en = bv.first();
        for (; en.valid(); ++en) {
            if (out && n < out_cap) out[n] = *en;
            ++n;
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Reference sparse_vector<unsigned> serializer: values + not-null mask ->
// 'BM' BLOB (XOR plane filter on/off).  Fixture generator for ref_sv.py.
int64_t bmref_sv_serialize(const uint32_t* vals, const uint8_t* notnull,
                           int64_t n, int use_xor,
                           uint8_t* out, int64_t out_cap) {
    try {
        svect_u32 sv(bm::use_null);
        for (int64_t i = 0; i < n; ++i)
            if (notnull[i])
                sv.set(static_cast<bm::id_t>(i), vals[i]);
        sv.optimize();
        bm::sparse_vector_serializer<svect_u32> ser;
        ser.enable_xor_compression();
        if (!use_xor) ser.disable_xor_compression();
        bm::sparse_vector_serial_layout<svect_u32> lay;
        ser.serialize(sv, lay);
        if (out && out_cap >= static_cast<int64_t>(lay.size()))
            memcpy(out, lay.buf(), lay.size());
        return static_cast<int64_t>(lay.size());
    } catch (...) {
        return -1;
    }
}

// Reference sparse_vector<unsigned> deserializer: BLOB -> values +
// not-null mask.  Returns vector size, fills up to cap entries.
int64_t bmref_sv_deserialize(const uint8_t* blob, uint32_t* vals,
                             uint8_t* notnull, int64_t cap) {
    try {
        svect_u32 sv(bm::use_null);
        bm::sparse_vector_deserializer<svect_u32> des;
        des.deserialize(sv, blob);
        int64_t n = static_cast<int64_t>(sv.size());
        for (int64_t i = 0; i < n && i < cap; ++i) {
            notnull[i] = !sv.is_null(static_cast<bm::id_t>(i));
            vals[i] = notnull[i] ? sv.get(static_cast<bm::id_t>(i)) : 0;
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Reference sparse_vector<int64> round-trip pair: validates that the
// framework's signed s2u plane layout is byte-compatible with the
// reference's (negative values, incl. INT64_MIN, must survive both
// directions).
int64_t bmref_sv_serialize_i64(const int64_t* vals, const uint8_t* notnull,
                               int64_t n, int use_xor,
                               uint8_t* out, int64_t out_cap) {
    try {
        typedef bm::sparse_vector<int64_t, bvect> svect_i64;
        svect_i64 sv(bm::use_null);
        for (int64_t i = 0; i < n; ++i)
            if (notnull[i])
                sv.set(static_cast<bm::id_t>(i), vals[i]);
        sv.optimize();
        bm::sparse_vector_serializer<svect_i64> ser;
        ser.enable_xor_compression();
        if (!use_xor) ser.disable_xor_compression();
        bm::sparse_vector_serial_layout<svect_i64> lay;
        ser.serialize(sv, lay);
        if (out && out_cap >= static_cast<int64_t>(lay.size()))
            memcpy(out, lay.buf(), lay.size());
        return static_cast<int64_t>(lay.size());
    } catch (...) {
        return -1;
    }
}

int64_t bmref_sv_deserialize_i64(const uint8_t* blob, int64_t* vals,
                                 uint8_t* notnull, int64_t cap) {
    try {
        typedef bm::sparse_vector<int64_t, bvect> svect_i64;
        svect_i64 sv(bm::use_null);
        bm::sparse_vector_deserializer<svect_i64> des;
        des.deserialize(sv, blob);
        int64_t n = static_cast<int64_t>(sv.size());
        for (int64_t i = 0; i < n && i < cap; ++i) {
            notnull[i] = !sv.is_null(static_cast<bm::id_t>(i));
            vals[i] = notnull[i] ? sv.get(static_cast<bm::id_t>(i)) : 0;
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Reference rsc_sparse_vector<unsigned> serializer ('BC' BLOB).
int64_t bmref_rsc_serialize(const uint32_t* vals, const uint8_t* notnull,
                            int64_t n, uint8_t* out, int64_t out_cap) {
    try {
        rsc_u32 rsc;
        {
            rsc_u32::back_insert_iterator it(rsc.get_back_inserter());
            for (int64_t i = 0; i < n; ++i) {
                if (notnull[i]) it = vals[i];
                else it.add_null();
            }
            it.flush();
        }
        rsc.optimize();
        rsc.sync();
        bm::sparse_vector_serializer<rsc_u32> ser;
        bm::sparse_vector_serial_layout<rsc_u32> lay;
        ser.serialize(rsc, lay);
        if (out && out_cap >= static_cast<int64_t>(lay.size()))
            memcpy(out, lay.buf(), lay.size());
        return static_cast<int64_t>(lay.size());
    } catch (...) {
        return -1;
    }
}

// Reference rsc_sparse_vector<unsigned> deserializer.
int64_t bmref_rsc_deserialize(const uint8_t* blob, uint32_t* vals,
                              uint8_t* notnull, int64_t cap) {
    try {
        rsc_u32 rsc;
        bm::sparse_vector_deserializer<rsc_u32> des;
        des.deserialize(rsc, blob);
        int64_t n = static_cast<int64_t>(rsc.size());
        for (int64_t i = 0; i < n && i < cap; ++i) {
            unsigned v = 0;
            bool has = rsc.try_get(static_cast<bm::id_t>(i), v);
            notnull[i] = has;
            vals[i] = has ? v : 0;
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Reference str_sparse_vector<char,bv,32> serializer.  Strings are passed
// as a flat NUL-padded [n x 32] char matrix; empty rows become NULLs.
int64_t bmref_str_serialize(const char* strs, int64_t n, int use_remap,
                            uint8_t* out, int64_t out_cap) {
    try {
        str_sv32 sv(bm::use_null);
        {
            str_sv32::back_insert_iterator it = sv.get_back_inserter();
            for (int64_t i = 0; i < n; ++i) {
                const char* s = strs + i * 32;
                if (*s) it = s;
                else it.add_null();
            }
            it.flush();
        }
        if (use_remap)
            sv.remap();
        sv.optimize();
        bm::sparse_vector_serializer<str_sv32> ser;
        ser.disable_xor_compression();
        bm::sparse_vector_serial_layout<str_sv32> lay;
        ser.serialize(sv, lay);
        if (out && out_cap >= static_cast<int64_t>(lay.size()))
            memcpy(out, lay.buf(), lay.size());
        return static_cast<int64_t>(lay.size());
    } catch (...) {
        return -1;
    }
}

// Reference str_sparse_vector deserializer -> NUL-padded [n x 32] matrix.
int64_t bmref_str_deserialize(const uint8_t* blob, char* out, int64_t cap) {
    try {
        str_sv32 sv(bm::use_null);
        bm::sparse_vector_deserializer<str_sv32> des;
        des.deserialize(sv, blob);
        int64_t n = static_cast<int64_t>(sv.size());
        char buf[64];
        for (int64_t i = 0; i < n && i < cap; ++i) {
            char* dst = out + i * 32;
            memset(dst, 0, 32);
            if (!sv.is_null(static_cast<bm::id_t>(i))) {
                memset(buf, 0, sizeof(buf));
                sv.get(static_cast<bm::id_t>(i), buf, sizeof(buf));
                for (int k = 0; k < 31 && buf[k]; ++k)
                    dst[k] = buf[k];
            }
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Reference sparse_vector_float serializer ('bf0' composite).
int64_t bmref_float_serialize(const float* vals, int64_t n,
                              uint8_t* out, int64_t out_cap) {
    try {
        fsvect fv;
        for (int64_t i = 0; i < n; ++i)
            fv.push_back(vals[i]);
        bm::sparse_vector_float_serializer<fsvect> ser;
        bm::sparse_vector_float_serial_layout<fsvect> lay;
        ser.serialize(fv, lay);
        if (out && out_cap >= static_cast<int64_t>(lay.size()))
            memcpy(out, lay.buf(), lay.size());
        return static_cast<int64_t>(lay.size());
    } catch (...) {
        return -1;
    }
}

int64_t bmref_float_deserialize(const uint8_t* blob, float* out,
                                int64_t cap) {
    try {
        fsvect fv;
        bm::sparse_vector_float_deserializer<fsvect> des;
        des.deserialize(fv, blob);
        int64_t n = static_cast<int64_t>(fv.size());
        for (int64_t i = 0; i < n && i < cap; ++i)
            out[i] = fv.get(static_cast<bm::id_t>(i));
        return n;
    } catch (...) {
        return -1;
    }
}

// Block-classification ground truth: build + optimize(opt_compress) in the
// reference, return its bv_statistics as
// [bit_blocks, gap_blocks, gaps_by_level[0..3], gap_cap_overhead].
int bmref_gap_stat(const uint64_t* ids, int64_t n, uint64_t size_hint,
                   uint64_t* out7) {
    try {
        bvect bv;
        {
            bvect::bulk_insert_iterator it(bv);
            for (int64_t i = 0; i < n; ++i) it = (bm::id_t)ids[i];
            it.flush();
        }
        if (size_hint) bv.resize((bm::id_t)size_hint);
        bvect::statistics st;
        bv.optimize(0, bvect::opt_compress, &st);
        out7[0] = st.bit_blocks;
        out7[1] = st.gap_blocks;
        for (int i = 0; i < 4; ++i) out7[2 + i] = st.gaps_by_level[i];
        out7[6] = st.gap_cap_overhead;
        return 0;
    } catch (...) {
        return -1;
    }
}

// Round-trip check inside the reference: returns 1 if blob deserializes and
// re-serializes to an equal vector.
int bmref_selfcheck(const uint8_t* blob) {
    try {
        bvect bv;
        bm::deserialize(bv, blob);
        bm::serializer<bvect> ser;
        bm::serializer<bvect>::buffer buf;
        ser.serialize(bv, buf);
        bvect bv2;
        bm::deserialize(bv2, buf.data());
        return bv.equal(bv2) ? 1 : 0;
    } catch (...) {
        return -1;
    }
}

}  // extern "C"
