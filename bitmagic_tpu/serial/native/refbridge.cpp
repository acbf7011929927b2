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
// interop extra (serial/refformat.py gates on its availability).  A
// from-scratch decoder for the reference format is tracked as follow-up
// work (SURVEY.md §7 hard part 1).

#include <cstdint>
#include <cstring>
#include <vector>

#include "bm.h"
#include "bmserial.h"

typedef bm::bvector<> bvect;

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
