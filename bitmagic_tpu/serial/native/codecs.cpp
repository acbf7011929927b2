// Native codec hot loops: Elias gamma + Binary Interpolative Coding.
//
// The serialization codecs are inherently sequential bitstreams; the
// reference implements them as scalar C++ (src/encoding.h — no SIMD BIC in
// bmsse4/bmavx2 either).  This translation unit provides the same
// minimal-binary/BIC/gamma codes as bitmagic_tpu/serial/encoding.py,
// bit-for-bit: MSB-first streams, byte-aligned payload starts.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

namespace {

struct BitW {
    uint8_t* buf;
    size_t byte = 0;
    uint64_t acc = 0;
    int nbits = 0;

    inline void put(uint64_t v, int n) {
        if (n > 32) {           // split: keeps nbits + n within 64 bits
            put(v >> 32, n - 32);
            put(v & 0xFFFFFFFFull, 32);
            return;
        }
        acc = (acc << n) | (v & ((n >= 64) ? ~0ull : ((1ull << n) - 1)));
        nbits += n;
        while (nbits >= 8) {
            nbits -= 8;
            buf[byte++] = static_cast<uint8_t>(acc >> nbits);
        }
    }
    inline uint64_t bit_length() const { return byte * 8 + nbits; }
    inline void flush() {
        if (nbits) {
            buf[byte++] = static_cast<uint8_t>(acc << (8 - nbits));
            nbits = 0;
            acc = 0;
        }
    }
};

struct BitR {
    const uint8_t* buf;
    uint64_t bitpos;

    inline uint64_t get(int n) {
        uint64_t v = 0;
        while (n > 0) {
            uint64_t bi = bitpos >> 3;
            int off = static_cast<int>(bitpos & 7);
            int avail = 8 - off;
            int take = n < avail ? n : avail;
            uint8_t cur = buf[bi];
            uint8_t chunk =
                static_cast<uint8_t>((cur >> (avail - take)) & ((1u << take) - 1));
            v = (v << take) | chunk;
            bitpos += take;
            n -= take;
        }
        return v;
    }
    inline int get_bit() {
        uint64_t bi = bitpos >> 3;
        int off = static_cast<int>(bitpos & 7);
        ++bitpos;
        return (buf[bi] >> (7 - off)) & 1;
    }
};

inline int bit_length_u64(uint64_t v) {
    return v ? 64 - __builtin_clzll(v) : 0;
}

// minimal binary code of x in [lo, hi] — must match encoding._mb_encode
inline void mb_encode(BitW& w, int64_t x, int64_t lo, int64_t hi) {
    int64_t r = hi - lo + 1;
    if (r <= 1) return;
    int b = bit_length_u64(static_cast<uint64_t>(r - 1));
    int64_t extra = (1ll << b) - r;
    int64_t c = x - lo;
    if (c < extra)
        w.put(static_cast<uint64_t>(c), b - 1);
    else
        w.put(static_cast<uint64_t>(c + extra), b);
}

inline int64_t mb_decode(BitR& rd, int64_t lo, int64_t hi) {
    int64_t r = hi - lo + 1;
    if (r <= 1) return lo;
    int b = bit_length_u64(static_cast<uint64_t>(r - 1));
    int64_t extra = (1ll << b) - r;
    int64_t v = (b > 1) ? static_cast<int64_t>(rd.get(b - 1)) : 0;
    if (v < extra) return lo + v;
    v = (v << 1) | rd.get_bit();
    return lo + v - extra;
}

struct Frame { int64_t i0, i1, lo, hi; };

}  // namespace

extern "C" {

// BIC-encode a strictly increasing int64 array with values in [lo, hi].
// out must have capacity >= n * 8 + 16 bytes.  Returns total bits written.
uint64_t bm_bic_encode(const int64_t* arr, int64_t n, int64_t lo, int64_t hi,
                       uint8_t* out) {
    BitW w{out};
    // explicit stack identical in traversal order to the Python encoder
    // (push right, then left; pop = left first)
    Frame* stack = new Frame[2 * (n + 2) + 8];
    int64_t sp = 0;
    stack[sp++] = {0, n, lo, hi};
    while (sp) {
        Frame f = stack[--sp];
        int64_t cnt = f.i1 - f.i0;
        if (cnt == 0) continue;
        int64_t mid = (f.i0 + f.i1) >> 1;
        int64_t x = arr[mid];
        int64_t nleft = mid - f.i0;
        int64_t nright = f.i1 - mid - 1;
        mb_encode(w, x, f.lo + nleft, f.hi - nright);
        stack[sp++] = {mid + 1, f.i1, x + 1, f.hi};
        stack[sp++] = {f.i0, mid, f.lo, x - 1};
    }
    uint64_t bits = w.bit_length();
    w.flush();
    delete[] stack;
    return bits;
}

// Inverse; reads from data starting at bit_offset.  Returns new bit offset.
uint64_t bm_bic_decode(const uint8_t* data, uint64_t bit_offset, int64_t n,
                       int64_t lo, int64_t hi, int64_t* out) {
    BitR rd{data, bit_offset};
    Frame* stack = new Frame[2 * (n + 2) + 8];
    int64_t sp = 0;
    stack[sp++] = {0, n, lo, hi};
    while (sp) {
        Frame f = stack[--sp];
        int64_t cnt = f.i1 - f.i0;
        if (cnt == 0) continue;
        int64_t mid = (f.i0 + f.i1) >> 1;
        int64_t nleft = mid - f.i0;
        int64_t nright = f.i1 - mid - 1;
        int64_t x = mb_decode(rd, f.lo + nleft, f.hi - nright);
        out[mid] = x;
        stack[sp++] = {mid + 1, f.i1, x + 1, f.hi};
        stack[sp++] = {f.i0, mid, f.lo, x - 1};
    }
    delete[] stack;
    return rd.bitpos;
}

// Elias gamma array encode (values >= 1).  Returns total bits.
uint64_t bm_gamma_encode(const uint64_t* arr, int64_t n, uint8_t* out) {
    BitW w{out};
    for (int64_t i = 0; i < n; ++i) {
        int nb = bit_length_u64(arr[i]);
        w.put(arr[i], 2 * nb - 1);
    }
    uint64_t bits = w.bit_length();
    w.flush();
    return bits;
}

uint64_t bm_gamma_decode(const uint8_t* data, uint64_t bit_offset, int64_t n,
                         uint64_t* out) {
    BitR rd{data, bit_offset};
    for (int64_t i = 0; i < n; ++i) {
        int nz = 0;
        while (rd.get_bit() == 0) ++nz;
        uint64_t rest = nz ? rd.get(nz) : 0;
        out[i] = nz ? ((1ull << nz) | rest) : 1ull;
    }
    return rd.bitpos;
}

}  // extern "C"
