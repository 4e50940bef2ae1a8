// Native whole-chunk decoders for the block-codec zoo.
//
// The reference decodes these with unrolled SSE (block_codecs.hpp:
// 232-506, VarIntG8IU.h, varintgb.h) at ~1-2 G ints/s; the numpy
// rebuilds in dint_tpu/codecs/blocks.py top out at 1-40 M ints/s on
// this host (VERDICT r2 weak #4).  These are straight selector walks
// over the SAME wire formats the Python encoders emit (byte-identical
// to the reference for varintgb / varint_G8IU / tight vbyte; published
// formats for streamvbyte / maskedvbyte; this repo's formats for
// simple16 / optpfor whose originals live in absent submodules).
//
// Every function decodes exactly n values from buf[0..avail) into out
// and returns the bytes consumed, or -1 on truncation/malformed input
// (callers fall back to the numpy path, which raises).  The Python
// vectorized + scalar decoders remain as cross-checked oracles.

#include <cstdint>
#include <cstring>

namespace {

inline uint32_t load_le(const uint8_t* p, int nbytes) {
    uint32_t v = 0;
    memcpy(&v, p, (size_t)nbytes);  // little-endian host
    return nbytes >= 4 ? v : (v & ((1u << (8 * nbytes)) - 1));
}

// unconditional 4-byte load masked to len bytes — the branch-free form
// for the group-codec fast paths (caller guarantees p+4 is in bounds)
// entries past 4 exist only so malformed g8iu descriptors (len up to
// 8) stay defined; real u32 lengths are 1..4
static const uint32_t LEN_MASK[9] = {0, 0xFFu, 0xFFFFu, 0xFFFFFFu,
                                     0xFFFFFFFFu, 0xFFFFFFFFu, 0xFFFFFFFFu,
                                     0xFFFFFFFFu, 0xFFFFFFFFu};

inline uint32_t load4_masked(const uint8_t* p, int len) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v & LEN_MASK[len];
}

}  // namespace

extern "C" {

// Tight variable byte (block_codecs.hpp:20-102): 7-bit groups, the
// HIGH bit set marks the LAST byte of a value.
int64_t zoo_vbyte(const uint8_t* buf, int64_t avail, int64_t n,
                  uint32_t* out) {
    const uint8_t* p = buf;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    // fast path while 5 bytes are always loadable (end - p is a
    // defined ptrdiff even for truncated buffers shorter than 5 —
    // such inputs must fall through to the guarded tail, not load)
    while (i < n && end - p >= 5) {
        uint32_t v = p[0] & 0x7F;
        if (p[0] & 0x80) { p += 1; }
        else if (p[1] & 0x80) { v |= (uint32_t)(p[1] & 0x7F) << 7; p += 2; }
        else if (p[2] & 0x80) {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)(p[2] & 0x7F) << 14);
            p += 3;
        } else if (p[3] & 0x80) {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)(p[2] & 0x7F) << 14)
                 | ((uint32_t)(p[3] & 0x7F) << 21);
            p += 4;
        } else {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)(p[2] & 0x7F) << 14)
                 | ((uint32_t)(p[3] & 0x7F) << 21) | ((uint32_t)p[4] << 28);
            p += 5;
        }
        out[i++] = v;
    }
    while (i < n) {  // guarded tail
        uint32_t v = 0;
        int sh = 0;
        for (;;) {
            if (p >= end) return -1;
            const uint8_t c = *p++;
            v |= (uint32_t)(c & 0x7F) << sh;
            if (c & 0x80) break;
            sh += 7;
            if (sh > 35) return -1;
        }
        out[i++] = v;
    }
    return p - buf;
}

// Classic continuation-bit vbyte (the MaskedVByte wire format): the
// HIGH bit set means MORE bytes follow.
int64_t zoo_maskedvbyte(const uint8_t* buf, int64_t avail, int64_t n,
                        uint32_t* out) {
    const uint8_t* p = buf;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    while (i < n && end - p >= 5) {  // see zoo_vbyte: no fast-path load
        uint32_t v = p[0] & 0x7F;   // unless 5 bytes really remain
        if (!(p[0] & 0x80)) { p += 1; }
        else if (!(p[1] & 0x80)) { v |= (uint32_t)p[1] << 7; p += 2; }
        else if (!(p[2] & 0x80)) {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)p[2] << 14);
            p += 3;
        } else if (!(p[3] & 0x80)) {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)(p[2] & 0x7F) << 14)
                 | ((uint32_t)p[3] << 21);
            p += 4;
        } else {
            v |= ((uint32_t)(p[1] & 0x7F) << 7) | ((uint32_t)(p[2] & 0x7F) << 14)
                 | ((uint32_t)(p[3] & 0x7F) << 21) | ((uint32_t)(p[4] & 0x7F) << 28);
            p += 5;
        }
        out[i++] = v;
    }
    while (i < n) {
        uint32_t v = 0;
        int sh = 0;
        for (;;) {
            if (p >= end) return -1;
            const uint8_t c = *p++;
            v |= (uint32_t)(c & 0x7F) << sh;
            if (!(c & 0x80)) break;
            sh += 7;
            if (sh > 35) return -1;
        }
        out[i++] = v;
    }
    return p - buf;
}

// streamvbyte: (n+3)/4 control bytes (2-bit byte-lengths, minus one),
// then the data bytes.
int64_t zoo_streamvbyte(const uint8_t* buf, int64_t avail, int64_t n,
                        uint32_t* out) {
    const int64_t nct = (n + 3) / 4;
    if (nct > avail) return -1;
    const uint8_t* ctrl = buf;
    const uint8_t* p = buf + nct;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    // fast path: 4 values per control byte while 16 data bytes remain
    while (i + 4 <= n && p + 19 <= end) {
        const uint8_t c = ctrl[i >> 2];
        const int l0 = (c & 3) + 1, l1 = ((c >> 2) & 3) + 1;
        const int l2 = ((c >> 4) & 3) + 1, l3 = ((c >> 6) & 3) + 1;
        out[i] = load4_masked(p, l0); p += l0;
        out[i + 1] = load4_masked(p, l1); p += l1;
        out[i + 2] = load4_masked(p, l2); p += l2;
        out[i + 3] = load4_masked(p, l3); p += l3;
        i += 4;
    }
    while (i < n) {
        const int len = ((ctrl[i >> 2] >> (2 * (i & 3))) & 3) + 1;
        if (p + len > end) return -1;
        uint32_t v = 0;
        for (int b = 0; b < len; ++b) v |= (uint32_t)p[b] << (8 * b);
        out[i++] = v;
        p += len;
    }
    return p - buf;
}

// varintgb (varintgb.h, byte-identical): groups of 4 values, one key
// byte holding four 2-bit (length-1) codes, then the value bytes.  The
// final group may carry fewer than 4 values; only their bytes are
// present.
int64_t zoo_varintgb(const uint8_t* buf, int64_t avail, int64_t n,
                     uint32_t* out) {
    const uint8_t* p = buf;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    while (i + 4 <= n && p + 20 <= end) {  // 1 key + 16 bytes + 3 over-read
        const uint8_t key = *p++;
        const int l0 = (key & 3) + 1, l1 = ((key >> 2) & 3) + 1;
        const int l2 = ((key >> 4) & 3) + 1, l3 = ((key >> 6) & 3) + 1;
        out[i] = load4_masked(p, l0); p += l0;
        out[i + 1] = load4_masked(p, l1); p += l1;
        out[i + 2] = load4_masked(p, l2); p += l2;
        out[i + 3] = load4_masked(p, l3); p += l3;
        i += 4;
    }
    while (i < n) {
        if (p >= end) return -1;
        const uint8_t key = *p++;
        const int take = (int)(n - i < 4 ? n - i : 4);
        for (int j = 0; j < take; ++j) {
            const int len = ((key >> (2 * j)) & 3) + 1;
            if (p + len > end) return -1;
            uint32_t v = 0;
            for (int b = 0; b < len; ++b) v |= (uint32_t)p[b] << (8 * b);
            out[i++] = v;
            p += len;
        }
    }
    return p - buf;
}

// varint_G8IU (VarIntG8IU.h, byte-identical): 9-byte groups — one
// descriptor whose bit i is CLEARED iff data byte i ends a value, then
// 8 data bytes (unused tail bytes zero with bits set).
namespace {
// per-descriptor layout table: value count + (start, len) per slot
struct G8Row {
    uint8_t cnt;
    uint8_t start[8];
    uint8_t len[8];
};

struct G8Tab {
    G8Row rows[256];
    G8Tab() {
        for (int d = 0; d < 256; ++d) {
            G8Row& r = rows[d];
            r.cnt = 0;
            int start = 0;
            for (int b = 0; b < 8; ++b) {
                if (d & (1 << b)) {
                    r.start[r.cnt] = (uint8_t)start;
                    r.len[r.cnt] = (uint8_t)(b + 1 - start);
                    ++r.cnt;
                    start = b + 1;
                }
            }
        }
    }
};
const G8Tab g8tab;
}  // namespace

int64_t zoo_varintg8iu(const uint8_t* buf, int64_t avail, int64_t n,
                       uint32_t* out) {
    const uint8_t* p = buf;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    while (i < n) {
        if (p + 9 > end) return -1;
        const G8Row& r = g8tab.rows[*p ^ 0xFF];  // set bit = value end
        const uint8_t* data = p + 1;
        int take = r.cnt;
        if (take > n - i) take = (int)(n - i);
        if (p + 12 <= end) {  // 4-byte loads stay in bounds (start<=7)
            for (int j = 0; j < take; ++j)
                out[i + j] = load4_masked(data + r.start[j], r.len[j]);
        } else {
            for (int j = 0; j < take; ++j) {
                uint32_t v = 0;
                for (int k = 0; k < r.len[j]; ++k)
                    v |= (uint32_t)data[r.start[j] + k] << (8 * k);
                out[i + j] = v;
            }
        }
        i += take;
        p += 9;
    }
    return p - buf;
}

// simple16 (this repo's homogeneous-mode variant, blocks.py:446-529):
// 4-byte words, selector in the top 4 bits, (count, bits) ladder
// {28x1, 14x2, 9x3, 7x4, 5x5, 4x7, 3x9, 2x14, 1x28}.
int64_t zoo_simple16(const uint8_t* buf, int64_t avail, int64_t n,
                     uint32_t* out) {
    static const int CNT[9] = {28, 14, 9, 7, 5, 4, 3, 2, 1};
    static const int BITS[9] = {1, 2, 3, 4, 5, 7, 9, 14, 28};
    const uint8_t* p = buf;
    const uint8_t* end = buf + avail;
    int64_t i = 0;
    while (i < n) {
        if (p + 4 > end) return -1;
        uint32_t w;
        memcpy(&w, p, 4);
        p += 4;
        const unsigned mode = w >> 28;
        if (mode > 8) return -1;
        const int bits = BITS[mode];
        const uint32_t mask = (1u << bits) - 1;
        int take = CNT[mode];
        if (take > n - i) take = (int)(n - i);
        for (int j = 0; j < take; ++j)
            out[i + j] = (w >> (j * bits)) & mask;
        i += take;
    }
    return p - buf;
}

// optpfor full block (blocks.py:573-595 wire): [b u8][ne u16 LE]
// [ceil(n*b/8) packed low bits][ne u8 exception positions]
// [ne tight-vbyte exception highs]; out[pos] |= high << b.
int64_t zoo_optpfor_block(const uint8_t* buf, int64_t avail, int64_t n,
                          uint32_t* out) {
    if (avail < 3) return -1;
    const int b = buf[0];
    if (b > 32) return -1;
    const int64_t ne = (int64_t)buf[1] | ((int64_t)buf[2] << 8);
    const uint8_t* p = buf + 3;
    const uint8_t* end = buf + avail;
    const int64_t nbytes = (n * b + 7) / 8;
    if (p + nbytes > end) return -1;
    if (b == 0) {
        memset(out, 0, (size_t)n * 4);
    } else if (b == 32) {
        memcpy(out, p, (size_t)n * 4);
    } else {
        const uint32_t mask = (1u << b) - 1;
        int64_t bitpos = 0;
        // 8-byte sliding window: field spans <= 32+7 = 39 bits
        const int64_t n_fast =
            nbytes >= 8 ? ((nbytes - 8) * 8) / b + 1 : 0;
        int64_t j = 0;
        for (; j < n && j < n_fast; ++j, bitpos += b) {
            uint64_t w;
            memcpy(&w, p + (bitpos >> 3), 8);
            out[j] = (uint32_t)((w >> (bitpos & 7)) & mask);
        }
        for (; j < n; ++j, bitpos += b) {  // guarded tail
            uint64_t w = 0;
            const int64_t byte0 = bitpos >> 3;
            const int64_t take = nbytes - byte0 < 8 ? nbytes - byte0 : 8;
            memcpy(&w, p + byte0, (size_t)take);
            out[j] = (uint32_t)((w >> (bitpos & 7)) & mask);
        }
    }
    p += nbytes;
    if (ne) {
        if (p + ne > end) return -1;
        const uint8_t* epos = p;
        p += ne;
        for (int64_t e = 0; e < ne; ++e) {
            uint32_t hi = 0;
            int sh = 0;
            for (;;) {
                if (p >= end) return -1;
                const uint8_t c = *p++;
                hi |= (uint32_t)(c & 0x7F) << sh;
                if (c & 0x80) break;
                sh += 7;
                if (sh > 35) return -1;
            }
            if (epos[e] >= n) return -1;
            out[epos[e]] |= hi << b;
        }
    }
    return p - buf;
}

// QMX payload decode (the ORIGINAL wire format, dint_tpu/codecs/qmx.py
// / qmx.hpp): selector bytes walk BACKWARDS from the end of the
// payload; striped widths unpack 128/256-bit instances as 4 interleaved
// lanes with static per-row shifts (the reference does this with
// unrolled SSE; a plain scalar walk is already ~20x the numpy form).
// Returns bytes of payload consumed from the front (callers know the
// framing length), or -1 on malformed/truncated input.
namespace {
static const int QMX_WIDTH[15] = {0, 1, 2, 3, 4, 5, 6, 7,
                                  8, 9, 10, 12, 16, 21, 32};
static const int QMX_INTS[15] = {256, 128, 64, 40, 32, 24, 20, 36,
                                 16, 28, 12, 20, 8, 12, 4};
// row k of a striped instance sits at lane bit k*w, EXCEPT the
// reference's 12/21-bit packers, which leave format gap bits
// (qmx.py _ROW_SHIFTS)
inline int qmx_row_shift(int w, int k) {
    if (w == 12) { static const int S[5] = {0, 12, 24, 40, 52}; return S[k]; }
    if (w == 21) { static const int S[3] = {0, 21, 43}; return S[k]; }
    return k * w;
}
}  // namespace

extern "C" int64_t zoo_qmx(const uint8_t* buf, int64_t avail, int64_t n,
                           uint32_t* out) {
    int64_t p = 0;
    int64_t k = avail - 1;
    int64_t filled = 0;
    while (p <= k && filled < n) {
        const uint8_t key = buf[k--];
        const int tpe = key >> 4;
        const int low = key & 0x0F;
        const int batch = low ? 16 - low : 16;
        const int w = QMX_WIDTH[tpe];
        const int ints = QMX_INTS[tpe];
        if (w == 0) {
            int64_t take = (int64_t)batch * 256;
            if (take > n - filled) take = n - filled;
            for (int64_t i = 0; i < take; ++i) out[filled + i] = 1;
            filled += (int64_t)batch * 256;  // unclamped, like the encoder
        } else if (w == 8 || w == 16 || w == 32) {
            int64_t take = (int64_t)batch * ints;
            if (take > n - filled) take = n - filled;
            const int64_t nb = take * (w / 8);
            if (p + nb > avail) return -1;
            if (w == 8) {
                for (int64_t i = 0; i < take; ++i) out[filled + i] = buf[p + i];
            } else if (w == 16) {
                for (int64_t i = 0; i < take; ++i) {
                    uint16_t t;
                    memcpy(&t, buf + p + 2 * i, 2);
                    out[filled + i] = t;
                }
            } else {
                memcpy(out + filled, buf + p, (size_t)take * 4);
            }
            filled += take;
            p += nb;
        } else {
            const int words = (w == 7 || w == 9 || w == 12 || w == 21) ? 8 : 4;
            if (p + (int64_t)batch * words * 4 > avail) return -1;
            const int rows = ints / 4;
            const uint64_t mask = ((uint64_t)1 << w) - 1;
            for (int b = 0; b < batch; ++b) {
                const int64_t o = filled + (int64_t)b * ints;
                if (o >= n) { p += (int64_t)(batch - b) * words * 4; break; }
                uint64_t lane[4];
                uint32_t lo[8];
                memcpy(lo, buf + p, (size_t)words * 4);
                p += words * 4;
                for (int j = 0; j < 4; ++j)
                    lane[j] = words == 8
                                  ? (uint64_t)lo[j] | ((uint64_t)lo[j + 4] << 32)
                                  : (uint64_t)lo[j];
                if (o + ints <= n) {
                    for (int r = 0; r < rows; ++r) {
                        const int sh = qmx_row_shift(w, r);
                        uint32_t* dst = out + o + 4 * r;
                        dst[0] = (uint32_t)((lane[0] >> sh) & mask);
                        dst[1] = (uint32_t)((lane[1] >> sh) & mask);
                        dst[2] = (uint32_t)((lane[2] >> sh) & mask);
                        dst[3] = (uint32_t)((lane[3] >> sh) & mask);
                    }
                } else {
                    for (int r = 0; r < rows; ++r) {
                        const int sh = qmx_row_shift(w, r);
                        for (int j = 0; j < 4; ++j) {
                            const int64_t idx = o + 4 * r + j;
                            if (idx < n)
                                out[idx] = (uint32_t)((lane[j] >> sh) & mask);
                        }
                    }
                }
            }
            filled += (int64_t)batch * ints;  // unclamped, like the encoder
        }
    }
    return filled >= n ? p : -1;
}

// --------------------------------------------------------------------
// Interpolative block (level-ordered layout — the exact bit stream
// dint_tpu/codecs/interpolative.py writes; same bit COUNT as the
// reference's DFS coder, block_codecs.hpp:104-151): a vbyte block-sum
// header, then the first n-1 prefix sums interpolative-coded in
// [0, sum] as BFS levels of (fixed-width plane, extra-bit plane).
// This was the one zoo codec without a native decoder — a 16.7M-int
// whole-list decode paid ~25 s of python recursion in the ladder
// image cold start.

namespace {

struct IpBitReader {
    const uint8_t* buf;
    const uint8_t* end;  // first byte past the readable buffer
    uint64_t bitpos = 0;
    bool overrun = false;
    IpBitReader(const uint8_t* b, const uint8_t* e) : buf(b), end(e) {}
    inline uint64_t read(int len) {
        if (len == 0) return 0;
        uint64_t start = bitpos;
        bitpos += len;
        const uint8_t* p = buf + (start >> 3);
        int shift = int(start & 7);
        uint64_t v;
        if (p + 9 <= end) {  // fast path: unaligned load + spill byte
            uint64_t w;
            std::memcpy(&w, p, 8);
            v = w >> shift;
            int got = 64 - shift;
            if (got < len) v |= uint64_t(p[8]) << got;
        } else {  // buffer tail: byte-exact loads, never past `end`
            int64_t nb = end - p;
            if (int64_t((uint64_t(shift) + uint64_t(len) + 7) >> 3) > nb) {
                overrun = true;  // truncated input
                return 0;
            }
            uint64_t w = 0;
            for (int64_t i = 0; i < nb && i < 8; ++i)
                w |= uint64_t(p[i]) << (8 * i);
            v = w >> shift;
            // len <= 33 and nb < 9 here, so 64 - shift >= 57 bits of w
            // always cover the value — no spill byte needed
        }
        return v & ((1ull << len) - 1);
    }
};

struct IpNode {
    int s, e;
    uint64_t low, high;
};

void ip_decode_prefix_sums(IpBitReader& br, int n, uint64_t low0,
                           uint64_t high0, uint64_t* vals) {
    if (n <= 0) return;
    IpNode buf_a[160], buf_b[160];
    uint64_t xs[160];
    uint32_t ms[160];
    uint8_t need[160];
    IpNode* level = buf_a;
    IpNode* next = buf_b;
    level[0] = {0, n, low0, high0};
    int L = 1;
    while (L && !br.overrun) {
        for (int i = 0; i < L; ++i) {
            uint64_t u = level[i].high - level[i].low + 1;
            int b = 63 - __builtin_clzll(u);
            uint64_t m = (1ull << (b + 1)) - u;
            uint64_t x = br.read(b);
            xs[i] = x;
            ms[i] = uint32_t(m);
            need[i] = x >= m;
        }
        for (int i = 0; i < L; ++i)
            if (need[i]) xs[i] = 2 * xs[i] + br.read(1) - ms[i];
        int nl = 0;
        for (int i = 0; i < L; ++i) {
            const IpNode& nd = level[i];
            int mid = nd.s + (nd.e - nd.s) / 2;
            uint64_t val = nd.low + xs[i];
            vals[mid] = val;
            if (mid - nd.s > 0) next[nl++] = {nd.s, mid, nd.low, val};
            if (nd.e - (mid + 1) > 0)
                next[nl++] = {mid + 1, nd.e, val, nd.high};
        }
        IpNode* t = level;
        level = next;
        next = t;
        L = nl;
    }
}

}  // namespace

int64_t zoo_interpolative(const uint8_t* buf, int64_t avail, int64_t n,
                          uint32_t* out) {
    if (n <= 0 || n > 256 || avail <= 0) return -1;
    // vbyte sum header (TightVariableByte: high bit ends a value)
    int64_t pos = 0;
    uint32_t sum = 0;
    int shift = 0;
    for (;;) {
        if (pos >= avail) return -1;
        uint8_t c = buf[pos++];
        sum |= uint32_t(c & 0x7F) << shift;
        if (c & 0x80) break;
        shift += 7;
        // a valid TightVariableByte u32 is at most 5 bytes; a
        // truncated/garbage buffer with no terminator must fail clean,
        // not shift past 31 (UB)
        if (shift > 28) return -1;
    }
    uint64_t psums[256];
    IpBitReader br(buf + pos, buf + avail);
    ip_decode_prefix_sums(br, int(n) - 1, 0, sum, psums);
    if (br.overrun) return -1;
    psums[n - 1] = sum;
    uint64_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = uint32_t(psums[i] - prev);
        prev = psums[i];
    }
    return pos + int64_t((br.bitpos + 7) >> 3);
}

// Whole-list decode: loop the per-chunk decoders natively so a
// 1M-int list costs ONE ctypes call instead of one per chunk
// (dint_tpu/index/vroom_zoo.py decode_list_zoo's chunk loop).
// codec ids match _ZOO_MANY_IDS in dint_tpu/codecs/zoonative.py.
int64_t zoo_many(int64_t codec, const uint8_t* buf, int64_t avail,
                 int64_t n, int64_t chunk, uint32_t* out) {
    typedef int64_t (*fn_t)(const uint8_t*, int64_t, int64_t, uint32_t*);
    static const fn_t FNS[8] = {
        zoo_vbyte, zoo_maskedvbyte, zoo_streamvbyte, zoo_varintgb,
        zoo_varintg8iu, zoo_simple16, zoo_optpfor_block,
        zoo_interpolative,
    };
    if (codec < 0 || codec > 7 || chunk <= 0) return -1;
    const fn_t fn = FNS[codec];
    int64_t pos = 0;
    for (int64_t p = 0; p < n; p += chunk) {
        const int64_t m = n - p < chunk ? n - p : chunk;
        const int64_t used = fn(buf + pos, avail - pos, m, out + p);
        if (used < 0) return -1;
        pos += used;
    }
    return pos;
}

}  // extern "C"
