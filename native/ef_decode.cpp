// Word-parallel Elias-Fano / ranked-bitvector bulk decode.
//
// The reference's enumerators (compact_elias_fano.hpp:263-388) walk the
// high-bits stream word-at-a-time with broadword select; the numpy path
// (dint_tpu/utils/bitio.py ones_positions) expands every bit to a byte
// first and runs ~24 M ints/s.  This file is the word-parallel native
// form: a ctz/popcount walk over the high-bits words fused with a
// sequential fixed-width extraction of the low bits — one linear pass
// over each stream, no per-bit materialization.
//
// All functions are bounds-safe against the caller-provided word count
// and return the number of values produced (callers assert == n).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t read_field(const uint64_t* words, uint64_t nwords,
                           uint64_t pos, uint32_t width) {
    const uint64_t wi = pos >> 6;
    const uint32_t sh = (uint32_t)(pos & 63);
    uint64_t v = words[wi] >> sh;
    if (sh + width > 64 && wi + 1 < nwords)
        v |= words[wi + 1] << (64 - sh);
    if (width < 64)
        v &= ((uint64_t)1 << width) - 1;
    return v;
}

} // namespace

extern "C" {

// Positions (relative to `start`) of the first `n` set bits in
// [start, end).  Returns the count written (< n if fewer ones exist).
int64_t ef_select_all(const uint64_t* words, uint64_t nwords,
                      uint64_t start, uint64_t end, int64_t n,
                      uint64_t* out) {
    if (end <= start || n <= 0) return 0;
    int64_t k = 0;
    uint64_t wi = start >> 6;
    const uint64_t wlast = (end - 1) >> 6;
    if (wi >= nwords) return 0;
    // first word: mask off bits below start
    uint64_t w = words[wi] >> (start & 63);
    w <<= (start & 63);  // keep bit positions absolute within the word
    for (;;) {
        if (wi == wlast) {
            const uint32_t endb = (uint32_t)(end & 63);
            if (endb) w &= (((uint64_t)1 << endb) - 1);
        }
        const uint64_t base = (wi << 6) - start;
        if (k + __builtin_popcountll(w) <= n) {
            while (w) {
                out[k++] = base + (uint64_t)__builtin_ctzll(w);
                w &= w - 1;
            }
        } else {
            while (w && k < n) {
                out[k++] = base + (uint64_t)__builtin_ctzll(w);
                w &= w - 1;
            }
        }
        if (k >= n || wi == wlast) return k;
        if (++wi >= nwords) return k;
        w = words[wi];
    }
}

// Sequential fixed-width fields: out[i] = bits[start + i*width, width).
void ef_read_fields_seq(const uint64_t* words, uint64_t nwords,
                        uint64_t start, uint32_t width, int64_t n,
                        uint64_t* out) {
    if (width == 0) {
        memset(out, 0, (size_t)n * sizeof(uint64_t));
        return;
    }
    uint64_t pos = start;
    for (int64_t i = 0; i < n; ++i, pos += width)
        out[i] = read_field(words, nwords, pos, width);
}

// Fused compact_elias_fano decode_all:
//   out[i] = ((select1(i, high bits) - i - 1) << low_bits) | low[i]
// where the high-bits region is [high_off, high_off + high_len) and the
// low bits are n sequential low_bits-wide fields at low_off.
// Single pass: the select walk emits final values directly, pulling
// each low field with one unaligned 64-bit load (valid for widths
// <= 56; wider fields take the guarded scalar read).
// Returns the count decoded (callers assert == n).
int64_t ef_decode_fused(const uint64_t* words, uint64_t nwords,
                        uint64_t high_off, uint64_t high_len,
                        uint64_t low_off, uint32_t low_bits, int64_t n,
                        uint64_t* out) {
    if (n <= 0) return 0;
    const uint64_t end = high_off + high_len;
    const uint64_t mask =
        low_bits < 64 ? (((uint64_t)1 << low_bits) - 1) : ~(uint64_t)0;
    const uint8_t* bytes = (const uint8_t*)words;
    const uint64_t total_bits = nwords << 6;
    // fields with index < k_fast can use the unaligned-load fast path:
    // byte offset of the field start + 8 bytes stays inside the array
    // and (bit-in-byte) + low_bits <= 64.
    int64_t k_fast = 0;
    if (low_bits > 0 && low_bits <= 56 && total_bits >= 64 + low_off) {
        const uint64_t span = total_bits - 64 - low_off;
        k_fast = (int64_t)(span / low_bits) + 1;
        if (k_fast > n) k_fast = n;
    }
    int64_t k = 0;
    uint64_t wi = high_off >> 6;
    const uint64_t wlast = (end - 1) >> 6;
    if (wi >= nwords || end <= high_off) return 0;
    uint64_t w = (words[wi] >> (high_off & 63)) << (high_off & 63);
    for (;;) {
        if (wi == wlast) {
            const uint32_t endb = (uint32_t)(end & 63);
            if (endb) w &= (((uint64_t)1 << endb) - 1);
        }
        const uint64_t base = (wi << 6) - high_off;
        if (low_bits && k + __builtin_popcountll(w) <= k_fast) {
            // whole word stays on the fast path: no per-one checks
            uint64_t lowpos = low_off + (uint64_t)k * low_bits;
            while (w) {
                const uint64_t rel = base + (uint64_t)__builtin_ctzll(w);
                uint64_t raw;
                memcpy(&raw, bytes + (lowpos >> 3), 8);
                out[k] = ((rel - (uint64_t)k - 1) << low_bits)
                         | ((raw >> (lowpos & 7)) & mask);
                ++k;
                lowpos += low_bits;
                w &= w - 1;
            }
        } else {
            while (w && k < n) {
                const uint64_t rel = base + (uint64_t)__builtin_ctzll(w);
                const uint64_t high = (rel - (uint64_t)k - 1) << low_bits;
                uint64_t lv = 0;
                if (low_bits) {
                    const uint64_t lowpos = low_off + (uint64_t)k * low_bits;
                    if (k < k_fast) {
                        uint64_t raw;
                        memcpy(&raw, bytes + (lowpos >> 3), 8);
                        lv = (raw >> (lowpos & 7)) & mask;
                    } else {
                        lv = read_field(words, nwords, lowpos, low_bits);
                    }
                }
                out[k++] = high | lv;
                w &= w - 1;
            }
        }
        if (k >= n || wi == wlast) return k;
        if (++wi >= nwords) return k;
        w = words[wi];
    }
}

} // extern "C"

// ---------------------------------------------------------------------------
// Whole-list partitioned-sequence decode (partitioned_sequence.hpp:122-239,
// uniform_partitioned_sequence.hpp:19-105): one native call replaces the
// per-partition Python loop in dint_tpu/codecs/ef.py:_partitioned_base.
// Base sequences: indexed_sequence (tag bit: ef=0 / rb=1; all_ones implicit
// when universe == n) and strict_sequence (same tags over strict params).
// Returns 0 on success, -1 on any structural mismatch (caller falls back
// to the numpy path, which asserts).
// ---------------------------------------------------------------------------

namespace {

inline uint32_t ceil_log2_u64(uint64_t x) {
    return x > 1 ? (uint32_t)(64 - __builtin_clzll(x - 1)) : 0;
}

struct Rd {
    const uint64_t* w;
    uint64_t nw;
    uint64_t pos;
};

inline uint64_t rd_take(Rd& r, uint32_t len) {
    const uint64_t v = len ? read_field(r.w, r.nw, r.pos, len) : 0;
    r.pos += len;
    return v;
}

inline int64_t rd_skip_zeros(Rd& r) {
    const uint64_t start = r.pos;
    for (;;) {
        const uint64_t wi = r.pos >> 6;
        if (wi >= r.nw) return -1;
        const uint32_t sh = (uint32_t)(r.pos & 63);
        const uint64_t word = r.w[wi] >> sh;
        if (word == 0) {
            r.pos += 64 - sh;
            continue;
        }
        const uint32_t z = (uint32_t)__builtin_ctzll(word);
        r.pos += z + 1;
        return (int64_t)(r.pos - start - 1);
    }
}

inline int64_t rd_gamma(Rd& r) {
    const int64_t l = rd_skip_zeros(r);
    if (l < 0 || l > 63) return -1;
    return (int64_t)((rd_take(r, (uint32_t)l) | ((uint64_t)1 << l)) - 1);
}

inline int64_t rd_delta(Rd& r) {
    const int64_t l = rd_gamma(r);
    if (l < 0 || l > 63) return -1;
    return (int64_t)((rd_take(r, (uint32_t)l) | ((uint64_t)1 << l)) - 1);
}

struct EFOff {
    uint32_t lower_bits;
    uint64_t higher_bits_length;
    uint64_t high_off, low_off, end;
};

inline EFOff ef_off(uint64_t base, uint64_t universe, uint64_t n,
                    uint32_t ls0, uint32_t ls1) {
    EFOff o;
    o.lower_bits =
        universe > n ? (uint32_t)(63 - __builtin_clzll(universe / n)) : 0;
    o.higher_bits_length = n + (universe >> o.lower_bits) + 2;
    const uint32_t pointer_size = ceil_log2_u64(o.higher_bits_length);
    const uint64_t pointers0 = (o.higher_bits_length - n) >> ls0;
    const uint64_t pointers1 = n >> ls1;
    o.high_off = base + (pointers0 + pointers1) * pointer_size;
    o.low_off = o.high_off + o.higher_bits_length;
    o.end = o.low_off + n * o.lower_bits;
    return o;
}

// Fused CEF decode emitting out[i] = value + add (+ i when plus_index).
// Returns the end bit offset of the sequence, or UINT64_MAX on error.
uint64_t cef_decode_core(const uint64_t* words, uint64_t nwords,
                         uint64_t base, uint64_t universe, int64_t n,
                         uint32_t ls0, uint32_t ls1, uint64_t add,
                         int plus_index, uint64_t* out) {
    const EFOff o = ef_off(base, universe, (uint64_t)n, ls0, ls1);
    if ((o.end + 63) / 64 > nwords) return ~(uint64_t)0;
    const uint64_t high_off = o.high_off;
    const uint64_t end = high_off + o.higher_bits_length;
    const uint32_t low_bits = o.lower_bits;
    const uint64_t mask =
        low_bits < 64 ? (((uint64_t)1 << low_bits) - 1) : ~(uint64_t)0;
    const uint8_t* bytes = (const uint8_t*)words;
    const uint64_t total_bits = nwords << 6;
    int64_t k_fast = 0;
    if (low_bits > 0 && low_bits <= 56 && total_bits >= 64 + o.low_off) {
        k_fast = (int64_t)((total_bits - 64 - o.low_off) / low_bits) + 1;
        if (k_fast > n) k_fast = n;
    }
    int64_t k = 0;
    uint64_t wi = high_off >> 6;
    const uint64_t wlast = (end - 1) >> 6;
    if (wi >= nwords) return ~(uint64_t)0;
    uint64_t w = (words[wi] >> (high_off & 63)) << (high_off & 63);
    while (k < n) {
        if (wi == wlast) {
            const uint32_t endb = (uint32_t)(end & 63);
            if (endb) w &= (((uint64_t)1 << endb) - 1);
        }
        const uint64_t hbase = (wi << 6) - high_off;
        if (low_bits && k + __builtin_popcountll(w) <= k_fast) {
            uint64_t lowpos = o.low_off + (uint64_t)k * low_bits;
            if (plus_index) {
                while (w) {
                    const uint64_t rel = hbase + (uint64_t)__builtin_ctzll(w);
                    uint64_t raw;
                    memcpy(&raw, bytes + (lowpos >> 3), 8);
                    out[k] = (((rel - (uint64_t)k - 1) << low_bits)
                              | ((raw >> (lowpos & 7)) & mask))
                             + add + (uint64_t)k;
                    ++k;
                    lowpos += low_bits;
                    w &= w - 1;
                }
            } else {
                while (w) {
                    const uint64_t rel = hbase + (uint64_t)__builtin_ctzll(w);
                    uint64_t raw;
                    memcpy(&raw, bytes + (lowpos >> 3), 8);
                    out[k] = (((rel - (uint64_t)k - 1) << low_bits)
                              | ((raw >> (lowpos & 7)) & mask))
                             + add;
                    ++k;
                    lowpos += low_bits;
                    w &= w - 1;
                }
            }
        } else {
            while (w && k < n) {
                const uint64_t rel = hbase + (uint64_t)__builtin_ctzll(w);
                uint64_t v = (rel - (uint64_t)k - 1) << low_bits;
                if (low_bits) {
                    const uint64_t lowpos = o.low_off + (uint64_t)k * low_bits;
                    if (k < k_fast) {
                        uint64_t raw;
                        memcpy(&raw, bytes + (lowpos >> 3), 8);
                        v |= (raw >> (lowpos & 7)) & mask;
                    } else {
                        v |= read_field(words, nwords, lowpos, low_bits);
                    }
                }
                out[k] = v + add + (plus_index ? (uint64_t)k : 0);
                ++k;
                w &= w - 1;
            }
        }
        if (k >= n) break;
        if (wi == wlast || ++wi >= nwords) return ~(uint64_t)0;
        w = words[wi];
    }
    return o.end;
}

// compact_ranked_bitvector decode emitting out[i] = position + add.
// Returns the end bit offset, or UINT64_MAX on error.
uint64_t rb_decode_core(const uint64_t* words, uint64_t nwords,
                        uint64_t base, uint64_t universe, int64_t n,
                        uint32_t log_rank1, uint32_t log_s1, uint64_t add,
                        uint64_t* out) {
    const uint32_t rank1_sample_size = ceil_log2_u64((uint64_t)n + 1);
    const uint32_t pointer_size = ceil_log2_u64(universe);
    const uint64_t rank1_samples = universe >> log_rank1;
    const uint64_t pointers1 = (uint64_t)n >> log_s1;
    const uint64_t bits_off = base + rank1_samples * rank1_sample_size
                              + pointers1 * pointer_size;
    const uint64_t end = bits_off + universe;
    if ((end + 63) / 64 > nwords) return ~(uint64_t)0;
    int64_t k = 0;
    uint64_t wi = bits_off >> 6;
    const uint64_t wlast = (end - 1) >> 6;
    uint64_t w = (words[wi] >> (bits_off & 63)) << (bits_off & 63);
    for (;;) {
        if (wi == wlast) {
            const uint32_t endb = (uint32_t)(end & 63);
            if (endb) w &= (((uint64_t)1 << endb) - 1);
        }
        const uint64_t pbase = (wi << 6) - bits_off + add;
        if (k + __builtin_popcountll(w) <= n) {
            while (w) {
                out[k++] = pbase + (uint64_t)__builtin_ctzll(w);
                w &= w - 1;
            }
        } else {
            while (w && k < n) {
                out[k++] = pbase + (uint64_t)__builtin_ctzll(w);
                w &= w - 1;
            }
        }
        if (k >= n) return end;
        if (wi == wlast || ++wi >= nwords) return ~(uint64_t)0;
        w = words[wi];
    }
}

// indexed_sequence / strict_sequence decode at `off` with value bias `add`.
// Returns 0 on success, -1 on error.
int indexed_decode(const uint64_t* words, uint64_t nwords, uint64_t off,
                   uint64_t universe, int64_t n, uint32_t ef_ls0,
                   uint32_t ef_ls1, uint32_t rb_lr1, uint32_t rb_ls1,
                   int strict, uint64_t add, uint64_t* out) {
    if ((int64_t)universe == n) {  // all_ones (no tag bit)
        for (int64_t i = 0; i < n; ++i) out[i] = add + (uint64_t)i;
        return 0;
    }
    const uint64_t tag = read_field(words, nwords, off, 1);
    const uint64_t body = off + 1;
    uint64_t r;
    if (strict) {
        if (tag == 0)
            r = cef_decode_core(words, nwords, body,
                                universe - (uint64_t)n + 1, n, 63, ef_ls1,
                                add, /*plus_index=*/1, out);
        else
            r = rb_decode_core(words, nwords, body, universe, n, 63, rb_ls1,
                               add, out);
    } else {
        if (tag == 0)
            r = cef_decode_core(words, nwords, body, universe, n, ef_ls0,
                                ef_ls1, add, 0, out);
        else
            r = rb_decode_core(words, nwords, body, universe, n, rb_lr1,
                               rb_ls1, add, out);
    }
    return r == ~(uint64_t)0 ? -1 : 0;
}

} // namespace

extern "C" {

// Whole partitioned / uniform-partitioned sequence decode.
// strict selects the strict_sequence partition base (freq lists).
// Returns 0 on success, -1 on error (caller falls back to numpy).
int pef_decode_all(const uint64_t* words, uint64_t nwords, uint64_t offset,
                   uint64_t universe, int64_t n, uint32_t ef_ls0,
                   uint32_t ef_ls1, uint32_t rb_lr1, uint32_t rb_ls1,
                   int uniform, uint32_t log_partition_size, int strict,
                   uint64_t* out) {
    if (n <= 0) return -1;
    Rd r{words, nwords, offset};
    const int64_t g = rd_gamma(r);
    if (g < 0) return -1;
    const int64_t partitions = g + 1;  // written with write_gamma_nonzero
    // structural sanity before any allocation: every partition holds
    // >= 1 value, so a count beyond n can only come from corrupt bits
    // — return -1 (numpy fallback) rather than letting std::vector
    // throw through the extern "C" frame and abort the process
    if (partitions > n) return -1;
    if (partitions == 1) {
        const uint64_t cur_base = rd_take(r, ceil_log2_u64(universe));
        uint64_t part_universe = 1;
        if (n > 1) {
            const int64_t ub = rd_delta(r);
            if (ub < 0) return -1;
            part_universe =
                ub == 0 ? universe - cur_base : (uint64_t)ub + 1;
        }
        return indexed_decode(words, nwords, r.pos, part_universe, n,
                              ef_ls0, ef_ls1, rb_lr1, rb_ls1, strict,
                              cur_base, out);
    }
    const int64_t endpoint_bits = rd_gamma(r);
    if (endpoint_bits < 0 || endpoint_bits > 63) return -1;
    uint64_t pos = r.pos;
    std::vector<uint64_t> partition((size_t)partitions);
    if (!uniform) {
        const EFOff so =
            ef_off(pos, (uint64_t)n, (uint64_t)partitions - 1, ef_ls0, ef_ls1);
        const uint64_t e = cef_decode_core(
            words, nwords, pos, (uint64_t)n, partitions - 1, ef_ls0, ef_ls1,
            0, 0, partition.data());
        if (e == ~(uint64_t)0 || e != so.end) return -1;
        pos = so.end;
    } else {
        const uint64_t ps = (uint64_t)1 << log_partition_size;
        for (int64_t k = 0; k < partitions - 1; ++k)
            partition[(size_t)k] = (uint64_t)(k + 1) * ps;
    }
    partition[(size_t)partitions - 1] = (uint64_t)n;
    std::vector<uint64_t> ubs((size_t)partitions + 1);
    const EFOff uo =
        ef_off(pos, universe, (uint64_t)partitions + 1, ef_ls0, ef_ls1);
    {
        const uint64_t e = cef_decode_core(
            words, nwords, pos, universe, partitions + 1, ef_ls0, ef_ls1,
            0, 0, ubs.data());
        if (e == ~(uint64_t)0 || e != uo.end) return -1;
        pos = uo.end;
    }
    std::vector<uint64_t> endpoints((size_t)partitions);
    endpoints[0] = 0;
    for (int64_t k = 1; k < partitions; ++k) {
        endpoints[(size_t)k] =
            read_field(words, nwords, pos, (uint32_t)endpoint_bits);
        pos += (uint64_t)endpoint_bits;
    }
    const uint64_t seq_base = pos;
    int64_t cur_i = 0;
    uint64_t cur_base = ubs[0];
    for (int64_t k = 0; k < partitions; ++k) {
        const int64_t endpos = (int64_t)partition[(size_t)k];
        const int64_t m = endpos - cur_i;
        if (m <= 0 || endpos > n) return -1;
        const uint64_t ub = ubs[(size_t)k + 1];
        const uint64_t rel_universe = ub - cur_base + 1;
        if (indexed_decode(words, nwords, seq_base + endpoints[(size_t)k],
                           rel_universe, m, ef_ls0, ef_ls1, rb_lr1, rb_ls1,
                           strict, cur_base, out + cur_i) != 0)
            return -1;
        cur_base = ub + 1;
        cur_i = endpos;
    }
    return cur_i == n ? 0 : -1;
}

} // extern "C"

// ---------------------------------------------------------------------------
// optimal_partition: the PEF partitioning DP (optimal_partition.hpp:69-121),
// the encode-side hot loop of the partitioned-sequence family.  The Python
// form (dint_tpu/codecs/ef.py optimal_partition) is a faithful scalar loop
// at ~25K ints/s; this is the identical DP (same double arithmetic, same
// comparison order, same window sweep) over closed-form bitsize costs for
// indexed_sequence (strict=0) and strict_sequence (strict=1).
// Returns the number of partition endpoints written to `out` (ascending,
// last == n), or -1 if out_cap is too small.
// ---------------------------------------------------------------------------

namespace {

inline double ef_bitsize_d(uint64_t universe, uint64_t n,
                           uint32_t ls0, uint32_t ls1) {
    // mirrors ef_offsets (dint_tpu/codecs/ef.py:112-130)
    uint32_t lower_bits = 0;
    if (universe > n) {
        const uint64_t q = universe / n;
        lower_bits = 63 - (uint32_t)__builtin_clzll(q);  // floor_log2(q), q>=1
    }
    const uint64_t higher_bits_length = n + (universe >> lower_bits) + 2;
    const uint64_t pointer_size = ceil_log2_u64(higher_bits_length);
    const uint64_t pointers0 = (higher_bits_length - n) >> ls0;
    const uint64_t pointers1 = n >> ls1;
    return (double)((pointers0 + pointers1) * pointer_size +
                    higher_bits_length + n * (uint64_t)lower_bits);
}

inline double rb_bitsize_d(uint64_t universe, uint64_t n,
                           uint32_t lr1, uint32_t ls1) {
    const uint64_t r1size = ceil_log2_u64(n + 1);
    const uint64_t psize = ceil_log2_u64(universe);
    const uint64_t r1samples = universe >> lr1;
    const uint64_t ptrs1 = n >> ls1;
    return (double)(r1samples * r1size + ptrs1 * psize + universe);
}

struct PartCost {
    int strict;
    uint32_t ef_ls0, ef_ls1, rb_lr1, rb_ls1;
    double fix_cost;

    double operator()(uint64_t universe, uint64_t m) const {
        // indexed_sequence / strict_sequence bitsize + fix_cost
        // (ef.py _choose; strict params disable zero sampling: ls0=63)
        double best = (universe == m) ? 0.0 : 9.2233720368547758e18;
        double ef, rb;
        if (strict) {
            // strict EF codes (universe - m + 1, m) under strict params
            ef = ef_bitsize_d(universe - m + 1, m, 63, ef_ls1) + 1.0;
            rb = rb_bitsize_d(universe, m, 63, rb_ls1) + 1.0;
        } else {
            ef = ef_bitsize_d(universe, m, ef_ls0, ef_ls1) + 1.0;
            rb = rb_bitsize_d(universe, m, rb_lr1, rb_ls1) + 1.0;
        }
        if (ef < best) best = ef;
        if (rb < best) best = rb;
        return best + fix_cost;
    }
};

} // namespace

extern "C" {

int64_t opt_partition(const uint64_t* values, int64_t size, uint64_t universe,
                      double eps1, double eps2, double fix_cost, int strict,
                      uint32_t ef_ls0, uint32_t ef_ls1, uint32_t rb_lr1,
                      uint32_t rb_ls1, int64_t out_cap, int64_t* out) {
    const PartCost cost{strict, ef_ls0, ef_ls1, rb_lr1, rb_ls1, fix_cost};
    const double single_block_cost = cost(universe, (uint64_t)size);
    std::vector<double> min_cost((size_t)size + 1, single_block_cost);
    min_cost[0] = 0.0;
    const double cost_lb = cost(1, 1);

    struct Window {
        int64_t start, end;
        uint64_t min_p, max_p;
        double bound;
    };
    std::vector<Window> windows;
    {
        double cost_bound = cost_lb;
        for (;;) {
            if (!(eps1 == 0.0 || cost_bound < cost_lb / eps1)) break;
            windows.push_back(Window{0, 0, size ? values[0] : 0, 0, cost_bound});
            if (cost_bound >= single_block_cost) break;
            cost_bound = cost_bound * (1.0 + eps2);
        }
    }
    std::vector<int64_t> path((size_t)size + 1, 0);
    for (int64_t i = 0; i < size; ++i) {
        int64_t last_end = i + 1;
        for (auto& w : windows) {
            while (w.end < last_end) {
                w.max_p = values[w.end];
                ++w.end;
            }
            for (;;) {
                const double window_cost =
                    cost(w.max_p - w.min_p + 1, (uint64_t)(w.end - w.start));
                if (min_cost[(size_t)i] + window_cost <
                    min_cost[(size_t)w.end]) {
                    min_cost[(size_t)w.end] = min_cost[(size_t)i] + window_cost;
                    path[(size_t)w.end] = i;
                }
                last_end = w.end;
                if (w.end == size) break;
                if (window_cost >= w.bound) break;
                w.max_p = values[w.end];
                ++w.end;
            }
            w.min_p = values[w.start] + 1;
            ++w.start;
        }
    }
    int64_t cnt = 0;
    for (int64_t cur = size; cur != 0; cur = path[(size_t)cur]) ++cnt;
    if (cnt > out_cap) return -1;
    int64_t k = cnt;
    for (int64_t cur = size; cur != 0; cur = path[(size_t)cur])
        out[--k] = cur;
    return cnt;
}

} // extern "C"
