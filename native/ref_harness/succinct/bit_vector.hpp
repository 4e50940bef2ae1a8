// Functional stand-in for succinct::bit_vector(+builder) (the succinct
// submodule is not vendored): a little-endian bit array over 64-bit
// words.  The WRITE side (bit_vector_builder) serves the reference's
// sequence writers for byte-level cross-validation; the READ side
// (bit_vector + enumerator + unary_enumerator) implements the exact
// observable semantics the reference's enumerators rely on
// (compact_elias_fano.hpp:143-417, integer_codes.hpp read_gamma):
//
//   unary_enumerator(bv, pos): scan begins AT pos, bit at pos unconsumed.
//   next():   return position of first 1 at-or-after scan; consume it
//             (position() afterwards = that position).
//   skip(k):  land AT the k-th 1 (0-indexed) at-or-after scan, unconsumed.
//   skip0(k): land AT the k-th 0-candidate (0-indexed) at-or-after scan,
//             where a 1 consumed by a prior next() reads as a phantom 0
//             (the EF slow_next_geq "we already consumed it" contract).
//   enumerator(bv, pos): buffered sequential reader; next() = one bit,
//             take(l) = l bits LSB-first, skip_zeros() = count zeros up
//             to and consuming the terminating 1.
//
// This is an original implementation written from those call-site
// contracts; no succinct code is vendored.
#pragma once

#include <cassert>
#include <cstdint>
#include <vector>

#ifdef __BMI2__
#include <immintrin.h>
#endif

namespace succinct {

namespace bits_detail {
inline uint64_t select_in_word(uint64_t word, uint64_t k) {
    // position of the k-th (0-indexed) set bit of word
#ifdef __BMI2__
    return uint64_t(__builtin_ctzll(_pdep_u64(uint64_t(1) << k, word)));
#else
    for (uint64_t i = 0; i < k; ++i) word &= word - 1;
    return uint64_t(__builtin_ctzll(word));
#endif
}
}  // namespace bits_detail

class bit_vector_builder {
public:
    bit_vector_builder() : m_size(0) {}
    explicit bit_vector_builder(uint64_t size, bool init = false)
        : m_bits((size + 63) / 64, init ? uint64_t(-1) : 0), m_size(size) {}

    uint64_t size() const { return m_size; }
    std::vector<uint64_t>& move_bits() { return m_bits; }
    std::vector<uint64_t> const& bits() const { return m_bits; }

    void reserve(uint64_t size) { m_bits.reserve((size + 63) / 64); }

    void zero_extend(uint64_t n) {
        m_size += n;
        m_bits.resize((m_size + 63) / 64, 0);
    }

    void push_back(bool b) {
        uint64_t pos = m_size++;
        m_bits.resize((m_size + 63) / 64, 0);
        if (b) m_bits[pos / 64] |= uint64_t(1) << (pos % 64);
    }

    void set(uint64_t pos, bool b) {
        uint64_t word = pos / 64;
        uint64_t mask = uint64_t(1) << (pos % 64);
        if (b)
            m_bits[word] |= mask;
        else
            m_bits[word] &= ~mask;
    }

    void set_bits(uint64_t pos, uint64_t val, size_t len) {
        assert(len <= 64);
        if (!len) return;
        assert(len == 64 || (val >> len) == 0);
        uint64_t word = pos / 64;
        uint64_t shift = pos % 64;
        m_bits[word] &= ~(((len == 64 ? uint64_t(-1) : ((uint64_t(1) << len) - 1)) << shift));
        m_bits[word] |= val << shift;
        if (shift + len > 64) {
            uint64_t rem = shift + len - 64;
            m_bits[word + 1] &= ~((uint64_t(1) << rem) - 1);
            m_bits[word + 1] |= val >> (64 - shift);
        }
    }

    void append_bits(uint64_t val, size_t len) {
        uint64_t pos = m_size;
        zero_extend(len);
        set_bits(pos, val, len);
    }

    void append(bit_vector_builder const& other) {
        uint64_t pos = m_size;
        zero_extend(other.size());
        uint64_t remaining = other.size();
        for (size_t w = 0; remaining > 0; ++w) {
            size_t take = remaining >= 64 ? 64 : size_t(remaining);
            set_bits(pos, other.m_bits[w] & (take == 64 ? uint64_t(-1)
                                                        : ((uint64_t(1) << take) - 1)),
                     take);
            pos += take;
            remaining -= take;
        }
    }

private:
    std::vector<uint64_t> m_bits;
    uint64_t m_size;
};

class bit_vector {
public:
    bit_vector() : m_size(0) { pad(); }

    explicit bit_vector(bit_vector_builder* from) : m_size(from->size()) {
        m_bits.swap(from->move_bits());
        pad();
    }

    uint64_t size() const { return m_size; }

    struct bits_type : std::vector<uint64_t> {
        void prefetch(size_t i) const { __builtin_prefetch(data() + i); }
    };

    bits_type const& data() const {
        return *reinterpret_cast<bits_type const*>(&m_bits);
    }

    bool operator[](uint64_t pos) const {
        return (m_bits[pos / 64] >> (pos % 64)) & 1;
    }

    // >= 56 valid bits starting at pos (tail padded with zeros)
    uint64_t get_word56(uint64_t pos) const {
        uint64_t block = pos / 64;
        uint64_t shift = pos % 64;
        uint64_t word = m_bits[block] >> shift;
        if (shift) word |= m_bits[block + 1] << (64 - shift);
        return word;
    }

    uint64_t get_bits(uint64_t pos, uint64_t len) const {
        if (!len) return 0;
        uint64_t block = pos / 64;
        uint64_t shift = pos % 64;
        uint64_t mask = len == 64 ? uint64_t(-1) : ((uint64_t(1) << len) - 1);
        if (shift + len <= 64) return (m_bits[block] >> shift) & mask;
        return ((m_bits[block] >> shift) | (m_bits[block + 1] << (64 - shift))) &
               mask;
    }

    // position of the last 1 at-or-before pos (a 1 must exist)
    uint64_t predecessor1(uint64_t pos) const {
        uint64_t block = pos / 64;
        uint64_t shift = 64 - pos % 64 - 1;
        uint64_t word = (m_bits[block] << shift) >> shift;
        while (!word) word = m_bits[--block];
        return block * 64 + 63 - uint64_t(__builtin_clzll(word));
    }

    void swap(bit_vector& other) {
        m_bits.swap(other.m_bits);
        std::swap(m_size, other.m_size);
    }

    template <typename Visitor>
    void map(Visitor& visit) {
        visit(m_size, "m_size")(m_bits, "m_bits");
    }

    class enumerator {
    public:
        enumerator() : m_bv(nullptr), m_position(0), m_buf(0), m_avail(0) {}
        enumerator(bit_vector const& bv, uint64_t pos)
            : m_bv(&bv), m_position(pos), m_buf(0), m_avail(0) {}

        bool next() {
            if (!m_avail) fill();
            bool b = m_buf & 1;
            m_buf >>= 1;
            m_avail -= 1;
            m_position += 1;
            return b;
        }

        uint64_t take(size_t l) {
            if (!l) return 0;
            if (l > 56) {
                uint64_t lo = take(56);
                return lo | (take(l - 56) << 56);
            }
            if (m_avail < l) fill();
            uint64_t val;
            if (l != 64) {
                val = m_buf & ((uint64_t(1) << l) - 1);
                m_buf >>= l;
            } else {
                val = m_buf;
                m_buf = 0;
            }
            m_avail -= l;
            m_position += l;
            return val;
        }

        uint64_t skip_zeros() {
            uint64_t zeros = 0;
            while (!m_buf) {
                zeros += m_avail;
                m_position += m_avail;
                m_avail = 0;
                fill();
            }
            uint64_t l = uint64_t(__builtin_ctzll(m_buf));
            zeros += l;
            m_buf >>= l + 1;
            m_avail -= l + 1;
            m_position += l + 1;
            return zeros;
        }

        uint64_t position() const { return m_position; }

    private:
        void fill() {
            // m_position always names the next unread bit, so a refill
            // simply re-reads from there, replacing any stale buffer.
            // Mask to exactly 56 bits so ctz in skip_zeros never finds a
            // bit beyond m_avail.
            m_buf = m_bv->get_word56(m_position) &
                    ((uint64_t(1) << 56) - 1);
            m_avail = 56;
        }

        bit_vector const* m_bv;
        uint64_t m_position;  // next unread bit
        uint64_t m_buf;       // upcoming bits, LSB = bit at m_position
        size_t m_avail;
    };

    class unary_enumerator {
    public:
        unary_enumerator() : m_data(nullptr), m_position(0), m_buf(0) {}

        unary_enumerator(bit_vector const& bv, uint64_t pos)
            : m_data(bv.m_bits.data()), m_position(pos) {
            m_buf = m_data[pos / 64] & (uint64_t(-1) << (pos % 64));
        }

        uint64_t position() const { return m_position; }

        uint64_t next() {
            uint64_t buf = m_buf;
            while (!buf) {
                m_position = (m_position / 64 + 1) * 64;
                buf = m_data[m_position / 64];
            }
            uint64_t pos_in_word = uint64_t(__builtin_ctzll(buf));
            m_buf = buf & (buf - 1);
            m_position = (m_position & ~uint64_t(63)) + pos_in_word;
            return m_position;
        }

        void skip(uint64_t k) {
            uint64_t skipped = 0;
            uint64_t buf = m_buf;
            uint64_t w = 0;
            while (skipped + (w = uint64_t(__builtin_popcountll(buf))) <= k) {
                skipped += w;
                m_position = (m_position / 64 + 1) * 64;
                buf = m_data[m_position / 64];
            }
            uint64_t pos_in_word =
                bits_detail::select_in_word(buf, k - skipped);
            m_buf = buf & (uint64_t(-1) << pos_in_word);
            m_position = (m_position & ~uint64_t(63)) + pos_in_word;
        }

        void skip0(uint64_t k) {
            uint64_t skipped = 0;
            uint64_t pos_in_word = m_position % 64;
            uint64_t buf = ~m_buf & (uint64_t(-1) << pos_in_word);
            uint64_t w = 0;
            while (skipped + (w = uint64_t(__builtin_popcountll(buf))) <= k) {
                skipped += w;
                m_position = (m_position / 64 + 1) * 64;
                buf = ~m_data[m_position / 64];
            }
            pos_in_word = bits_detail::select_in_word(buf, k - skipped);
            m_buf = ~buf & (uint64_t(-1) << pos_in_word);
            m_position = (m_position & ~uint64_t(63)) + pos_in_word;
        }

    private:
        uint64_t const* m_data;
        uint64_t m_position;  // scan position (bit there unconsumed unless
                              // just returned by next())
        uint64_t m_buf;       // word at m_position/64 with consumed bits 0
    };

private:
    void pad() {
        // two zero words past the end keep get_word56 / enumerator
        // refills in-bounds for any pos < size
        m_bits.resize((m_size + 63) / 64 + 2, 0);
    }

    std::vector<uint64_t> m_bits;
    uint64_t m_size;
};

}  // namespace succinct
