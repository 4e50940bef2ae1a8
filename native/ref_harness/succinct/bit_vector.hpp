// Functional stand-in for succinct::bit_vector_builder (the succinct
// submodule is not vendored): just enough WRITE-side behavior — a
// little-endian bit array over 64-bit words — for the reference's
// sequence writers (compact_elias_fano, ranked bitvector, gamma/delta
// codes, partitioned sequences) to run for cross-validation.  The
// read-side bit_vector/enumerators are NOT provided.
#pragma once

#include <cassert>
#include <cstdint>
#include <vector>

namespace succinct {

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

// Read-side STUB: lets the reference enumerator classes compile; the
// cross-validation harness never instantiates or calls them (only the
// writers run).  Every method aborts if reached.
class bit_vector {
public:
    bit_vector() { abort(); }
    uint64_t size() const { abort(); }
    uint64_t get_bits(uint64_t, uint64_t) const { abort(); }
    uint64_t get_word56(uint64_t) const { abort(); }
    uint64_t predecessor1(uint64_t) const { abort(); }
    struct bits_type : std::vector<uint64_t> {
        void prefetch(size_t) const {}
    };
    bits_type const& data() const { abort(); }

    class enumerator {
    public:
        enumerator() {}
        enumerator(bit_vector const&, uint64_t) { abort(); }
        bool next() { abort(); }
        uint64_t take(uint64_t) { abort(); }
        uint64_t skip_zeros() { abort(); }
        uint64_t position() const { abort(); }
    };

    class unary_enumerator {
    public:
        unary_enumerator() {}
        unary_enumerator(bit_vector const&, uint64_t) { abort(); }
        uint64_t next() { abort(); }
        uint64_t position() const { abort(); }
        void skip(uint64_t) { abort(); }
        void skip0(uint64_t) { abort(); }
    };
};

}  // namespace succinct
