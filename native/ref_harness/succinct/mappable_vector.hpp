// Minimal stand-in for the reference's succinct::mapper::mappable_vector
// (the succinct submodule is not vendored here).  Only what the
// dictionary headers need to COMPILE: the cross-validation harness uses
// the builders exclusively, so none of this is executed.
#pragma once

#include <cstdint>
#include <vector>

namespace succinct {
namespace mapper {

template <typename T>
struct mappable_vector {
    std::vector<T> m_data;

    size_t size() const { return m_data.size(); }
    T const* data() const { return m_data.data(); }
    T const& operator[](size_t i) const { return m_data[i]; }

    void steal(std::vector<T>& v) { m_data.swap(v); }
    void swap(mappable_vector& other) { m_data.swap(other.m_data); }

    template <typename Range>
    void assign(Range const& r) {
        m_data.assign(r.begin(), r.end());
    }
};

}  // namespace mapper
}  // namespace succinct
