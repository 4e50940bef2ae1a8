// Minimal stand-in for boost::iostreams::mapped_file_source (boost is
// not installed): read-only mmap of a whole file, the only behavior
// binary_collection.hpp needs.
#pragma once

#include <fcntl.h>
#include <stdexcept>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace boost {
namespace iostreams {

class mapped_file_source {
public:
    mapped_file_source() {}
    ~mapped_file_source() { close(); }

    mapped_file_source(mapped_file_source const&) = delete;
    mapped_file_source& operator=(mapped_file_source const&) = delete;

    void open(std::string const& filename) {
        close();
        int fd = ::open(filename.c_str(), O_RDONLY);
        if (fd < 0) return;
        struct stat st;
        if (fstat(fd, &st) != 0) {
            ::close(fd);
            return;
        }
        m_size = size_t(st.st_size);
        if (m_size) {
            m_data = ::mmap(nullptr, m_size, PROT_READ, MAP_SHARED, fd, 0);
            if (m_data == MAP_FAILED) {
                m_data = nullptr;
                m_size = 0;
            }
        }
        ::close(fd);
        m_open = m_data != nullptr || m_size == 0;
    }

    bool is_open() const { return m_open; }

    char const* data() const { return static_cast<char const*>(m_data); }

    size_t size() const { return m_size; }

private:
    void close() {
        if (m_data) ::munmap(m_data, m_size);
        m_data = nullptr;
        m_size = 0;
        m_open = false;
    }

    void* m_data = nullptr;
    size_t m_size = 0;
    bool m_open = false;
};

}  // namespace iostreams
}  // namespace boost
