// Minimal stand-in for the pieces of boost::filesystem the reference
// headers use (path(str).filename().string(), exists) — boost is not
// installed in this image.
#pragma once

#include <string>
#include <sys/stat.h>

namespace boost {
namespace filesystem {

class path {
public:
    path(std::string const& s) : m_s(s) {}
    path(const char* s) : m_s(s) {}

    path filename() const {
        auto p = m_s.find_last_of('/');
        return path(p == std::string::npos ? m_s : m_s.substr(p + 1));
    }

    std::string string() const { return m_s; }

private:
    std::string m_s;
};

inline bool exists(path const& p) {
    struct stat st;
    return ::stat(p.string().c_str(), &st) == 0;
}

inline bool exists(std::string const& s) { return exists(path(s)); }

}  // namespace filesystem
}  // namespace boost
