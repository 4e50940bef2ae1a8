// Stand-in for boost/lexical_cast.hpp (boost is not installed): the
// reference's configuration.hpp casts env-var strings to numbers.
#pragma once

#include <sstream>
#include <string>

namespace boost {

template <typename T, typename S>
T lexical_cast(S const& s) {
    std::stringstream ss;
    ss << s;
    T out{};
    ss >> out;
    return out;
}

}  // namespace boost
