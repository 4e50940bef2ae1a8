// Stub for boost/progress.hpp (boost is not installed): the reference
// dictionary-building utilities include it, but the cross-validation
// harness never runs the code paths that construct a progress_display.
#pragma once

namespace boost {

struct progress_display {
    explicit progress_display(unsigned long = 0) {}
    unsigned long operator+=(unsigned long n) { return n; }
    unsigned long operator++() { return 0; }
};

}  // namespace boost
