// Minimal Pangolin stand-in for a HEADLESS build of the reference
// (scripts/crossval).  The real Pangolin is a GUI library; the reference
// only needs these symbols to parse headers (MapDrawer.h signatures) and
// link System.cc's Shutdown().  No rendering ever happens: the driver
// constructs ORB_SLAM2::System with bUseViewer=false.
#ifndef CROSSVAL_PANGOLIN_STUB_H
#define CROSSVAL_PANGOLIN_STUB_H

#include <string>

namespace pangolin {

struct OpenGlMatrix {
    double m[16];
    void SetIdentity() {
        for (int i = 0; i < 16; ++i) m[i] = (i % 5 == 0) ? 1.0 : 0.0;
    }
};

inline void BindToContext(const std::string&) {}

}  // namespace pangolin

#endif
