// Minimal glog shim for building the reference headless in this container
// (no libglog ships here). Covers exactly the surface the reference uses:
// LOG(INFO/WARNING/ERROR/FATAL), CHECK(x), FLAGS_colorlogtostderr.
#pragma once
#include <cstdlib>
#include <iostream>
#include <sstream>

namespace ldso_shim {

inline bool &flags_colorlogtostderr() {
    static bool v = false;
    return v;
}

class LogLine {
public:
    explicit LogLine(const char *sev, bool fatal = false)
        : fatal_(fatal) { ss_ << "[" << sev << "] "; }
    ~LogLine() {
        std::cerr << ss_.str() << std::endl;
        if (fatal_) std::abort();
    }
    template <typename T>
    LogLine &operator<<(const T &v) { ss_ << v; return *this; }
    // std::endl and other manipulators
    LogLine &operator<<(std::ostream &(*)(std::ostream &)) { return *this; }

private:
    std::ostringstream ss_;
    bool fatal_;
};

} // namespace ldso_shim

#define FLAGS_colorlogtostderr ldso_shim::flags_colorlogtostderr()
#define LOG_INFO    ldso_shim::LogLine("INFO")
#define LOG_WARNING ldso_shim::LogLine("WARN")
#define LOG_ERROR   ldso_shim::LogLine("ERROR")
#define LOG_FATAL   ldso_shim::LogLine("FATAL", true)
#define LOG(severity) LOG_##severity

#define CHECK(cond) \
    if (!(cond)) LOG(FATAL) << "CHECK failed: " #cond " "
