// Minimal boost::format shim (no boost in this container). Supports the
// printf-style specs the reference uses ("%s/image_0/%06d.png",
// "%d loop closing candidates" etc.): each '%<spec>' consumed left to
// right by operator%, rendered with snprintf.
#pragma once
#include <cstdio>
#include <string>

namespace boost {

class format {
public:
    explicit format(const std::string &fmt) : fmt_(fmt), pos_(0), out_() {}

    template <typename T>
    format &operator%(const T &v) {
        consume_literal();
        // capture one %-spec
        size_t start = pos_;
        if (pos_ < fmt_.size() && fmt_[pos_] == '%') {
            ++pos_;
            while (pos_ < fmt_.size() &&
                   std::string("sdifgxueco.0123456789l-+ #").find(fmt_[pos_])
                       != std::string::npos) {
                char c = fmt_[pos_++];
                if (std::string("sdifgxueco").find(c) != std::string::npos)
                    break;  // conversion char ends the spec
            }
        }
        std::string spec = fmt_.substr(start, pos_ - start);
        char buf[512];
        render(buf, sizeof(buf), spec, v);
        out_ += buf;
        return *this;
    }

    std::string str() const {
        format tmp(*this);
        tmp.consume_literal();
        return tmp.out_ + tmp.fmt_.substr(tmp.pos_);
    }

    operator std::string() const { return str(); }

private:
    void consume_literal() {
        while (pos_ < fmt_.size()) {
            if (fmt_[pos_] == '%') {
                if (pos_ + 1 < fmt_.size() && fmt_[pos_ + 1] == '%') {
                    out_ += '%';
                    pos_ += 2;
                    continue;
                }
                break;
            }
            out_ += fmt_[pos_++];
        }
    }

    static void render(char *buf, size_t n, const std::string &spec,
                       const std::string &v) {
        std::snprintf(buf, n, "%s", v.c_str());
    }
    static void render(char *buf, size_t n, const std::string &spec,
                       const char *v) {
        std::snprintf(buf, n, "%s", v);
    }
    template <typename T>
    static void render(char *buf, size_t n, const std::string &spec, T v) {
        std::string s = spec.empty() ? guess_spec(v) : spec;
        std::snprintf(buf, n, s.c_str(), v);
    }
    static std::string guess_spec(int) { return "%d"; }
    static std::string guess_spec(long) { return "%ld"; }
    static std::string guess_spec(unsigned) { return "%u"; }
    static std::string guess_spec(unsigned long) { return "%lu"; }
    static std::string guess_spec(double) { return "%g"; }
    static std::string guess_spec(float) { return "%g"; }

    std::string fmt_;
    size_t pos_;
    std::string out_;
};

inline std::string str(const format &f) { return f.str(); }

} // namespace boost
