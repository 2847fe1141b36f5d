// Part of the minimal {fmt} shim (see core.h): fmt::output_file as a thin
// buffered FILE* wrapper with the .print() method the reference uses.
#ifndef PLSSVM_INTEROP_FMT_OS_H_
#define PLSSVM_INTEROP_FMT_OS_H_
#include "fmt/core.h"

#include <cstdio>
#include <stdexcept>
#include <string>

namespace fmt {

class ostream_file {
  public:
    explicit ostream_file(const std::string &name)
        : f_(std::fopen(name.c_str(), "wb")) {
        if (f_ == nullptr)
            throw std::runtime_error("cannot open file: " + name);
    }
    ostream_file(ostream_file &&other) noexcept : f_(other.f_) {
        other.f_ = nullptr;
    }
    ostream_file(const ostream_file &) = delete;
    ~ostream_file() {
        if (f_ != nullptr) std::fclose(f_);
    }

    template <typename... Args>
    void print(std::string_view f, const Args &...args) {
        std::string s = ::fmt::format(f, args...);
        std::fwrite(s.data(), 1, s.size(), f_);
    }

  private:
    std::FILE *f_;
};

inline ostream_file output_file(const std::string &name) {
    return ostream_file(name);
}

}  // namespace fmt
#endif
