// Minimal fast_float-compatible shim (original code): maps
// fast_float::from_chars onto std::from_chars, which libstdc++ >= 11
// provides for floating-point types.  Only the surface the reference
// PLSSVM uses (from_chars -> {ptr, ec} for float/double).
#ifndef PLSSVM_INTEROP_FAST_FLOAT_H_
#define PLSSVM_INTEROP_FAST_FLOAT_H_

#include <charconv>
#include <system_error>

namespace fast_float {

struct from_chars_result {
    const char *ptr;
    std::errc ec;
};

template <typename T>
from_chars_result from_chars(const char *first, const char *last, T &value) {
    auto res = std::from_chars(first, last, value);
    return from_chars_result{res.ptr, res.ec};
}

}  // namespace fast_float

#endif  // PLSSVM_INTEROP_FAST_FLOAT_H_
