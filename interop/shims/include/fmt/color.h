// Part of the minimal {fmt} shim (see core.h): text styles are accepted and
// ignored (no terminal styling in this environment).
#ifndef PLSSVM_INTEROP_FMT_COLOR_H_
#define PLSSVM_INTEROP_FMT_COLOR_H_
#include "fmt/core.h"

namespace fmt {

enum class color { red, green, blue, yellow, orange, white, black, magenta, cyan };
enum class emphasis : unsigned { bold = 1, italic = 2, underline = 4 };

struct text_style {};

inline text_style fg(color) { return {}; }
inline text_style bg(color) { return {}; }
inline text_style operator|(text_style, text_style) { return {}; }
inline text_style operator|(emphasis, text_style) { return {}; }
inline text_style operator|(text_style, emphasis) { return {}; }
inline text_style operator|(emphasis, emphasis) { return {}; }

template <typename... Args>
std::string format(text_style, std::string_view f, const Args &...args) {
    return format(f, args...);
}

template <typename... Args>
void print(text_style, std::string_view f, const Args &...args) {
    print(f, args...);
}

}  // namespace fmt
#endif
