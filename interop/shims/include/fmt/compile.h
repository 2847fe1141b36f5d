// Part of the minimal {fmt} shim (see core.h): FMT_COMPILE is an identity —
// the shim formats at runtime.
#include "fmt/core.h"
#define FMT_COMPILE(s) s
