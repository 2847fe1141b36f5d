// Part of the minimal {fmt} shim (see core.h) — the reference includes this
// header; all supported functionality lives in core.h.
#include "fmt/core.h"
