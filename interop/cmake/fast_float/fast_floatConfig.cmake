# Shim package (see cxxoptsConfig.cmake).
set(fast_float_FOUND TRUE)
