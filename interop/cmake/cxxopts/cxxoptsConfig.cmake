# Shim package: the headers ride the global -isystem flag (see
# scripts/build_reference_cpu.sh); finding the package just prevents the
# reference's FetchContent fallback (no network here).
set(cxxopts_FOUND TRUE)
