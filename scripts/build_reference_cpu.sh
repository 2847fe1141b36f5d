#!/bin/bash
# Build the reference PLSSVM's CPU (OpenMP) backend against the interop
# shims (interop/shims: original minimal fmt/cxxopts/fast_float
# replacements — this environment has no network for FetchContent), so the
# REFERENCE's own plssvm-train/plssvm-predict binaries can cross-check
# model-file interoperability with this framework.
#
# Usage: scripts/build_reference_cpu.sh [build_dir]   (default /tmp/refbuild)
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=${PLSSVM_REFERENCE:-/root/reference}
BUILD=${1:-/tmp/refbuild}
cmake -S "$REF" -B "$BUILD" \
    -DCMAKE_BUILD_TYPE=Release \
    -DPLSSVM_TARGET_PLATFORMS=cpu \
    -DPLSSVM_ENABLE_TESTING=OFF \
    -Dfmt_DIR="$REPO/interop/cmake/fmt" \
    -Dcxxopts_DIR="$REPO/interop/cmake/cxxopts" \
    -Dfast_float_DIR="$REPO/interop/cmake/fast_float" \
    -DCMAKE_CXX_FLAGS="-isystem $REPO/interop/shims/include"
cmake --build "$BUILD" -j"$(nproc)"
echo "reference binaries: $BUILD/plssvm-train $BUILD/plssvm-predict"
