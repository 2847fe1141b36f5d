"""Persistent XLA compilation cache.

TPU-native equivalent of the reference's SHA-256-keyed on-disk OpenCL binary
cache (``src/plssvm/backends/OpenCL/detail/utility.cpp:233-355``, cache dir
``$TMP/plssvm_opencl_cache/<target>_<checksum>/``): first compilation of a
(shape, kernel, mode) learn program is expensive — especially with remote
TPU compilation — so compiled executables are cached on disk keyed by the
program fingerprint, making every subsequent process start warm.

Enabled automatically on import of the package CLI/bench entry points;
opt out with ``PLSSVM_NO_COMPILATION_CACHE=1`` or choose the directory with
``PLSSVM_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "plssvm_tpu_xla_cache"
)


def enable_compilation_cache() -> str | None:
    """Turn on JAX's persistent compilation cache; returns the dir or None.

    Scoped per backend platform: CPU executables are AOT-compiled for the
    *compiling* host's ISA, so sharing a cache between the remote-compile
    TPU path and the local CPU risks loading incompatible code (SIGILL).
    The cache is only enabled for non-CPU backends.
    """
    if os.environ.get("PLSSVM_NO_COMPILATION_CACHE") == "1":
        return None
    import jax

    try:
        platform = jax.default_backend()
    except RuntimeError:
        # backend init can fail (e.g. the TPU tunnel is held by another
        # process); the cache is an optimization, never a hard error here —
        # the actual compute path will surface the failure with context
        return None
    if platform == "cpu":
        return None
    cache_dir = os.environ.get("PLSSVM_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program regardless of its compile time / size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
