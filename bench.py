"""Headline benchmark: CG iterations/s on the implicit RBF kernel-matvec.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "iters/s", "vs_baseline": N}``.

Measures the flagship configuration from BASELINE.json: RBF-kernel LS-SVM
CG where the implicit kernel matrix is never materialized — each iteration
streams row blocks of X through the MXU (``ops/matvec.py`` mode='implicit').
Timing excludes compilation (warmup run first); the loop runs a fixed
iteration count (eps=0 disables the convergence stop).

``vs_baseline`` compares against a live-measured numpy double-precision
implementation of the same implicit-matvec CG algorithm the reference's
OpenMP backend executes per iteration (full kernel-matrix product each
iteration, ``OpenMP/svm_kernel.cpp:21-47``) on this host's CPU.  The
reference publishes no benchmark numbers (BASELINE.md), so the its
algorithm-on-CPU is the honest comparable.

Environment knobs: PLSSVM_BENCH_N (default 4096), PLSSVM_BENCH_F (256),
PLSSVM_BENCH_ITERS (256; the lo/hi iteration span must dwarf per-dispatch
timing noise of the remote-TPU relay), PLSSVM_BENCH_MODE (implicit).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _bench_jax(X, gamma, iters, mode, backend_name):
    """CG iterations/s via a two-point slope: time the same program at two
    iteration caps with fresh right-hand sides and divide the difference.
    This cancels constant dispatch/transfer overhead and defeats any
    result-level caching between identical requests (observed through the
    remote-TPU relay)."""
    import jax
    import jax.numpy as jnp
    from plssvm_sparse_fp22_tpu.models.base import _learn_jit
    from plssvm_sparse_fp22_tpu.types import BackendType, KernelType

    n, f = X.shape
    dept = n - 1
    block = 256
    D = ((dept + block - 1) // block) * block
    dtype = np.float32

    X_pad = np.zeros((D, f), dtype=dtype)
    X_pad[:dept] = X[:dept]
    mask = np.zeros(D, dtype=dtype)
    mask[:dept] = 1.0

    kw = dict(kernel=KernelType.rbf, degree=3, mode=mode,
              backend=BackendType.from_string(backend_name))
    X_dev = jnp.asarray(X_pad)
    xl_dev = jnp.asarray(X[-1].astype(dtype))
    mask_dev = jnp.asarray(mask)

    def run(seed, n_iters):
        rng = np.random.default_rng(seed)
        b_pad = np.zeros(D, dtype=dtype)
        b_pad[:dept] = np.where(rng.normal(size=dept) > 0, 2.0, -2.0)
        args = (
            X_dev, xl_dev, jnp.asarray(b_pad), mask_dev,
            jnp.asarray(gamma, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(1.0, dtype),
            jnp.asarray(0.0, dtype),   # eps = 0 -> fixed iteration count
            jnp.asarray(n_iters, jnp.int32),
        )
        t0 = time.perf_counter()
        out = _learn_jit(*args, **kw)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - t0
        assert int(out[4]) == n_iters
        return elapsed

    lo, hi = max(4, iters // 4), iters
    run(0, lo)  # compile both iteration counts (same program: imax is traced)
    per_iter = float("inf")
    samples = []
    for trial in range(5):
        t_lo = run(100 + trial, lo)
        t_hi = run(200 + trial, hi)
        if t_hi > t_lo:
            samples.append((t_hi - t_lo) / (hi - lo))
    if not samples:
        per_iter = run(300, hi) / hi
    else:
        # median: robust against relay dispatch-latency outliers in either
        # direction (a min would keep noise-deflated samples)
        samples.sort()
        per_iter = samples[len(samples) // 2]
    return 1.0 / per_iter


def _bench_numpy_baseline(X, gamma, iters):
    """The reference algorithm per CG iteration: full implicit kernel-matrix
    product, recomputed every iteration (no K caching), float64."""
    n, f = X.shape
    dept = n - 1
    Xd = X[:dept].astype(np.float64)
    sq = (Xd * Xd).sum(1)
    rng = np.random.default_rng(0)
    v = rng.normal(size=dept)
    q = rng.normal(size=dept)

    def matvec(v):
        G = Xd @ Xd.T
        K = np.exp(-gamma * np.maximum(sq[:, None] + sq[None, :] - 2.0 * G, 0.0))
        s = v.sum()
        t = q @ v
        return K @ v + 2.0 * s - s * q - t + v

    matvec(v)  # warmup caches
    reps = max(1, min(3, iters // 8))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = matvec(v)
        v /= np.linalg.norm(v)
    elapsed = (time.perf_counter() - t0) / reps
    return 1.0 / elapsed


def main():
    from plssvm_sparse_fp22_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("PLSSVM_BENCH_N", 4096))
    f = int(os.environ.get("PLSSVM_BENCH_F", 256))
    iters = int(os.environ.get("PLSSVM_BENCH_ITERS", 256))
    mode = os.environ.get("PLSSVM_BENCH_MODE", "implicit")
    gamma = 1.0 / f

    rng = np.random.default_rng(42)
    X = rng.normal(size=(n, f)).astype(np.float32)

    import jax

    # the fused Pallas kernel is the flagship implicit path on TPU; the plain
    # XLA path everywhere else
    backend_name = "pallas" if jax.default_backend() == "tpu" else "xla"
    value = _bench_jax(X, gamma, iters, mode, backend_name)
    baseline = _bench_numpy_baseline(X, gamma, iters)

    print(json.dumps({
        "metric": f"cg_iters_per_s_rbf_{n}x{f}_{mode}_{jax.default_backend()}",
        "value": round(value, 3),
        "unit": "iters/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
