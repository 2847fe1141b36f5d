"""Block-size sweep + roofline measurement for the Pallas Gram-matvec.

Run on a real TPU:  python scripts/tune_pallas.py

Reports sustained FLOP/s per (bm, bn, bk) tile configuration (the analog of
tuning the reference's THREAD_BLOCK_SIZE/INTERNAL_BLOCK_SIZE CMake knobs,
``constants.hpp:20-38``) and the cached-mode GEMV HBM bandwidth for the
roofline comparison (BASELINE.json north star).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plssvm_sparse_fp22_tpu.ops.pallas_matvec import gram_matvec_pallas
    from plssvm_sparse_fp22_tpu.ops.kernel_functions import PRECISION
    from plssvm_sparse_fp22_tpu.types import KernelType

    D = int(os.environ.get("TUNE_D", 16384))
    f = int(os.environ.get("TUNE_F", 256))
    reps = int(os.environ.get("TUNE_REPS", 8))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(D, f)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=D).astype(np.float32))
    flops = 2 * D * D * f

    print(f"platform={jax.default_backend()} D={D} f={f}")

    norm = jax.jit(lambda u: u / jnp.sqrt(jnp.sum(u * u)))

    def timeit(fn):
        """Chained dependent calls, materializing the final value.

        Through the remote-TPU relay, block_until_ready is unreliable and
        identical requests may be served from a cache; a dependency chain
        ending in a host-materialized scalar is the only timing that must
        execute every step."""
        float(fn(v0)[0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = v0
            for _ in range(reps):
                out = norm(fn(out))
            _ = float(out[0])  # force the whole chain
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # --- pallas tile sweep ---
    configs = [
        (256, 256, 256), (256, 512, 256), (512, 256, 256), (512, 512, 256),
        (1024, 256, 256), (256, 1024, 256), (512, 1024, 256), (1024, 512, 256),
        (1024, 1024, 256), (2048, 512, 256), (512, 2048, 256),
    ]
    results = []
    for bm, bn, bk in configs:
        try:
            dt = timeit(lambda vv, bm=bm, bn=bn, bk=bk: gram_matvec_pallas(
                KernelType.rbf, X, vv, degree=3, gamma=1.0 / f, coef0=0.0,
                bm=bm, bn=bn, bk=min(bk, f),
            ))
            tf = flops / dt / 1e12
            results.append((tf, bm, bn, bk))
            print(f"  bm={bm:5d} bn={bn:5d} bk={bk:4d}: {dt*1e3:8.2f} ms  {tf:6.2f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"  bm={bm:5d} bn={bn:5d} bk={bk:4d}: FAILED {type(e).__name__}", flush=True)
    if results:
        best = max(results)
        print(f"best: bm={best[1]} bn={best[2]} bk={best[3]} -> {best[0]:.2f} TFLOP/s")

    # --- symmetric (triangular) kernel sweep: the training hot path ---
    from plssvm_sparse_fp22_tpu.ops.pallas_matvec import gram_matvec_pallas_sym

    print("symmetric kernel (effective TFLOP/s counts the full n^2 product):")
    sym_results = []
    for bm in (256, 512, 1024):
        try:
            dt = timeit(lambda vv, bm=bm: gram_matvec_pallas_sym(
                KernelType.rbf, X, vv, degree=3, gamma=1.0 / f, coef0=0.0,
                bm=bm, bk=min(512, f),
            ))
            tf = flops / dt / 1e12
            sym_results.append((tf, bm))
            print(f"  bm={bm:5d}: {dt*1e3:8.2f} ms  {tf:6.2f} eff-TFLOP/s", flush=True)
        except Exception as e:
            print(f"  bm={bm:5d}: FAILED {type(e).__name__}", flush=True)
    if sym_results:
        best = max(sym_results)
        print(f"best sym: bm={best[1]} -> {best[0]:.2f} eff-TFLOP/s "
              f"(set PLSSVM_SYM_BLOCK_SIZE={best[1]})")

    # --- cached-mode GEMV roofline (HBM-bound) ---
    K = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32))

    gemv = jax.jit(lambda vv: jnp.dot(
        K, vv, preferred_element_type=jnp.float32, precision=PRECISION))
    dt = timeit(gemv)
    gbs = D * D * 4 / dt / 1e9
    print(f"cached GEMV {D}x{D}: {dt*1e3:.2f} ms = {gbs:.0f} GB/s HBM read")


if __name__ == "__main__":
    main()
