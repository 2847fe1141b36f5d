"""Block-size sweep + roofline measurement for the Pallas Gram-matvec.

Run on a real TPU:  python scripts/tune_pallas.py

Reports per-CG-iteration time per tile configuration (the analog of tuning
the reference's THREAD_BLOCK_SIZE/INTERNAL_BLOCK_SIZE CMake knobs,
``constants.hpp:20-38``) and the cached-mode GEMV HBM bandwidth for the
roofline comparison (BASELINE.json north star).

Timing method: each candidate matvec is embedded in a fixed-iteration-count
CG ``lax.while_loop`` and timed as the SLOPE between two iteration caps
(fresh right-hand sides per call).  Through the remote-TPU relay, a single
dispatch costs ~400 us and identical requests may be served from a cache, so
per-call timings are meaningless — the slope cancels both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plssvm_sparse_fp22_tpu.ops.kernel_functions import PRECISION
    from plssvm_sparse_fp22_tpu.ops.pallas_matvec import (
        gram_matvec_pallas, make_sym_matvec)
    from plssvm_sparse_fp22_tpu.solver.cg import cg_solve
    from plssvm_sparse_fp22_tpu.types import KernelType

    D = int(os.environ.get("TUNE_D", 4096))
    f = int(os.environ.get("TUNE_F", 256))
    lo = int(os.environ.get("TUNE_LO", 32))
    hi = int(os.environ.get("TUNE_HI", 128))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(D, f)).astype(np.float32))
    mask = jnp.ones(D, jnp.float32)
    flops = 2 * D * D * f  # full n^2 product per matvec

    print(f"platform={jax.default_backend()} D={D} f={f}")

    def mk_b(seed):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=D).astype(np.float32))

    def slope_per_iter(matvec):
        """us per CG iteration with this matvec (two-point slope, median)."""

        @jax.jit
        def cg(b, imax):
            return cg_solve(matvec, b, mask, jnp.float32(0.0), imax).x

        jax.block_until_ready(cg(mk_b(0), jnp.int32(lo)))
        jax.block_until_ready(cg(mk_b(0), jnp.int32(hi)))
        vals = []
        for t in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(cg(mk_b(10 + t), jnp.int32(lo)))
            tl = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(cg(mk_b(20 + t), jnp.int32(hi)))
            th = time.perf_counter() - t0
            if th > tl:
                vals.append((th - tl) / (hi - lo))
        vals.sort()
        return (vals[len(vals) // 2] if vals else float("nan")) * 1e6

    # --- symmetric (triangular) kernel sweep: the training hot path ---
    print("symmetric kernel (eff-TFLOP/s counts the full n^2 product):")
    sym_results = []
    for bm in (256, 512, 1024):
        try:
            mv = make_sym_matvec(
                KernelType.rbf, X, degree=3, gamma=1.0 / f, coef0=0.0, bm=bm)
            us = slope_per_iter(mv)
            tf = flops / (us * 1e-6) / 1e12
            sym_results.append((tf, bm))
            print(f"  bm={bm:5d}: {us:8.1f} us/iter  {tf:6.2f} eff-TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"  bm={bm:5d}: FAILED {type(e).__name__}", flush=True)
    if sym_results:
        best = max(sym_results)
        print(f"best sym: bm={best[1]} -> {best[0]:.2f} eff-TFLOP/s "
              f"(set PLSSVM_SYM_BLOCK_SIZE={best[1]})")

    # --- full (non-symmetric) kernel sweep: ring-hop / predict path ---
    print("full kernel:")
    results = []
    for bm, bn in ((256, 256), (256, 512), (512, 256), (512, 512),
                   (1024, 256), (512, 1024), (1024, 512)):
        try:
            def mv(vv, bm=bm, bn=bn):
                return gram_matvec_pallas(
                    KernelType.rbf, X, vv, degree=3, gamma=1.0 / f, coef0=0.0,
                    bm=bm, bn=bn, bk=min(256, f))

            us = slope_per_iter(mv)
            tf = flops / (us * 1e-6) / 1e12
            results.append((tf, bm, bn))
            print(f"  bm={bm:5d} bn={bn:5d}: {us:8.1f} us/iter  {tf:6.2f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"  bm={bm:5d} bn={bn:5d}: FAILED {type(e).__name__}", flush=True)
    if results:
        best = max(results)
        print(f"best: bm={best[1]} bn={best[2]} -> {best[0]:.2f} TFLOP/s")

    # --- cached-mode GEMV roofline (HBM-bound) ---
    K = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32))

    def gemv_mv(vv):
        return jnp.dot(K, vv, preferred_element_type=jnp.float32,
                       precision=PRECISION)

    us = slope_per_iter(gemv_mv)
    gbs = D * D * 4 / (us * 1e-6) / 1e9
    print(f"cached GEMV {D}x{D}: {us:.1f} us/iter = {gbs:.0f} GB/s HBM read")


if __name__ == "__main__":
    main()
