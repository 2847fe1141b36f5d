"""Where does a CG iteration spend its time on the real chip?

Times, at the headline bench shape (4096x256 rbf implicit):
  1. the symmetric Pallas Gram-matvec alone (rbf vs linear -> exp cost),
  2. the full implicit operator (matvec + rank-1/diagonal corrections),
  3. a full CG iteration (two-point slope over _learn_jit),
  4. the CG BLAS-1 skeleton with a trivial matvec (loop overhead bound).

Usage: python scripts/profile_cg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from plssvm_sparse_fp22_tpu.models.base import _learn_jit
    from plssvm_sparse_fp22_tpu.ops.matvec import build_operator
    from plssvm_sparse_fp22_tpu.ops.pallas_matvec import make_sym_matvec
    from plssvm_sparse_fp22_tpu.solver.cg import cg_solve
    from plssvm_sparse_fp22_tpu.types import BackendType, KernelType

    D = int(os.environ.get("PROF_D", 4096))
    f = int(os.environ.get("PROF_F", 256))
    reps = int(os.environ.get("PROF_REPS", 64))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(D, f)).astype(np.float32))
    v0 = jnp.asarray(rng.normal(size=D).astype(np.float32))
    mask = jnp.ones(D, jnp.float32)
    gamma = 1.0 / f

    norm = jax.jit(lambda u: u / jnp.sqrt(jnp.sum(u * u)))

    def timeit(label, fn, n=reps):
        float(fn(v0)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = v0
            for _ in range(n):
                out = norm(fn(out))
            _ = float(out[0])
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{label:42s} {best * 1e6:9.1f} us")
        return best

    # 1. bare symmetric Gram matvec
    for kern in (KernelType.rbf, KernelType.linear, KernelType.polynomial):
        mv = make_sym_matvec(kern, X, degree=3, gamma=gamma, coef0=0.0)
        timeit(f"sym matvec {kern.name}", jax.jit(mv))

    # 2. full implicit operator (corrections included)
    q = jnp.asarray(rng.normal(size=D).astype(np.float32))
    op = build_operator(
        KernelType.rbf, X, q, mask, jnp.float32(1.5), jnp.float32(1.0),
        degree=3, gamma=gamma, coef0=0.0, mode="implicit",
        backend=BackendType.pallas,
    )
    timeit("implicit operator rbf (w/ corrections)", jax.jit(op.matvec))

    # 3. full CG iteration cost (two-point slope on _learn_jit)
    def learn_time(n_iters, seed):
        b = np.zeros(D, np.float32)
        b[:-1] = np.where(np.random.default_rng(seed).normal(size=D - 1) > 0, 2, -2)
        args = (
            X, X[-1], jnp.asarray(b), mask,
            jnp.float32(gamma), jnp.float32(0.0), jnp.float32(1.0),
            jnp.float32(0.0), jnp.int32(n_iters),
        )
        kw = dict(kernel=KernelType.rbf, degree=3, mode="implicit",
                  backend=BackendType.pallas)
        t0 = time.perf_counter()
        out = _learn_jit(*args, **kw)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    lo, hi = 32, 128
    learn_time(lo, 0)
    vals = []
    for t in range(3):
        tl, th = learn_time(lo, 10 + t), learn_time(hi, 20 + t)
        if th > tl:
            vals.append((th - tl) / (hi - lo))
    vals.sort()
    per_iter = vals[len(vals) // 2] if vals else float("nan")
    print(f"{'full CG iteration (learn slope)':42s} {per_iter * 1e6:9.1f} us")

    # 4. CG skeleton with a near-free matvec: loop/BLAS-1 overhead bound
    def trivial_mv(v):
        return 2.0 * v

    def cg_fixed(bv):
        res = cg_solve(trivial_mv, bv, mask, jnp.float32(0.0), jnp.int32(hi))
        return res.x

    b0 = jnp.asarray(np.random.default_rng(1).normal(size=D).astype(np.float32))
    cg_j = jax.jit(cg_fixed)
    jax.block_until_ready(cg_j(b0))
    t0 = time.perf_counter()
    jax.block_until_ready(cg_j(b0))
    skel = (time.perf_counter() - t0) / hi
    print(f"{'CG skeleton iter (trivial matvec)':42s} {skel * 1e6:9.1f} us")


if __name__ == "__main__":
    main()
