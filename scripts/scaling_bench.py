"""Weak-scaling benchmark: CG iterations/s over a growing device mesh.

The BASELINE.json north-star metric: >= 80% weak-scaling efficiency of CG
iterations/s when both rows and devices double (each chip keeps a constant
row block, so perfect scaling = constant time per iteration).

Usage:
    python scripts/scaling_bench.py                  # real devices
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS='' python scripts/scaling_bench.py --cpu   # harness check

Timing uses the two-point-slope method (two iteration caps, fresh inputs)
to cancel dispatch overhead and relay-level result caching.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(mesh, rows_per_dev, f, kernel_name, mode, lo=4, hi=16):
    import jax
    import jax.numpy as jnp

    from plssvm_sparse_fp22_tpu.parallel.sharded import make_sharded_learn, shard_system
    from plssvm_sparse_fp22_tpu.types import KernelType

    p = mesh.devices.size
    D = rows_per_dev * p
    dept = D - 8
    rng = np.random.default_rng(0)
    dtype = np.float32

    X_pad = np.zeros((D, f), dtype=dtype)
    X_pad[:dept] = rng.normal(size=(dept, f))
    x_last = rng.normal(size=f).astype(dtype)
    mask = np.zeros(D, dtype=dtype)
    mask[:dept] = 1.0

    learn = make_sharded_learn(mesh, KernelType.from_string(kernel_name), 3, mode)
    Xs, _, ms = shard_system(mesh, X_pad, np.zeros(D, dtype), mask)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from plssvm_sparse_fp22_tpu.parallel.mesh import DATA_AXIS

    row_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def run(seed, iters):
        r = np.random.default_rng(seed)
        b = np.zeros(D, dtype=dtype)
        b[:dept] = np.where(r.normal(size=dept) > 0, 2.0, -2.0)
        bs = jax.device_put(b, row_sharding)
        args = (Xs, jnp.asarray(x_last), bs, ms,
                jnp.asarray(1.0 / f, dtype), jnp.asarray(0.0, dtype),
                jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
                jnp.asarray(iters, jnp.int32))
        t0 = time.perf_counter()
        out = learn(*args)
        jax.block_until_ready(out)
        assert int(out[4]) == iters
        return time.perf_counter() - t0

    run(0, lo)  # compile
    per_iter = float("inf")
    for trial in range(3):
        t_lo = run(10 + trial, lo)
        t_hi = run(20 + trial, hi)
        if t_hi > t_lo:
            per_iter = min(per_iter, (t_hi - t_lo) / (hi - lo))
    return 1.0 / per_iter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU (harness check)")
    parser.add_argument("--rows-per-dev", type=int, default=1024)
    parser.add_argument("--features", type=int, default=128)
    parser.add_argument("--kernel", default="rbf")
    parser.add_argument("--mode", default="implicit")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from plssvm_sparse_fp22_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= n_dev]
    results = {}
    for p in sizes:
        mesh = make_mesh(p)
        rate = measure(mesh, args.rows_per_dev, args.features, args.kernel, args.mode)
        results[p] = rate
        eff = rate / results[sizes[0]] if p > sizes[0] else 1.0
        print(f"devices={p:3d} rows={args.rows_per_dev * p:7d} "
              f"iters/s={rate:9.2f} weak-eff={eff:6.2%}", flush=True)

    print(json.dumps({
        "metric": f"weak_scaling_{args.kernel}_{args.mode}",
        "rows_per_dev": args.rows_per_dev,
        "features": args.features,
        "iters_per_s": results,
        "weak_efficiency": {p: results[p] / results[sizes[0]] for p in sizes},
    }))


if __name__ == "__main__":
    main()
