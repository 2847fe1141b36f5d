"""Worker process for the multi-host (DCN) test.

Each of the two processes owns 4 virtual CPU devices; together they form one
8-device global mesh.  The worker feeds its local row block through
``make_global_row_sharded`` and runs the same sharded learn that the
single-process tests use — the shard_map code cannot tell ICI from DCN, which
is the point (SURVEY.md §2.4 item 4).

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""

import os
import sys

coordinator, num_procs, proc_id, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plssvm_sparse_fp22_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed, make_global_row_sharded)
from plssvm_sparse_fp22_tpu.parallel.mesh import make_mesh  # noqa: E402
from plssvm_sparse_fp22_tpu.parallel.sharded import make_sharded_learn  # noqa: E402
from plssvm_sparse_fp22_tpu.types import KernelType  # noqa: E402
from plssvm_sparse_fp22_tpu.utils import oracle  # noqa: E402


def main():
    ok = initialize_distributed(coordinator_address=coordinator,
                                num_processes=num_procs, process_id=proc_id)
    assert ok, "distributed runtime failed to initialize"
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs

    # identical global problem on every process (deterministic seed)
    rng = np.random.default_rng(7)
    n, f = 257, 12
    dept = n - 1
    D = 320  # 8 shards x 40 rows
    half = n // 2
    X = np.concatenate([
        rng.normal(loc=+1.0, size=(half, f)),
        rng.normal(loc=-1.0, size=(n - half, f)),
    ])
    y = np.concatenate([np.ones(half), -np.ones(n - half)])
    perm = rng.permutation(n)
    X, y = X[perm], y[perm]

    X_pad = np.zeros((D, f))
    X_pad[:dept] = X[:dept]
    b_pad = np.zeros(D)
    b_pad[:dept] = y[:dept] - y[-1]
    mask = np.zeros(D)
    mask[:dept] = 1.0

    mesh = make_mesh()  # all 8 global devices
    rows_per_proc = D // num_procs
    lo = proc_id * rows_per_proc
    hi = lo + rows_per_proc
    # each process contributes ONLY its local rows (DCN data-feeding path)
    Xs = make_global_row_sharded(mesh, X_pad[lo:hi])
    bs = make_global_row_sharded(mesh, b_pad[lo:hi])
    ms = make_global_row_sharded(mesh, mask[lo:hi])

    eps, imax, cost = 1e-10, 200, 2.0
    gamma, coef0, degree = 0.1, 1.0, 3
    learn = make_sharded_learn(mesh, KernelType.rbf, degree, "implicit")
    x_sh, s, t, QA, iters, delta, delta0 = learn(
        Xs, jnp.asarray(X[-1]), bs, ms,
        jnp.float64(gamma), jnp.float64(coef0), jnp.float64(cost),
        jnp.float64(eps), jnp.int32(imax),
    )
    jax.block_until_ready(x_sh)

    alpha_ref, bias_ref, _ = oracle.solve_lssvm(
        X, y, kernel=KernelType.rbf, cost=cost, epsilon=eps, max_iter=imax,
        degree=degree, gamma=gamma, coef0=coef0,
    )

    # verify THIS process's addressable shards against the oracle slice
    x_ref_pad = np.zeros(D)
    x_ref_pad[:dept] = alpha_ref[:dept]
    for shard in x_sh.addressable_shards:
        idx = shard.index[0]
        np.testing.assert_allclose(
            np.asarray(shard.data), x_ref_pad[idx], rtol=1e-4, atol=1e-4)

    bias = float(y[-1]) + float(QA) * float(s) - float(t)
    assert abs(bias - bias_ref) < 5e-3, (bias, bias_ref)
    assert float(delta) <= eps * eps * float(delta0) or int(iters) == imax

    with open(os.path.join(outdir, f"ok_{proc_id}"), "w") as fh:
        fh.write(f"iters={int(iters)} bias={bias}\n")


if __name__ == "__main__":
    main()
