"""Multi-chip tests on a virtual 8-device CPU mesh.

The moral equivalent of the reference's 2-GPU SLURM CI
(``.jenkins/Jenkinsfile-Tests-Multi-GPU:130-133``) but runs everywhere:
the same learn computation, sharded over 1..8 devices, must agree with the
single-device solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plssvm_sparse_fp22_tpu.ops.matvec import build_operator
from plssvm_sparse_fp22_tpu.parallel.mesh import make_mesh
from plssvm_sparse_fp22_tpu.parallel.sharded import make_sharded_learn, shard_system
from plssvm_sparse_fp22_tpu.solver.cg import cg_solve
from plssvm_sparse_fp22_tpu.types import KernelType
from plssvm_sparse_fp22_tpu.utils import oracle

from utils import make_blobs

KERNELS = [KernelType.linear, KernelType.polynomial, KernelType.rbf]
HYPER = {"degree": 3, "gamma": 0.1, "coef0": 1.0}


def _padded_system(n=97, f=12, D=128, cost=2.0, seed=5):
    X, y = make_blobs(n, f, seed=seed)
    dept = n - 1
    X_pad = np.zeros((D, f))
    X_pad[:dept] = X[:dept]
    b_pad = np.zeros(D)
    b_pad[:dept] = y[:dept] - y[-1]
    mask = np.zeros(D)
    mask[:dept] = 1.0
    return X, y, X_pad, b_pad, mask, dept


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("mode", ["linear", "cached", "implicit"])
@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_learn_matches_single_device(kernel, mode, ndev):
    if mode == "linear" and kernel != KernelType.linear:
        pytest.skip("mode 'linear' is linear-kernel only")

    X, y, X_pad, b_pad, mask, dept = _padded_system()
    eps, imax, cost = 1e-6, 60, 2.0

    mesh = make_mesh(ndev)
    learn = make_sharded_learn(mesh, kernel, HYPER["degree"], mode)
    Xs, bs, ms = shard_system(mesh, X_pad, b_pad, mask)
    x_sh, s, t, QA, iters, delta, delta0 = learn(
        Xs, jnp.asarray(X[-1]), bs, ms,
        jnp.float64(HYPER["gamma"]), jnp.float64(HYPER["coef0"]),
        jnp.float64(cost), jnp.float64(eps), jnp.int32(imax),
    )
    x_sh = np.asarray(x_sh)[:dept]

    # single-device reference via the numpy oracle
    alpha_ref, bias_ref, info = oracle.solve_lssvm(
        X, y, kernel=kernel, cost=cost, epsilon=eps, max_iter=imax, **HYPER
    )
    assert abs(int(iters) - info["iterations"]) <= 2
    # different (deterministic) psum orderings give a slightly different CG
    # trajectory; both solutions satisfy the same residual tolerance
    np.testing.assert_allclose(x_sh, alpha_ref[:dept], rtol=1e-4, atol=1e-4)

    # derived bias matches too (sum over dept entries amplifies the per-entry
    # trajectory difference, so the tolerance is wider)
    bias = float(y[-1]) + float(QA) * float(s) - float(t)
    assert bias == pytest.approx(bias_ref, rel=1e-3, abs=1e-3)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_implicit_pallas_ring(ndev):
    """The ring implicit mode with the fused Pallas kernel per hop
    (interpret mode on CPU) matches the numpy oracle."""
    X, y, X_pad, b_pad, mask, dept = _padded_system()
    eps, imax, cost = 1e-6, 60, 2.0
    mesh = make_mesh(ndev)
    learn = make_sharded_learn(mesh, KernelType.rbf, HYPER["degree"],
                               "implicit", use_pallas=True)
    Xs, bs, ms = shard_system(mesh, X_pad, b_pad, mask)
    x_sh, s, t, QA, iters, delta, delta0 = learn(
        Xs, jnp.asarray(X[-1]), bs, ms,
        jnp.float64(HYPER["gamma"]), jnp.float64(HYPER["coef0"]),
        jnp.float64(cost), jnp.float64(eps), jnp.int32(imax),
    )
    alpha_ref, bias_ref, info = oracle.solve_lssvm(
        X, y, kernel=KernelType.rbf, cost=cost, epsilon=eps, max_iter=imax,
        **HYPER,
    )
    np.testing.assert_allclose(np.asarray(x_sh)[:dept], alpha_ref[:dept],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel", KERNELS)
@pytest.mark.parametrize("ndev", [2, 4])
def test_feature_sharded_learn_matches_oracle(kernel, ndev):
    """The reference's own multi-GPU decomposition — the feature axis split
    across devices with psummed partial Gram products
    (``feature_ranges_``, ``gpu_csvm.cpp:130-157``) — kept as an option.
    The reference supports it for the linear kernel only
    (``CUDA/csvm.cu:61-63``); here all three kernels work."""
    from plssvm_sparse_fp22_tpu.parallel.sharded import (
        make_feature_sharded_learn, shard_system_feature)

    n, f = 97, 16  # f must divide evenly over ndev
    X, y = make_blobs(n, f, seed=5)
    dept = n - 1
    D = 128
    X_pad = np.zeros((D, f))
    X_pad[:dept] = X[:dept]
    b_pad = np.zeros(D)
    b_pad[:dept] = y[:dept] - y[-1]
    mask = np.zeros(D)
    mask[:dept] = 1.0
    eps, imax, cost = 1e-6, 60, 2.0

    mesh = make_mesh(ndev)
    learn = make_feature_sharded_learn(mesh, kernel, HYPER["degree"])
    Xs, xl, bs, ms = shard_system_feature(mesh, X_pad, X[-1], b_pad, mask)
    x_sh, s, t, QA, iters, delta, delta0 = learn(
        Xs, xl, bs, ms,
        jnp.float64(HYPER["gamma"]), jnp.float64(HYPER["coef0"]),
        jnp.float64(cost), jnp.float64(eps), jnp.int32(imax),
    )
    alpha_ref, bias_ref, info = oracle.solve_lssvm(
        X, y, kernel=kernel, cost=cost, epsilon=eps, max_iter=imax, **HYPER
    )
    # both runs satisfy delta <= eps^2 * delta0; on the ill-conditioned
    # polynomial system that residual contract leaves the trajectory-level
    # solution difference well above machine precision (fp-contraction flags
    # alone shift the iteration count by one), so assert the solver contract
    # plus a conditioning-aware solution tolerance
    assert float(delta) <= eps * eps * float(delta0) or int(iters) == imax
    tol = 5e-3 if kernel == KernelType.polynomial else 1e-4
    np.testing.assert_allclose(np.asarray(x_sh)[:dept], alpha_ref[:dept],
                               rtol=tol, atol=tol)
    bias = float(y[-1]) + float(QA) * float(s) - float(t)
    assert bias == pytest.approx(bias_ref, rel=5e-3, abs=5e-3)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_matvec_determinism(ndev):
    """Same mesh, same inputs -> bitwise identical results across calls
    (deterministic psum ordering; SURVEY.md §7 hard part (a))."""
    X, y, X_pad, b_pad, mask, dept = _padded_system()
    mesh = make_mesh(ndev)
    learn = make_sharded_learn(mesh, KernelType.rbf, 3, "implicit")
    Xs, bs, ms = shard_system(mesh, X_pad, b_pad, mask)
    args = (Xs, jnp.asarray(X[-1]), bs, ms, jnp.float64(0.1), jnp.float64(1.0),
            jnp.float64(2.0), jnp.float64(1e-6), jnp.int32(60))
    out1 = learn(*args)
    out2 = learn(*args)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    assert float(out1[5]) == float(out2[5])
