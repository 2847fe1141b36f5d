"""On-TPU numeric validation sweep: every execution strategy vs the numpy
oracle, on real hardware.

The test suite runs on CPU (8 virtual devices; Pallas in interpret mode),
which cannot catch Mosaic-lowering or MXU-precision surprises.  This script
runs each compute path on the actual TPU at small shapes and checks it
against ``utils/oracle.py`` within the documented tolerance of its
precision tier (bf16x3 Gram products: ~1e-4 relative; exact paths: f32
epsilon scale).

Prints one line per check and a final JSON summary; exit code 1 if any
check fails.  Usage: ``python scripts/tpu_validate.py``.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from plssvm_sparse_fp22_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from plssvm_sparse_fp22_tpu.types import BackendType, KernelType  # noqa: E402
from plssvm_sparse_fp22_tpu.utils import oracle  # noqa: E402

KERNELS = [KernelType.linear, KernelType.polynomial, KernelType.rbf]
HYPER = dict(degree=3, gamma=0.01, coef0=1.0)
RESULTS = []


def check(name, got, want, tol):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.max(np.abs(want)) + 1e-30
    err = float(np.max(np.abs(got - want)) / denom)
    ok = err <= tol
    RESULTS.append({"check": name, "rel_err": err, "tol": tol, "ok": ok})
    print(f"{'PASS' if ok else 'FAIL'}  {name:55s} rel_err={err:.2e} "
          f"(tol {tol:.0e})", flush=True)
    return ok


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"platform: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    rng = np.random.default_rng(0)
    D, f = 512, 160
    X = rng.normal(size=(D, f)).astype(np.float32)
    v = rng.normal(size=D).astype(np.float32)
    Xd, vd = jnp.asarray(X), jnp.asarray(v)

    # 1. symmetric Pallas Gram matvec (training hot path), bf16x3 tier
    from plssvm_sparse_fp22_tpu.ops.pallas_matvec import (
        gram_matvec_pallas, make_sym_matvec, pair_gram_contrib)

    for kernel in KERNELS:
        K = oracle.kernel_matrix(kernel, X, X, **HYPER)
        mv = make_sym_matvec(kernel, Xd, interpret=not on_tpu, **HYPER)
        check(f"sym_pallas[{kernel.name}]", mv(vd), K @ v, 2e-4)

    # 1b. the adaptive solve's FAST tier (1-pass bf16): the error budget the
    # escalation machinery exists to cover — loose tolerance by design
    from jax import lax as _lax

    mv_fast = make_sym_matvec(KernelType.rbf, Xd, interpret=not on_tpu,
                              precision=_lax.Precision.DEFAULT, **HYPER)
    K = oracle.kernel_matrix(KernelType.rbf, X, X, **HYPER)
    check("sym_pallas[rbf,fast-tier]", mv_fast(vd), K @ v, 2e-2)

    # 2. cross Gram matvec (predict kernel expansion)
    P = rng.normal(size=(96, f)).astype(np.float32)
    for kernel in KERNELS:
        Kc = oracle.kernel_matrix(kernel, P, X, **HYPER)
        got = gram_matvec_pallas(kernel, jnp.asarray(P), vd, Y=Xd,
                                 interpret=not on_tpu, **HYPER)
        check(f"cross_pallas[{kernel.name}]", got, Kc @ v, 2e-4)

    # 3. panel-pair kernel, diagonal and cross panels
    Xj = rng.normal(size=(384, f)).astype(np.float32)
    vj = rng.normal(size=384).astype(np.float32)
    oi, oj = pair_gram_contrib(KernelType.rbf, Xd, Xd, vd, vd, same=True,
                               interpret=not on_tpu, **HYPER)
    K = oracle.kernel_matrix(KernelType.rbf, X, X, **HYPER)
    check("pair_same[rbf]", np.asarray(oi) + np.asarray(oj), K @ v, 2e-4)
    oi, oj = pair_gram_contrib(KernelType.rbf, Xd, jnp.asarray(Xj), vd,
                               jnp.asarray(vj), same=False,
                               interpret=not on_tpu, **HYPER)
    Kc = oracle.kernel_matrix(KernelType.rbf, X, Xj, **HYPER)
    check("pair_cross[rbf] out_i", oi, Kc @ vj, 2e-4)
    check("pair_cross[rbf] out_j", oj, Kc.T @ v, 2e-4)

    # 4. operator modes through build_operator (XLA + Pallas dispatch)
    from plssvm_sparse_fp22_tpu.ops.matvec import build_operator

    dept = D - 40
    mask = np.zeros(D, np.float32)
    mask[:dept] = 1.0
    Xm = X * mask[:, None]
    q = (rng.normal(size=D) * mask).astype(np.float32)
    for mode, kernel in (("linear", KernelType.linear),
                         ("cached", KernelType.rbf),
                         ("implicit", KernelType.rbf)):
        op = build_operator(kernel, jnp.asarray(Xm), jnp.asarray(q),
                            jnp.asarray(mask), 2.0, 0.5, mode=mode,
                            backend=BackendType.pallas if on_tpu
                            else BackendType.xla, **HYPER)
        K = oracle.kernel_matrix(kernel, Xm[:dept], Xm[:dept], **HYPER)
        vm = v * mask
        s, t = vm.sum(), q @ vm
        want = np.zeros(D)
        want[:dept] = (K @ vm[:dept] + (2.0 * s - t) - s * q[:dept]
                       + 0.5 * vm[:dept])
        check(f"operator[{mode}]", op.matvec(jnp.asarray(vm)), want, 2e-4)

    # 5. sparse paths: tiled panel (pallas), gather contrib, hybrid matvecs
    from plssvm_sparse_fp22_tpu.ops.sparse import (
        HybridSparse, TiledHybrid, densify_tiled, make_streaming_gram_matvec,
        make_tiled_panel_matvec)

    csr = sp.random(D, 640, density=0.05, format="lil", random_state=rng,
                    data_rvs=lambda k: rng.normal(size=k).astype(np.float32))
    csr[7, :] = rng.normal(size=640)  # heavy row exercises the spill
    csr = csr.tocsr().astype(np.float32)
    Xs = csr.toarray()
    Ks = oracle.kernel_matrix(KernelType.rbf, Xs, Xs, **HYPER)

    th = TiledHybrid.from_csr(csr, dtype=np.float32)
    hs = np.zeros(D, np.float32)
    if len(th.heavy_idx):
        hr = csr[th.heavy_idx]
        hs[th.heavy_idx] = np.asarray(hr.multiply(hr).sum(axis=1)).ravel()
    mv, sq = make_tiled_panel_matvec(
        th.tell.vals, th.tell.lcols, int(KernelType.rbf), 3, HYPER["gamma"],
        HYPER["coef0"], ntiles=th.tell.ntiles, Lt=th.tell.Lt, panel_rows=256,
        use_pallas=True, interpret=not on_tpu, heavy=th.heavy,
        heavy_rows=tuple(int(r) for r in th.heavy_idx),
        heavy_sq_vec=jnp.asarray(hs))
    check("sparse_panel_matvec[rbf,heavy]", mv(vd), Ks @ v, 2e-4)
    check("sparse_panel_sq", sq,
          np.asarray(csr.multiply(csr).sum(axis=1)).ravel(), 1e-5)

    # windowed (bounded-liveness i-major scan) sweep — the beyond-HBM
    # schedule; same operator, traced-position heavy placement
    from plssvm_sparse_fp22_tpu.ops.sparse import \
        make_tiled_panel_matvec_windowed

    mvw, sqw = make_tiled_panel_matvec_windowed(
        th.tell.vals, th.tell.lcols, int(KernelType.rbf), 3, HYPER["gamma"],
        HYPER["coef0"], ntiles=th.tell.ntiles, Lt=th.tell.Lt, panel_rows=256,
        use_pallas=True, interpret=not on_tpu, heavy=th.heavy,
        heavy_rows=tuple(int(r) for r in th.heavy_idx),
        heavy_sq_vec=jnp.asarray(hs))
    check("sparse_panel_matvec[windowed,heavy]", mvw(vd), Ks @ v, 2e-4)

    h = HybridSparse.from_csr(csr, dtype=np.float32)
    gmv, _sq = make_streaming_gram_matvec(h, int(KernelType.rbf), 3,
                                          HYPER["gamma"], HYPER["coef0"])
    check("sparse_gather_matvec[rbf]", gmv(vd), Ks @ v, 1e-5)

    dense = densify_tiled(th.tell.vals, th.tell.lcols, th.tell.ntiles,
                          th.tell.Lt)
    light = Xs.copy()
    light[th.heavy_idx] = 0.0
    check("densify_tiled(light rows)", np.asarray(dense)[:, :640], light,
          1e-6)

    # 6. full learns vs the oracle solver
    from plssvm_sparse_fp22_tpu.io.libsvm import ParsedData
    from plssvm_sparse_fp22_tpu.models import make_csvm
    from plssvm_sparse_fp22_tpu.params import Parameter

    Xl, yl = Xs[:256, :64].copy(), np.where(rng.normal(size=256) > 0, 1., -1.)
    Xl += rng.normal(size=Xl.shape).astype(np.float32) * 0.01  # no empty rows
    a_ref, b_ref, _ = oracle.solve_lssvm(
        Xl, yl, kernel=KernelType.rbf, cost=1.0, epsilon=1e-8, max_iter=300,
        **HYPER)

    for label, extra in (("dense", dict(sparse_threshold=-1.0)),
                         ("sparse_panel", dict(sparse_threshold=1.0))):
        if label == "sparse_panel":
            os.environ["PLSSVM_SPARSE_MODE"] = "implicit"
        try:
            params = Parameter(kernel=KernelType.rbf, cost=1.0, epsilon=1e-8,
                               max_iter=300, print_info=False,
                               dtype=np.float32, devices=1, **HYPER, **extra)
            params.data = ParsedData(csr=sp.csr_matrix(Xl), values=yl,
                                     _dense=Xl)
            params.values = yl
            svm = make_csvm(params)
            svm.learn()
            check(f"learn[{label}] alphas", svm.alphas[:-1], a_ref[:-1], 5e-3)
        finally:
            os.environ.pop("PLSSVM_SPARSE_MODE", None)

    # 7. adaptive two-tier learn: forced adaptive plan must match the oracle
    # to the same tolerance as the fixed tier (the accurate-tier residual
    # check guarantees it regardless of the fast tier's error floor)
    prev = os.environ.get("PLSSVM_MATMUL_PRECISION")
    os.environ["PLSSVM_MATMUL_PRECISION"] = "adaptive"
    try:
        params = Parameter(kernel=KernelType.rbf, cost=1.0, epsilon=1e-8,
                           max_iter=300, print_info=False, dtype=np.float32,
                           devices=1, sparse_threshold=-1.0, **HYPER)
        params.data = ParsedData(csr=sp.csr_matrix(Xl), values=yl, _dense=Xl)
        params.values = yl
        svm = make_csvm(params)
        svm.learn()
        check("learn[adaptive] alphas", svm.alphas[:-1], a_ref[:-1], 5e-3)
        print(f"      adaptive: {svm.last_cg_info['iterations']} iters, "
              f"{svm.last_cg_info.get('fast_iterations')} on the fast tier, "
              f"escalated={svm.last_cg_info.get('escalated')}", flush=True)
    finally:
        if prev is None:
            os.environ.pop("PLSSVM_MATMUL_PRECISION", None)
        else:
            os.environ["PLSSVM_MATMUL_PRECISION"] = prev

    n_fail = sum(not r["ok"] for r in RESULTS)
    print(json.dumps({"metric": "tpu_validation",
                      "platform": jax.default_backend(),
                      "checks": len(RESULTS), "failures": n_fail,
                      "max_rel_err": max(r["rel_err"] for r in RESULTS)}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
