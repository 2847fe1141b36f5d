"""Fused Pallas implicit kernel-matvec — the TPU-native device kernel.

This is the analog of the reference's hand-written device kernels
(``svm_kernel.cu:17-224``, ``svm_kernel.cl``, ``svm_kernel_nd_range.hpp``,
``OpenMP/svm_kernel.cpp``) re-designed for the MXU instead of translated:

- the 16x16-thread / 6x6-register tiles become (BM, BN) MXU block products
  streamed over a (rows_i, rows_j, features) grid,
- the kernel function's element-wise transform (``pow``/``exp``) is fused
  into the block product's epilogue while the block is still in VMEM (the
  reference applies it per scalar in registers; XLA alone would often need a
  round trip through HBM for the full Gram block),
- the ``atomicAdd`` scatter of symmetric contributions
  (``svm_kernel.cu:74,85``) disappears: each grid row ``i`` owns its output
  block and accumulates over the ``j`` sweep sequentially — TPU grids are
  executed in order, so accumulation is race-free by construction
  (SURVEY.md §2.4 item 2),
- the ``QA_cost - q_i - q_j`` rank-1 correction and ``1/C`` diagonal shift
  (``svm_kernel.cu:67-83``) stay algebraically hoisted *outside* the kernel
  (see ``ops/matvec.py``), so the device kernel is a pure Gram matvec.

Grid layout: ``(nI, nJ, nK)`` with ``k`` (feature chunks) fastest, then
``j``.  A VMEM scratch block accumulates the partial Gram product over
``k``; at the last ``k`` the kernel transform is applied and the block's
contribution ``f(G) @ v_j`` is added to the output block, which stays
resident in VMEM for the whole ``j`` sweep.

Block sizes come from ``constants.py`` (the analog of
``THREAD_BLOCK_SIZE``/``INTERNAL_BLOCK_SIZE``, ``constants.hpp:23,30``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COL_BLOCK_SIZE, FEATURE_BLOCK_SIZE, ROW_BLOCK_SIZE
from ..types import KernelType
from .kernel_functions import PRECISION


def _transform(kernel: KernelType, G, sqi, sqj, degree, gamma, coef0):
    """Element-wise kernel transform of a Gram block (kernel_types.hpp:69-84).

    ``sqi`` is (BM, 1), ``sqj`` is (BN, 1); broadcasting forms the squared
    distances from one GEMM (norm-expansion trick).
    """
    if kernel == KernelType.linear:
        return G
    if kernel == KernelType.polynomial:
        return lax.integer_pow(gamma * G + coef0, degree)
    if kernel == KernelType.rbf:
        sq = sqi + sqj.T - 2.0 * G
        return jnp.exp(-gamma * jnp.maximum(sq, 0.0))
    raise ValueError(f"unknown kernel {kernel}")


def _gram_matvec_kernel(
    scalars_ref,  # SMEM (2,): gamma, coef0
    xi_ref,  # (BM, BK) block of Xi
    xj_ref,  # (BN, BK) block of Xj
    v_ref,  # (BN, 1) block of v
    sqi_ref,  # (BM, 1) squared norms of Xi rows
    sqj_ref,  # (BN, 1) squared norms of Xj rows
    out_ref,  # (BM, 1) output block (resident across the j/k sweep)
    acc_ref,  # VMEM scratch (BM, BN): Gram accumulator over k
    *,
    kernel: KernelType,
    degree: int,
    nk: int,
    precision,
):
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # contract the feature dims directly (no transpose materialization);
    # HIGHEST = bf16x3 passes so f32 inputs keep f32-grade products (the
    # MXU natively multiplies bf16)
    acc_ref[:] += lax.dot_general(
        xi_ref[:], xj_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(k == nk - 1)
    def _():
        gamma = scalars_ref[0]
        coef0 = scalars_ref[1]
        K = _transform(kernel, acc_ref[:], sqi_ref[:], sqj_ref[:], degree, gamma, coef0)
        out_ref[:] += jnp.dot(
            K.astype(v_ref.dtype), v_ref[:],
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "degree", "bm", "bn", "bk", "interpret", "precision"),
)
def gram_matvec_pallas(
    kernel: KernelType,
    X,  # (D, f) row-padded data
    v,  # (D,)
    *,
    degree: int = 3,
    gamma=1.0,
    coef0=0.0,
    Y=None,  # optional (N, f) second operand (predict path); defaults to X
    bm: int = ROW_BLOCK_SIZE,
    bn: int = COL_BLOCK_SIZE,
    bk: int = FEATURE_BLOCK_SIZE,
    interpret: bool = False,
    precision=PRECISION,
):
    """K(X, Y) @ v with the kernel transform fused; never materializes K.

    Returns ``(D,)`` = ``sum_j f(<x_i, y_j>) v_j``.  Rows of X/Y beyond the
    real data must be zero-padded (the caller masks the output; zero rows are
    harmless on the ``j`` side because ``v`` is zero there too).
    """
    if Y is None:
        Y = X
    D, f = X.shape
    N, _ = Y.shape
    dtype = X.dtype

    # pad shapes up to full blocks (boundary padding, gpu_csvm.cpp:133)
    Dp, Np, fp = _round_up(D, bm), _round_up(N, bn), _round_up(f, 128)
    bk = min(bk, fp)
    fp = _round_up(fp, bk)
    if (Dp, fp) != (D, f):
        X = jnp.zeros((Dp, fp), dtype).at[:D, :f].set(X)
    if (Np, fp) != (N, f):
        Y = jnp.zeros((Np, fp), dtype).at[:N, :f].set(Y)
    v_pad = v if Np == N else jnp.zeros((Np,), v.dtype).at[:N].set(v)

    sqx = jnp.sum(X * X, axis=1, keepdims=True)
    sqy = jnp.sum(Y * Y, axis=1, keepdims=True)
    scalars = jnp.stack([jnp.asarray(gamma, dtype), jnp.asarray(coef0, dtype)])

    nI, nJ, nK = Dp // bm, Np // bn, fp // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nI, nJ, nK),
        in_specs=[
            # index maps receive the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((bm, bk), lambda i, j, k, s: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k, s: (j, k)),
            pl.BlockSpec((bn, 1), lambda i, j, k, s: (j, 0)),
            pl.BlockSpec((bm, 1), lambda i, j, k, s: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j, k, s: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j, k, s: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _gram_matvec_kernel, kernel=kernel, degree=degree, nk=nK,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Dp, 1), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Dp * Np * fp + 2 * Dp * Np,
            bytes_accessed=(Dp * fp + Np * fp + Np + Dp) * dtype.itemsize,
            transcendentals=Dp * Np if kernel == KernelType.rbf else 0,
        ),
        interpret=interpret,
    )(scalars, X, Y, v_pad[:, None], sqx, sqy)

    return out[:D, 0]
