"""Sparse (CSR/ELL) feature-matrix support — the capability the fork name
promises.

The reference always densifies parsed sparse data
(``include/plssvm/parameter.hpp:51-75`` "the parsed output is always in a
dense format"), so a dataset like news20 (f ~ 1.3M, density ~0.03%) simply
does not fit.  Here the CSR form survives parsing (``io/libsvm.py``) and
feeds TPU-native sparse execution:

- **ELL packing**: rows padded to the max nonzeros-per-row, giving static
  shapes (``values``/``cols`` of shape (n, L)) that XLA can tile — the TPU
  answer to CSR's ragged rows (SURVEY.md §7 step 5 "ELL packing").
- **linear-kernel matvec**: ``K v = X (X^T v)`` with both products
  nnz-proportional: a row-gather product for ``X u`` and a
  ``segment_sum`` scatter for ``X^T v``.  Fully implicit — O(nnz) memory,
  every CG iteration on device.
- **poly/RBF over sparse features**: the Gram matrix is assembled once from
  CSR on the host (scipy sparse BLAS, no densification of X) and shipped to
  HBM for cached-mode CG; the O(n^2) iterations stay on the MXU.  (A fully
  streaming sparse Gram Pallas kernel is the planned next step.)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclass
class ELLMatrix:
    """ELLPACK: row-major nonzeros padded to a uniform row length.

    ``values[i, l]`` / ``cols[i, l]`` hold the l-th nonzero of row i; padding
    slots have value 0 and column 0 (harmless: 0 * anything).
    """

    values: jnp.ndarray  # (n, L)
    cols: jnp.ndarray  # (n, L) int32
    shape: tuple[int, int]

    @property
    def row_capacity(self) -> int:
        return self.values.shape[1]

    @staticmethod
    def from_csr(csr: sp.csr_matrix, dtype=np.float32, pad_rows: int | None = None) -> "ELLMatrix":
        """Pack a scipy CSR matrix; optionally zero-pad to ``pad_rows`` rows."""
        n, f = csr.shape
        rows_out = pad_rows if pad_rows is not None else n
        nnz_per_row = np.diff(csr.indptr)
        L = max(1, int(nnz_per_row.max()) if n else 1)
        values = np.zeros((rows_out, L), dtype=dtype)
        cols = np.zeros((rows_out, L), dtype=np.int32)
        # vectorized scatter: entry k of the CSR stream lands at
        # (row(k), k - row_start(row(k)))
        rows = np.repeat(np.arange(n), nnz_per_row)
        pos = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], nnz_per_row)
        values[rows, pos] = csr.data
        cols[rows, pos] = csr.indices
        return ELLMatrix(
            values=jnp.asarray(values), cols=jnp.asarray(cols), shape=(rows_out, f)
        )


def ell_matvec(ell: ELLMatrix, u: jnp.ndarray) -> jnp.ndarray:
    """X @ u for dense u (f,): gather u at each nonzero column, row-sum.

    nnz-proportional; the gather vectorizes over the static (n, L) layout.
    """
    gathered = u[ell.cols]  # (n, L)
    return jnp.sum(ell.values * gathered, axis=1)


def ell_rmatvec(ell: ELLMatrix, v: jnp.ndarray) -> jnp.ndarray:
    """X^T @ v for dense v (n,): scatter-add row contributions per column."""
    n, f = ell.shape
    contributions = (ell.values * v[:, None]).reshape(-1)  # (n*L,)
    flat_cols = ell.cols.reshape(-1)
    return jax.ops.segment_sum(contributions, flat_cols, num_segments=f)


def ell_row_sqnorms(ell: ELLMatrix) -> jnp.ndarray:
    """Row squared norms (for RBF distance expansion)."""
    return jnp.sum(ell.values * ell.values, axis=1)


def host_gram_from_csr(csr: sp.csr_matrix, dept: int | None = None) -> np.ndarray:
    """Dense Gram G = X X^T computed with scipy sparse BLAS (host, f64).

    Used to set up cached-mode CG for poly/RBF kernels over sparse features:
    X itself is never densified; only the (dept, dept) Gram is materialized.
    """
    Xs = csr if dept is None else csr[:dept]
    return np.asarray((Xs @ Xs.T).todense(), dtype=np.float64)


def host_cross_gram_from_csr(csr_a: sp.csr_matrix, csr_b: sp.csr_matrix) -> np.ndarray:
    """Dense cross Gram A B^T on the host (predict path over sparse data)."""
    return np.asarray((csr_a @ csr_b.T).todense(), dtype=np.float64)


def device_gram_from_ell(ell: ELLMatrix, *, row_block: int = 256) -> jnp.ndarray:
    """Dense Gram ``G = X X^T`` assembled on device from the ELL packing.

    Streams block *pairs*: each (row_block, f) block is densified from its
    ELL slice with one scatter-add, then the block product runs on the MXU.
    Peak extra memory is two dense blocks — X itself is never densified.

    Compared to the host SpGEMM (:func:`host_gram_from_csr`), the MXU's
    throughput advantage beats the O(n^2 f)-vs-O(n nnz) work disadvantage
    for all but extremely wide data (the caller gates on ``f``).
    """
    n, f = ell.shape
    L = ell.row_capacity
    bm = min(row_block, n)
    if n % bm != 0:
        raise ValueError(f"ELL rows {n} not divisible by row block {bm}")
    nb = n // bm
    Vb = ell.values.reshape(nb, bm, L)
    Cb = ell.cols.reshape(nb, bm, L)
    row_idx = jnp.arange(bm)[:, None]

    def densify(vals_blk, cols_blk):
        dense = jnp.zeros((bm, f), vals_blk.dtype)
        return dense.at[row_idx, cols_blk].add(vals_blk)

    from .kernel_functions import PRECISION

    def row_fn(args):
        vi, ci = args
        Xi = densify(vi, ci)

        def col_fn(args2):
            vj, cj = args2
            Xj = densify(vj, cj)
            return jnp.dot(
                Xi, Xj.T, preferred_element_type=Xi.dtype, precision=PRECISION
            )

        return jax.lax.map(col_fn, (Vb, Cb))  # (nb, bm, bm)

    G = jax.lax.map(row_fn, (Vb, Cb))  # (nb, nb, bm, bm)
    return G.transpose(0, 2, 1, 3).reshape(n, n)


#: widest feature count for which the blockwise device Gram assembly is used;
#: beyond it a (row_block, f) dense block stops being cheap and the host
#: SpGEMM wins (news20-scale data).
DEVICE_GRAM_MAX_FEATURES = 65536


def device_gram_max_features() -> int:
    """Env-overridable feature-width cutoff for the device Gram path."""
    try:
        return int(os.environ.get(
            "PLSSVM_DEVICE_GRAM_MAX_FEATURES", DEVICE_GRAM_MAX_FEATURES))
    except ValueError:
        return DEVICE_GRAM_MAX_FEATURES
