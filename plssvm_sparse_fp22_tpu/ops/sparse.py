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
- **poly/RBF over sparse features**: three memory-guarded tiers (see
  ``models/base.py _learn_sparse``): one-shot Gram assembly (device
  blockwise MXU or host SpGEMM) for cached-mode CG; densify-X-only onto
  the flagship Pallas implicit kernel; and the fully streaming
  :func:`make_streaming_gram_matvec` that recomputes kernel blocks from
  the ELL+COO packing every iteration at O(n·L) memory — the only option
  when even dense X exceeds HBM.
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


@dataclass
class HybridSparse:
    """ELL + COO hybrid: rows are ELL-packed up to a capped row length and
    the overflow nonzeros of skewed rows spill into a static COO tail.

    Fixes the ELL worst case (one dense row inflating every row's padding to
    f): memory is ``n * Lcap + 3 * overflow`` instead of ``n * max_nnz``.
    The cap is chosen to minimize that sum over the actual nnz histogram.
    """

    ell: ELLMatrix
    coo_rows: jnp.ndarray  # (m,) int32
    coo_cols: jnp.ndarray  # (m,) int32
    coo_vals: jnp.ndarray  # (m,)

    @property
    def shape(self) -> tuple[int, int]:
        return self.ell.shape

    @staticmethod
    def from_csr(csr: sp.csr_matrix, dtype=np.float32,
                 pad_rows: int | None = None) -> "HybridSparse":
        n, f = csr.shape
        nnz_per_row = np.diff(csr.indptr)
        max_l = int(nnz_per_row.max()) if n else 0
        # pick Lcap minimizing ELL + COO footprint: n*L + 3*sum(max(0, nnz-L))
        counts = np.bincount(nnz_per_row, minlength=max_l + 1)
        tail = np.cumsum(counts[::-1])[::-1]  # tail[L] = #rows with nnz >= L
        suffix = np.concatenate([np.cumsum(tail[::-1])[::-1], [0]])
        overflow = suffix[1:]  # overflow[L] = sum_i max(0, nnz_i - L)
        Ls = np.arange(max_l + 1)
        costs = n * Ls + 3 * overflow
        Lcap = max(1, int(Ls[np.argmin(costs)]))

        rows_out = pad_rows if pad_rows is not None else n
        values = np.zeros((rows_out, Lcap), dtype=dtype)
        cols = np.zeros((rows_out, Lcap), dtype=np.int32)
        rows = np.repeat(np.arange(n), nnz_per_row)
        pos = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], nnz_per_row)
        in_ell = pos < Lcap
        values[rows[in_ell], pos[in_ell]] = csr.data[in_ell]
        cols[rows[in_ell], pos[in_ell]] = csr.indices[in_ell]
        ell = ELLMatrix(values=jnp.asarray(values), cols=jnp.asarray(cols),
                        shape=(rows_out, f))
        tail_sel = ~in_ell
        # nonzero conservation (ELL cells + COO tail == csr.nnz) holds by
        # construction of the in_ell partition; the reconstruction-roundtrip
        # property is covered by tests (test_sparse.py matvec-parity suite)
        return HybridSparse(
            ell=ell,
            coo_rows=jnp.asarray(rows[tail_sel].astype(np.int32)),
            coo_cols=jnp.asarray(csr.indices[tail_sel].astype(np.int32)),
            coo_vals=jnp.asarray(csr.data[tail_sel].astype(dtype)),
        )


def hybrid_matvec(h: HybridSparse, u: jnp.ndarray) -> jnp.ndarray:
    """X @ u over the ELL part + COO tail (nnz-proportional)."""
    out = ell_matvec(h.ell, u)
    if h.coo_vals.shape[0]:
        n = h.ell.shape[0]
        out = out + jax.ops.segment_sum(
            h.coo_vals * u[h.coo_cols], h.coo_rows, num_segments=n)
    return out


def hybrid_rmatvec(h: HybridSparse, v: jnp.ndarray) -> jnp.ndarray:
    """X^T @ v over the ELL part + COO tail."""
    out = ell_rmatvec(h.ell, v)
    if h.coo_vals.shape[0]:
        f = h.ell.shape[1]
        out = out + jax.ops.segment_sum(
            h.coo_vals * v[h.coo_rows], h.coo_cols, num_segments=f)
    return out


def hybrid_row_sqnorms(h: HybridSparse) -> jnp.ndarray:
    out = ell_row_sqnorms(h.ell)
    if h.coo_vals.shape[0]:
        n = h.ell.shape[0]
        out = out + jax.ops.segment_sum(
            h.coo_vals * h.coo_vals, h.coo_rows, num_segments=n)
    return out


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
    """Dense Gram ``G = X X^T`` assembled on device from the ELL packing:
    one O(nnz) scatter densifies X (transient (n, f) buffer, budget-gated
    by the caller) and one big MXU product builds G.

    An earlier blockwise-pair variant kept peak memory at two dense blocks
    but re-densified every column block O(nb) times through nb² serialized
    TPU scatters — measured >100x slower end-to-end on v5e (1055 s vs
    seconds at 16384x4096).  Since the caller only takes this path when the
    (n, n) Gram itself fits the memory budget, a transient (n, f) dense X
    (smaller than G whenever f < n) is an acceptable peak; truly wide data
    routes to the host SpGEMM (:func:`host_gram_from_csr`).
    """
    n, f = ell.shape
    from .kernel_functions import PRECISION

    row_idx = jnp.arange(n)[:, None]
    X = jnp.zeros((n, f), ell.values.dtype).at[row_idx, ell.cols].add(ell.values)
    return jnp.dot(X, X.T, preferred_element_type=X.dtype, precision=PRECISION)


def _transform_block(kernel_int: int, G, sq_i, sq_j, degree, gamma, coef0):
    """Kernel transform of a streamed Gram block (kernel_types.hpp:69-84).
    ``kernel_int``: 0 linear, 1 polynomial, 2 rbf."""
    if kernel_int == 0:
        return G
    if kernel_int == 1:
        return jax.lax.integer_pow(gamma * G + coef0, degree)
    d2 = sq_i[:, None] + sq_j[None, :] - 2.0 * G
    return jnp.exp(-gamma * jnp.maximum(d2, 0.0))


def streaming_stream_strategy(L: int, f: int) -> str:
    """Pick the streaming-block contraction strategy: ``mxu`` scatter-
    densifies both blocks and runs a dense MXU product (O(bm·f·bn) FLOPs at
    matrix-unit rate); ``gather`` contracts ELL slots against the panel on
    the VPU (O(nnz·bn) ops).  Measured on v5e (4096 rows, f=2048, L~100)
    the MXU path is ~80x faster, so the gather path only wins at extreme
    sparsity — roughly density below ~1/1024 (news20-scale, f ~ 1.3M,
    density 0.03%).  ``PLSSVM_SPARSE_STREAM`` forces either."""
    forced = os.environ.get("PLSSVM_SPARSE_STREAM", "auto")
    if forced in ("mxu", "gather"):
        return forced
    return "gather" if L * 1024 < f else "mxu"


def make_streaming_gram_matvec(h: HybridSparse, kernel_int: int, degree: int,
                               gamma, coef0, *, bm: int | None = None,
                               bn: int | None = None):
    """``v -> K(X, X) @ v`` streamed from the ELL+COO packing — the sparse
    north star: O(n·L) resident memory, the (n, n) kernel matrix and the
    (n, f) dense data are NEVER materialized (closes the reference's
    always-densify capability gap, ``parameter.hpp:51-75``).

    Two contraction strategies (:func:`streaming_stream_strategy`):

    - ``mxu`` (default): per block pair, both sparse blocks are
      scatter-densified on the fly — the J panel transposed to (f, bn), the
      I block to (bm, f) — and the Gram block is one dense MXU product.
      Peak live memory is two dense blocks; the full dense X never exists.
      Runs at dense-implicit speed (the MXU's rate advantage dwarfs the
      nnz-proportional saving for all but extreme sparsity).
    - ``gather``: every row block I contracts its ELL slots against the J
      panel with a vectorized gather — O(nnz_I · bn) VPU work instead of
      O(bm · f · bn) MXU FLOPs, the win only when the row fill L is
      orders of magnitude below f (news20-scale data).

    The fused kernel transform and the ``@ v_J`` epilogue run on the block
    while it is live, so per-iteration HBM traffic stays O(n²·L̄/bn + n).

    Rows beyond the real data must be zero (zero slots contribute nothing).
    """
    n, f = h.shape
    L = h.ell.row_capacity
    strategy = streaming_stream_strategy(L, f)
    if bm is None:
        bm = 512 if n % 512 == 0 else 128
    if bn is None:
        bn = (512 if strategy == "mxu" else 128) if n % 512 == 0 else 128
    if n % bm != 0 or n % bn != 0:
        raise ValueError(f"padded rows {n} must divide by bm={bm}, bn={bn}")

    sq = hybrid_row_sqnorms(h)
    contrib = make_streaming_cross_contrib(
        kernel_int, degree, gamma, coef0,
        row_vals=h.ell.values, row_cols=h.ell.cols, row_sq=sq,
        row_trow=h.coo_rows, row_tcol=h.coo_cols, row_tval=h.coo_vals,
        f=f, bm=bm, bn=bn, strategy=strategy,
    )

    def matvec(v):
        return contrib(h.ell.values, h.ell.cols, h.coo_rows, h.coo_cols,
                       h.coo_vals, sq, v)

    return matvec, sq


def sparse_q_qa_kii(kernel_int: int, degree: int, gamma, coef0,
                    g_last, sq_last, sq, mask, cost_inv):
    """``q_i = k(x_i, x_last)``, ``QA_cost``, and the kernel diagonal
    ``kii`` from the linear building blocks — the ONE transform shared by
    the single-chip streaming learn and the ring-sharded learn (and valid
    shard-locally: all three outputs are row-local)."""
    if kernel_int == 1:  # polynomial
        q = jax.lax.integer_pow(gamma * g_last + coef0, degree) * mask
        QA = jax.lax.integer_pow(gamma * sq_last + coef0, degree) + cost_inv
        kii = jax.lax.integer_pow(gamma * sq + coef0, degree)
    elif kernel_int == 2:  # rbf
        d2 = sq + sq_last - 2.0 * g_last
        q = jnp.exp(-gamma * jnp.maximum(d2, 0.0)) * mask
        QA = jnp.asarray(1.0, g_last.dtype) + cost_inv
        kii = jnp.ones_like(sq)
    else:  # linear
        q = g_last * mask
        QA = sq_last + cost_inv
        kii = sq
    return q, QA, kii


def make_streaming_cross_contrib(kernel_int: int, degree: int, gamma, coef0,
                                 *, row_vals, row_cols, row_sq,
                                 row_trow, row_tcol, row_tval,
                                 f: int, bm: int, bn: int, strategy: str):
    """Streaming cross-Gram contraction core shared by the single-chip
    streaming matvec and the ring-sharded multi-chip variant:

    ``contrib(panel_vals, panel_cols, panel_trow, panel_tcol, panel_tval,
    panel_sq, v) -> sum_j K(x_i^row, x_j^panel) v_j`` over all panel rows,
    for every row of the fixed ELL+COO *row side* closed over here.  The
    self-Gram case passes the row side's own arrays as the panel; the ring
    case passes the in-flight neighbor shard (panel row/tail indices are
    panel-local).  Padding rows/slots are zero and contribute nothing.
    """
    from .kernel_functions import PRECISION

    n_rows, L = row_vals.shape
    if n_rows % bm != 0:
        raise ValueError(f"row side {n_rows} must divide by bm={bm}")
    nI = n_rows // bm
    dtype = row_vals.dtype
    has_row_tail = int(row_tval.shape[0]) > 0
    Vb = row_vals.reshape(nI, bm, L)
    Cb = row_cols.reshape(nI, bm, L)
    sqb = row_sq.reshape(nI, bm)
    row_in_bm = jnp.arange(bm)[:, None]  # (bm, 1) broadcast vs (bm, L)
    row_in_bn = jnp.arange(bn)[:, None]  # (bn, 1) broadcast vs (bn, Lp)

    def contrib(panel_vals, panel_cols, panel_trow, panel_tcol, panel_tval,
                panel_sq, v):
        m_panel, Lp = panel_vals.shape
        if m_panel % bn != 0:
            raise ValueError(f"panel side {m_panel} must divide by bn={bn}")
        nJ = m_panel // bn
        has_panel_tail = int(panel_tval.shape[0]) > 0
        v = v.astype(dtype)

        def j_step(acc, jidx):
            j0 = jidx * bn
            valsJ = jax.lax.dynamic_slice(panel_vals, (j0, 0), (bn, Lp))
            colsJ = jax.lax.dynamic_slice(panel_cols, (j0, 0), (bn, Lp))
            # scatter-densify the J panel transposed: XJdT[col, j] += val
            XJdT = jnp.zeros((f, bn), dtype).at[colsJ, row_in_bn].add(valsJ)
            if has_panel_tail:
                in_j = jnp.logical_and(panel_trow >= j0, panel_trow < j0 + bn)
                jloc = jnp.clip(panel_trow - j0, 0, bn - 1)
                XJdT = XJdT.at[panel_tcol, jloc].add(
                    jnp.where(in_j, panel_tval, 0.0))
            vJ = jax.lax.dynamic_slice(v, (j0,), (bn,))
            sqJ = jax.lax.dynamic_slice(panel_sq, (j0,), (bn,))

            if strategy == "mxu":
                def i_fn(args):
                    vals_i, cols_i, sq_i, i0 = args
                    # scatter-densify the I block and hit the MXU: the
                    # (bm, f) x (f, bn) product runs at matrix-unit rate —
                    # ~80x the gather path on v5e at news20-unlike densities
                    Xi = jnp.zeros((bm, f), dtype).at[row_in_bm, cols_i].add(vals_i)
                    if has_row_tail:
                        in_i = jnp.logical_and(row_trow >= i0,
                                               row_trow < i0 + bm)
                        iloc = jnp.clip(row_trow - i0, 0, bm - 1)
                        Xi = Xi.at[iloc, row_tcol].add(
                            jnp.where(in_i, row_tval, 0.0))
                    G = jnp.dot(Xi, XJdT, preferred_element_type=dtype,
                                precision=PRECISION)
                    K = _transform_block(kernel_int, G, sq_i, sqJ, degree,
                                         gamma, coef0)
                    return K @ vJ  # (bm,)

                xs = (Vb, Cb, sqb, jnp.arange(nI, dtype=jnp.int32) * bm)
            else:
                if has_row_tail:
                    # I-side tail: G[r, :] += val_e * XJdT[col_e, :] for
                    # every tail entry e of row r
                    G_tail = jax.ops.segment_sum(
                        row_tval[:, None] * XJdT[row_tcol], row_trow,
                        num_segments=n_rows,
                    ).reshape(nI, bm, bn)
                else:
                    G_tail = jnp.zeros((nI, 1, 1), dtype)  # broadcast no-op

                def i_fn(args):
                    vals_i, cols_i, sq_i, tail_i = args
                    gath = XJdT[cols_i]  # (bm, L, bn) vectorized gather
                    G = jnp.einsum("ml,mlb->mb", vals_i, gath) + tail_i
                    K = _transform_block(kernel_int, G, sq_i, sqJ, degree,
                                         gamma, coef0)
                    return K @ vJ  # (bm,)

                xs = (Vb, Cb, sqb, G_tail)

            out = jax.lax.map(i_fn, xs).reshape(n_rows)
            return acc + out, None

        acc0 = jnp.zeros((n_rows,), dtype)
        Kv, _ = jax.lax.scan(j_step, acc0, jnp.arange(nJ))
        return Kv

    return contrib


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
