"""Typed precision matrix: {float32, float64} x {linear, polynomial, rbf}.

Analog of the reference's typed test instantiation over
{float, double} x kernels (``tests/backends/OpenMP/test.cpp:29-39``).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import plssvm_sparse_fp22_tpu as pt
from plssvm_sparse_fp22_tpu.io.libsvm import ParsedData
from plssvm_sparse_fp22_tpu.params import Parameter
from plssvm_sparse_fp22_tpu.types import KernelType

from utils import make_blobs


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("kernel", [KernelType.linear, KernelType.polynomial, KernelType.rbf])
def test_learn_predict_typed(dtype, kernel):
    X, y = make_blobs(60, 10, seed=21)
    p = Parameter(dtype=dtype, kernel=kernel, coef0=1.0, max_iter=200, epsilon=1e-6)
    p.data = ParsedData(csr=sp.csr_matrix(X), values=y, _dense=X)
    p.values = y
    p.gamma = 1.0 / X.shape[1]
    svm = pt.make_csvm(p)
    svm.print_info = False
    svm.learn()
    assert svm.dtype == np.dtype(dtype)
    assert svm.accuracy() >= 0.95
    # predictions are finite, labels in {-1, 1}
    out = svm.predict(X[:7])
    assert np.all(np.isfinite(out))
    assert set(np.unique(svm.predict_label(X[:7]))) <= {-1.0, 1.0}


def test_verbose_cg_prints_iterations(capsys):
    X, y = make_blobs(40, 6, seed=4)
    p = Parameter(dtype=np.float64, verbose_cg=True, max_iter=50, epsilon=1e-6)
    p.data = ParsedData(csr=sp.csr_matrix(X), values=y, _dense=X)
    p.values = y
    p.gamma = 1.0 / X.shape[1]
    svm = pt.make_csvm(p)
    svm.learn()
    out = capsys.readouterr().out
    assert "Start Iteration 1 (max: 50) with current residuum" in out
    assert "Finished after" in out
