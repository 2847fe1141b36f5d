"""Native C++ parser tests: exact parity with the Python parser.

The native layer is optional; all tests skip when the toolchain can't build
the shared library.
"""

import numpy as np
import pytest

from plssvm_sparse_fp22_tpu.exceptions import (
    FileNotFoundError_,
    InvalidFileFormatError,
)
from plssvm_sparse_fp22_tpu.io.libsvm import parse_libsvm_content, write_libsvm_file
from plssvm_sparse_fp22_tpu.io.native import get_native_lib, parse_libsvm_native


pytestmark = pytest.mark.skipif(
    get_native_lib() is None, reason="native library not available"
)


def _python_parse(path):
    from plssvm_sparse_fp22_tpu.io.file_reader import read_lines

    return parse_libsvm_content(read_lines(path, "#"))


@pytest.mark.parametrize(
    "fixture",
    ["5x4.libsvm", "5x4.sparse.libsvm", "5x4.libsvm.no_label", "500x200.libsvm"],
)
def test_parity_with_python_parser(reference_data_dir, fixture):
    path = f"{reference_data_dir}/libsvm/{fixture}"
    native = parse_libsvm_native(path)
    py = _python_parse(path)
    np.testing.assert_array_equal(native[0].toarray(), py[0].toarray())
    if not py[2]:
        np.testing.assert_array_equal(native[1], py[1])
    assert native[2] == py[2]


def test_parity_random_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    X = np.where(rng.random((50, 30)) < 0.3, rng.normal(size=(50, 30)), 0.0)
    X[0, 0] = 1e-300  # subnormal-ish magnitudes survive round-trip
    y = np.where(rng.normal(size=50) > 0, 1.0, -1.0)
    path = str(tmp_path / "rt.libsvm")
    write_libsvm_file(path, X, y)
    native = parse_libsvm_native(path)
    py = _python_parse(path)
    # bitwise value parity: both use correctly-rounded decimal conversion
    np.testing.assert_array_equal(native[0].toarray(), py[0].toarray())
    np.testing.assert_array_equal(native[1], py[1])


def test_missing_file():
    with pytest.raises(FileNotFoundError_, match="Couldn't find file"):
        parse_libsvm_native("/nonexistent/x.libsvm")


def test_bad_value(tmp_path):
    p = tmp_path / "bad.libsvm"
    p.write_text("1 0:abc\n")
    with pytest.raises(InvalidFileFormatError, match="Can't convert"):
        parse_libsvm_native(str(p))


def test_empty_file(tmp_path):
    p = tmp_path / "empty.libsvm"
    p.write_text("")
    with pytest.raises(InvalidFileFormatError, match="no data points"):
        parse_libsvm_native(str(p))


def test_inline_comment_tolerated(tmp_path):
    p = tmp_path / "c.libsvm"
    p.write_text("-1  2:0.5   # trailing comment\n1 0:1.0\n")
    native = parse_libsvm_native(str(p))
    assert native[0].shape == (2, 3)
    assert native[0][0, 2] == 0.5
