"""Shared test helpers.

Mirrors the reference's comparison tooling: the mixed relative/absolute
floating-point compare with ``eps = 128 * scale * machine_eps``
(``tests/utility.hpp:118-136``).
"""

from __future__ import annotations

import numpy as np


def mixed_close(a, b, scale: float = 1.0, dtype=np.float64) -> bool:
    """Mixed rel/abs compare (``tests/utility.hpp:118-136``)."""
    eps = 128.0 * scale * np.finfo(dtype).eps
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    diff = np.abs(a - b)
    denom = np.maximum(np.maximum(np.abs(a), np.abs(b)), 1.0)
    return bool(np.all(diff <= eps * denom))


def make_blobs(n: int, f: int, seed: int = 42, dtype=np.float64):
    """Two separable-ish gaussian blobs with +1/-1 labels."""
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.concatenate(
        [
            rng.normal(loc=+1.0, scale=1.0, size=(half, f)),
            rng.normal(loc=-1.0, scale=1.0, size=(n - half, f)),
        ]
    ).astype(dtype)
    y = np.concatenate([np.ones(half), -np.ones(n - half)])
    perm = rng.permutation(n)
    return X[perm], y[perm]
