"""Conjugate gradients under ``jax.jit`` with data-dependent iteration count.

TPU-native equivalent of ``gpu_csvm::solver_CG``
(``src/plssvm/backends/gpu_csvm.cpp:186-324``) and
``openmp::csvm::solver_CG`` (``OpenMP/csvm.cpp:82-170``), with identical
semantics:

- start vector ``x = 1`` (on the valid entries),
- stop when ``delta <= eps^2 * delta0`` (``gpu_csvm.cpp:293``),
- at most ``imax`` iterations (= ``num_features``, ``csvm.cpp:256``),
- full residual recompute ``r = b - A x`` every 50th iteration
  (``OpenMP/csvm.cpp:130-139``; the reference GPU path drops the device-0
  contribution in this branch, ``gpu_csvm.cpp:272-283`` — we implement the
  mathematically correct refresh the CPU backend uses),
- ``beta = delta_new / delta_old``, ``d = beta * d + r``.

The data-dependent loop is a ``lax.while_loop`` (SURVEY.md §7 hard part (d)):
one compiled program regardless of how many iterations CG takes, no host
round-trips inside the loop — the analog of the reference's per-iteration
host-staged ``device_reduction`` disappears entirely.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

from ..constants import RESIDUAL_REFRESH_INTERVAL
from ..ops.kernel_functions import PRECISION


class CGResult(NamedTuple):
    x: jnp.ndarray  # solution on the padded system (padding entries zero)
    iterations: jnp.ndarray  # int32 scalar: CG iterations executed
    delta: jnp.ndarray  # final squared residual norm
    delta0: jnp.ndarray  # initial squared residual norm


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=a.dtype, precision=PRECISION)


def cg_solve(
    matvec: Callable,
    b: jnp.ndarray,
    mask: jnp.ndarray,
    eps,
    imax,
    refresh_interval: int = RESIDUAL_REFRESH_INTERVAL,
) -> CGResult:
    """Solve ``A x = b`` on the padded system.

    ``b`` and ``mask`` are (D,) with zero padding; ``matvec`` must preserve
    zero padding.  ``eps`` and ``imax`` may be traced scalars so tolerance /
    cap changes do not recompile.
    """
    dtype = b.dtype
    eps = jnp.asarray(eps, dtype)
    imax = jnp.asarray(imax, jnp.int32)

    x0 = mask.astype(dtype)  # x = 1 on valid entries (gpu_csvm.cpp:192)
    r0 = b - matvec(x0)  # r = b - A x (gpu_csvm.cpp:216-219)
    delta0 = _dot(r0, r0)
    target = eps * eps * delta0

    def cond(state):
        k, _x, _r, _d, delta = state
        return jnp.logical_and(k < imax, delta > target)

    def body(state):
        k, x, r, d, delta = state
        Ad = matvec(d)
        alpha = delta / _dot(d, Ad)
        x = x + alpha * d

        def refresh(_):
            return b - matvec(x)

        def update(_):
            return r - alpha * Ad

        r_new = lax.cond(k % refresh_interval == refresh_interval - 1, refresh, update, None)
        delta_new = _dot(r_new, r_new)
        beta = delta_new / delta
        d_new = beta * d + r_new
        return (k + 1, x, r_new, d_new, delta_new)

    k, x, _r, _d, delta = lax.while_loop(cond, body, (jnp.int32(0), x0, r0, r0, delta0))
    return CGResult(x=x, iterations=k, delta=delta, delta0=delta0)
