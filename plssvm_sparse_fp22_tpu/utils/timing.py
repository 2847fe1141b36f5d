"""Scoped timers and profiler integration.

TPU-native equivalent of the reference's inline ``std::chrono`` spans
(SURVEY.md §5: parse time ``parameter.cpp:168-175``, setup
``csvm.cpp:247-250``, per-CG-iteration ``gpu_csvm.cpp:234-241``, predict
``gpu_csvm.cpp:121-124``, model write ``csvm.cpp:197-203``) plus the modern
upgrade the reference lacks: ``jax.profiler`` trace capture for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def scoped_timer(label: str, print_info: bool = True, sink=None):
    """Print ``{label} in {ms}ms.`` on exit (the reference's timing UX)."""
    start = time.perf_counter()
    yield
    elapsed_ms = (time.perf_counter() - start) * 1000.0
    if sink is not None:
        sink(label, elapsed_ms)
    if print_info:
        print(f"{label} in {elapsed_ms:.0f}ms.")


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Capture a ``jax.profiler`` trace when ``log_dir`` is set (view with
    TensorBoard); no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timings:
    """Accumulating sink: label -> [durations_ms] (observability hook)."""

    def __init__(self) -> None:
        self.records: dict[str, list[float]] = {}

    def __call__(self, label: str, elapsed_ms: float) -> None:
        self.records.setdefault(label, []).append(elapsed_ms)

    def summary(self) -> dict[str, float]:
        return {k: sum(v) for k, v in self.records.items()}
