"""Smoke coverage for the benchmark harness (bench.py).

The driver runs ``python bench.py`` at the end of every round; a broken
helper would silently cost the round its BENCH artifact.  These tests run
the harness building blocks at tiny shapes on CPU — correctness of the
numbers is the TPU runs' job, this pins that the machinery executes and
returns the right shapes.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_dense_runner_and_slope():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(256, 32)).astype(np.float32)
    run, D = bench._make_dense_runner(X, 1.0 / 32, "rbf", "cached", "xla")
    elapsed, executed = run(1, 8)
    assert elapsed > 0 and 1 <= executed <= 8
    rate = bench._slope_rate(run, 4, 16, trials=2)
    assert rate > 0


def test_implicit_roofline_tiers():
    # per-tier pass counts drive the hardware-FLOP model
    r_def = bench._implicit_roofline(4096, 4095, 256, 1000.0, 197.0,
                                     tier="default")
    r_high = bench._implicit_roofline(4096, 4095, 256, 1000.0, 197.0,
                                      tier="high")
    assert r_def["mxu_tier"] == "default"
    assert r_high["hw_tflops"] == pytest.approx(3 * r_def["hw_tflops"])
    assert r_def["useful_tflops"] == pytest.approx(r_high["useful_tflops"])
    assert r_def.get("useful_mfu_is_exact_equivalent") is True
    assert bench._implicit_roofline(4096, 4095, 256, 1.0, 197.0,
                                    tier="bogus") is None


def test_cached_roofline():
    out = bench._cached_roofline(4096, 100.0, 819.0)
    assert out["hbm_gbs"] == pytest.approx(4096 * 4096 * 4 * 100.0 / 1e9)
    assert 0 < out["hbm_peak_frac"] < 100


def test_numpy_baseline_runs():
    X = np.random.default_rng(1).normal(size=(64, 8)).astype(np.float32)
    rate = bench._bench_numpy_baseline(X, 0.125, 8)
    assert rate > 0


def test_adaptive_escalation_fixture_shape():
    """The escalation probe must return the contract keys (tiny shapes —
    on CPU the plan resolves fixed, so escalated may be absent/False; the
    real trigger is measured on hardware and recorded in BENCH/PERF)."""
    out = bench._adaptive_escalation(96, 16, "xla")
    assert {"iterations", "converged", "train_accuracy_pct"} <= set(out)
    assert out["converged"] in (True, False)
