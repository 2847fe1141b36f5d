"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding tests run on the
same suite, SURVEY.md §4) and with x64 enabled so float64 parity against the
reference's ``double`` instantiation is checkable.  Must run before the first
``import jax``.
"""

import os
import sys

# The axon sitecustomize registers the TPU plugin at interpreter startup and
# overrides the JAX_PLATFORMS environment variable, so the env-var route is
# not enough: force the platform through the config API before any backend
# initializes.  XLA_FLAGS is read lazily at CPU-backend init, so setting it
# here (before the first jax computation) still takes effect.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


REFERENCE_DATA = "/root/reference/tests/data"


@pytest.fixture
def reference_data_dir():
    """Path to the reference's test fixtures; skip if unavailable."""
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
