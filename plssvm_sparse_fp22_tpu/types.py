"""Enumerations with string round-trips.

TPU-native equivalents of the reference enums:

- :class:`KernelType`      — ``include/plssvm/kernel_types.hpp:27-34`` and the
  stream operators in ``src/plssvm/kernel_types.cpp`` (names or integer
  strings, case-insensitive).
- :class:`BackendType`     — ``include/plssvm/backend_types.hpp`` /
  ``src/plssvm/backend_types.cpp:26-115``.  The reference's five compute
  backends (OpenMP/CUDA/HIP/OpenCL/SYCL) collapse onto XLA: every device kind
  is served by the same traced program.  We keep ``automatic`` plus backend
  names that select *how* the hot kernel-matvec is executed (pure-XLA ops vs.
  hand-written Pallas kernels), the moral analog of the reference's backend
  zoo, and accept the reference's historical names as aliases for
  ``automatic`` so CLI invocations remain compatible.
- :class:`TargetPlatform`  — ``include/plssvm/target_platforms.hpp`` /
  ``src/plssvm/target_platforms.cpp:21-73``: ``automatic/cpu/tpu`` plus the
  reference GPU names accepted as aliases.
"""

from __future__ import annotations

import enum

from .exceptions import UnsupportedBackendError, UnsupportedKernelTypeError


class KernelType(enum.IntEnum):
    """Kernel functions (``kernel_types.hpp:27-34``)."""

    linear = 0
    polynomial = 1
    rbf = 2

    def __str__(self) -> str:  # mirrors operator<< (kernel_types.cpp)
        return self.name

    @classmethod
    def from_string(cls, s: str) -> "KernelType":
        """Parse from a name or integer string, case-insensitively.

        Mirrors ``operator>>(std::istream&, kernel_type&)``
        (``kernel_types.cpp``).
        """
        t = str(s).strip().lower()
        if t in ("linear", "0"):
            return cls.linear
        if t in ("polynomial", "1"):
            return cls.polynomial
        if t in ("rbf", "2"):
            return cls.rbf
        raise UnsupportedKernelTypeError(f"Unrecognized kernel type '{s}'!")


class BackendType(enum.Enum):
    """Compute-path selection (``backend_types.hpp``).

    ``automatic`` resolves to the best path for the current JAX platform
    (``determine_default_backend``, ``backend_types.cpp:51-74``):
    ``pallas`` fused kernels on TPU, plain ``xla`` ops elsewhere.
    """

    automatic = "automatic"
    #: pure jax.numpy/XLA implicit matvec — runs on any JAX platform
    xla = "xla"
    #: fused Pallas (Mosaic) kernels — the TPU-native analog of the CUDA/.cl
    #: device kernels (``src/plssvm/backends/CUDA``, ``OpenCL/*.cl``)
    pallas = "pallas"

    def __str__(self) -> str:
        return self.value

    @classmethod
    def from_string(cls, s: str) -> "BackendType":
        t = str(s).strip().lower()
        # reference backend names map onto the single XLA compute path;
        # accepted for CLI compatibility (backend_types.cpp:76-115)
        aliases = {
            "openmp": cls.automatic,
            "cuda": cls.automatic,
            "hip": cls.automatic,
            "opencl": cls.automatic,
            "sycl": cls.automatic,
        }
        if t in aliases:
            return aliases[t]
        for member in cls:
            if member.value == t:
                return member
        raise UnsupportedBackendError(f"Unrecognized backend type '{s}'!")


def list_available_backends() -> list[BackendType]:
    """All compute paths available in this build

    (analog of ``list_available_backends``, ``backend_types.cpp:26-44``)."""
    return [BackendType.automatic, BackendType.xla, BackendType.pallas]


class TargetPlatform(enum.Enum):
    """Hardware target (``target_platforms.hpp``)."""

    automatic = "automatic"
    cpu = "cpu"
    tpu = "tpu"

    def __str__(self) -> str:
        return self.value

    @classmethod
    def from_string(cls, s: str) -> "TargetPlatform":
        t = str(s).strip().lower()
        # the reference's GPU vendor targets have no TPU meaning; map them to
        # automatic so reference CLI invocations keep working
        if t in ("gpu_nvidia", "gpu_amd", "gpu_intel", "gpu"):
            return cls.automatic
        for member in cls:
            if member.value == t:
                return member
        raise UnsupportedBackendError(f"Unrecognized target platform '{s}'!")


def list_available_target_platforms() -> list[TargetPlatform]:
    """Analog of ``list_available_target_platforms`` (``target_platforms.cpp``)."""
    return [TargetPlatform.automatic, TargetPlatform.cpu, TargetPlatform.tpu]
