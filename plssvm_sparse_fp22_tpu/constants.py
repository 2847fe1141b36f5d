"""Compile-time tuning constants.

TPU-native analog of ``include/plssvm/constants.hpp:16-43``.  The reference
exposes CUDA-convention tiling knobs (``THREAD_BLOCK_SIZE=16``,
``INTERNAL_BLOCK_SIZE=6``, ``OPENMP_BLOCK_SIZE=64``); on TPU the natural units
are the MXU systolic array (128x128) and the VPU lane count (128), so the
Pallas kernel-matvec tiles default to multiples of 128.  All knobs are
overridable via environment variables (the analog of the reference's CMake
macro overrides, ``CMakeLists.txt:398-438``).
"""

from __future__ import annotations

import os


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


#: row-block (``i`` axis) tile of the Pallas implicit kernel-matvec.
#: Analog of ``THREAD_BLOCK_SIZE * INTERNAL_BLOCK_SIZE = 96`` (constants.hpp:23,30),
#: rounded to the MXU native 128.
ROW_BLOCK_SIZE: int = _env_int("PLSSVM_ROW_BLOCK_SIZE", 256)

#: column-block (``j`` axis) tile of the Pallas implicit kernel-matvec.
COL_BLOCK_SIZE: int = _env_int("PLSSVM_COL_BLOCK_SIZE", 256)

#: feature-axis tile streamed through VMEM per MXU pass.
FEATURE_BLOCK_SIZE: int = _env_int("PLSSVM_FEATURE_BLOCK_SIZE", 512)

#: square block of the symmetric (triangular block-pair) Pallas kernel.
#: Unset -> chosen adaptively per system size from measured v5e per-element
#: costs (``ops/pallas_matvec._choose_sym_bm``; 1024 is ~2x cheaper per
#: element than 256 but pads small systems harder).  Setting the env var
#: forces a fixed value.
SYM_BLOCK_SIZE: int = _env_int("PLSSVM_SYM_BLOCK_SIZE", 1024)

#: padding applied to the CG system size so every Pallas/XLA block is full.
#: Analog of ``boundary_size_ = THREAD_BLOCK_SIZE * INTERNAL_BLOCK_SIZE``
#: (``gpu_csvm.cpp:133``); 128-lane aligned here.
PAD_SIZE: int = _env_int("PLSSVM_PAD_SIZE", 128)

#: CG residual recompute interval (``gpu_csvm.cpp:272``, ``OpenMP/csvm.cpp:130``).
RESIDUAL_REFRESH_INTERVAL: int = 50

assert ROW_BLOCK_SIZE % 8 == 0, "ROW_BLOCK_SIZE must be sublane aligned"
assert COL_BLOCK_SIZE % 128 == 0, "COL_BLOCK_SIZE must be lane aligned"
assert PAD_SIZE % 8 == 0, "PAD_SIZE must be sublane aligned"
