"""Conjugate-gradient solver (the algorithm core of LS-SVM training)."""

from .cg import CGResult, CGState, cg_init, cg_run, cg_solve
from .checkpoint import load_cg_checkpoint, save_cg_checkpoint

__all__ = [
    "CGResult",
    "CGState",
    "cg_init",
    "cg_run",
    "cg_solve",
    "load_cg_checkpoint",
    "save_cg_checkpoint",
]
