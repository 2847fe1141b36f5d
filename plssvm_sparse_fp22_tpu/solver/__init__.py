"""Conjugate-gradient solver (the algorithm core of LS-SVM training)."""

from .cg import CGResult, cg_solve

__all__ = ["CGResult", "cg_solve"]
