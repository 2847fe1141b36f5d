"""CG-state checkpointing: save/resume training mid-solve.

Capability extension over the reference, whose only checkpoint is the final
model file (SURVEY.md §5: "Intra-training CG checkpointing does not exist").
The resumable :class:`~.cg.CGState` (iteration counter, x, r, d, delta,
delta0) plus the setup vectors (q, QA_cost) are everything needed to
continue a solve bit-exactly — the iteration counter keeps the 50-step
residual refresh aligned across resumes.

Files are numpy ``.npz`` archives written atomically (temp + rename).
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from .cg import CGState


CHECKPOINT_VERSION = 1


def save_cg_checkpoint(path: str, state: CGState, q, QA_cost, meta: dict) -> None:
    """Atomically write the CG state + setup vectors + metadata."""
    payload = {
        "version": CHECKPOINT_VERSION,
        "k": np.asarray(state.k),
        "x": np.asarray(state.x),
        "r": np.asarray(state.r),
        "d": np.asarray(state.d),
        "delta": np.asarray(state.delta),
        "delta0": np.asarray(state.delta0),
        "q": np.asarray(q),
        "QA_cost": np.asarray(QA_cost),
    }
    for key, value in meta.items():
        payload[f"meta_{key}"] = np.asarray(value)

    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_cg_checkpoint(path: str):
    """Load ``(CGState, q, QA_cost, meta)`` or ``None`` if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if int(z["version"]) != CHECKPOINT_VERSION:
            return None
        state = CGState(
            k=jnp.asarray(z["k"]),
            x=jnp.asarray(z["x"]),
            r=jnp.asarray(z["r"]),
            d=jnp.asarray(z["d"]),
            delta=jnp.asarray(z["delta"]),
            delta0=jnp.asarray(z["delta0"]),
        )
        q = jnp.asarray(z["q"])
        QA_cost = jnp.asarray(z["QA_cost"])
        meta = {
            key[len("meta_"):]: z[key] for key in z.files if key.startswith("meta_")
        }
    return state, q, QA_cost, meta
