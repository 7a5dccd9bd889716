"""Checkpoint / resume for optimization state (orbax).

The reference has no persistence at all — optimization state lives for one
ROS callback and dies (SURVEY.md §5 "checkpoint/resume: none"). Here any
(params, opt_state, step) tuple can be saved and restored, enabling
long-running / preemptible trajectory optimization and warm-starting the
next message's problem from the previous solution.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, params, opt_state=None, step: int = 0, extra: Optional[Dict] = None) -> str:
    """Save an optimization state. Uses orbax if available, npz otherwise."""
    payload = {"params": params, "opt_state": opt_state, "step": step, "extra": extra or {}}
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        return path
    except Exception:  # orbax missing or incompatible — flat npz fallback
        flat, treedef = jax.tree_util.tree_flatten(payload)
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
            n_leaves=len(flat),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat) if x is not None},
        )
        return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, like=None):
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``like``: an example payload pytree (same structure) — required for the
    npz fallback, optional for orbax.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=like)
    data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    if like is None:
        raise ValueError("npz checkpoint restore requires `like` (an example pytree)")
    flat, treedef = jax.tree_util.tree_flatten(like)
    leaves = [data[f"leaf_{i}"] if f"leaf_{i}" in data else None for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(treedef, leaves)
