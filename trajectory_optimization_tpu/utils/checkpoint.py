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


def _save_npz(path: str, payload) -> str:
    flat, treedef = jax.tree_util.tree_flatten(payload)
    path = path if path.endswith(".npz") else path + ".npz"
    np.savez(
        path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        n_leaves=len(flat),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )
    return path


def save_checkpoint(path: str, params, opt_state=None, step: int = 0, extra: Optional[Dict] = None) -> str:
    """Save an optimization state.

    A ``.npz`` path selects the flat-npz format explicitly; otherwise orbax
    is used when available, with npz as the fallback.
    """
    payload = {"params": params, "opt_state": opt_state, "step": step, "extra": extra or {}}
    if path.endswith(".npz"):
        return _save_npz(path, payload)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        return path
    except Exception:  # orbax missing or incompatible — flat npz fallback
        return _save_npz(path, payload)


def load_checkpoint(path: str, like=None):
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``like``: an example payload pytree (same structure) — required for the
    npz format, optional for orbax. The npz restore verifies the saved
    treedef against ``like`` and requires every leaf to be present (a
    structure mismatch raises instead of silently mis-assigning leaves).
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=like)
    data = np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False)
    if like is None:
        raise ValueError("npz checkpoint restore requires `like` (an example pytree)")
    flat, treedef = jax.tree_util.tree_flatten(like)
    if "treedef" in data:
        saved_td = bytes(np.asarray(data["treedef"])).decode()
        if saved_td != str(treedef):
            raise ValueError(
                "checkpoint structure mismatch: saved treedef "
                f"{saved_td!r} != `like` treedef {str(treedef)!r}"
            )
    n_saved = int(data["n_leaves"]) if "n_leaves" in data else len(flat)
    if n_saved != len(flat):
        raise ValueError(f"checkpoint has {n_saved} leaves, `like` has {len(flat)}")
    leaves = []
    for i in range(len(flat)):
        key = f"leaf_{i}"
        if key not in data:
            raise KeyError(f"checkpoint missing {key} (corrupt or partial save)")
        leaves.append(data[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)
