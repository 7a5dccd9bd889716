"""Data loading, padding, and shape-bucketing utilities.

Parity: the reference loads npz point clouds (`pts` key, Nx3 float64,
`src/pc_publisher.py:26-30`) and waypoint paths (`poses` key, Wx3,
`src/trajectory_optimization_sample.py:42-43`). Clouds arriving over the bus
vary in size per message; XLA wants static shapes, so we pad to bucketed sizes
and carry a validity mask (SURVEY.md §7 "fixed shapes vs ragged clouds").
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def load_point_cloud(path: str, key: str = "pts", dtype=np.float32) -> np.ndarray:
    """Load an (N, 3) point cloud from an .npz file.

    Transposes if stored as (3, N) — same guard as the reference samples
    (`src/pose_optimization_sample.py:53-55`).
    """
    pts = np.load(path)[key]
    orig_shape = pts.shape
    if pts.ndim != 2:
        raise ValueError(f"expected 2D point array, got shape {orig_shape}")
    if pts.shape[0] < pts.shape[1]:
        pts = pts.T
    if pts.shape[1] != 3:
        raise ValueError(f"expected Nx3 (or 3xN) points, got shape {orig_shape}")
    return np.ascontiguousarray(pts, dtype=dtype)


def load_path(path: str, key: str = "poses", dtype=np.float32) -> np.ndarray:
    """Load a (W, 3) waypoint path from an .npz file."""
    poses = np.load(path)[key]
    if poses.ndim != 2 or poses.shape[1] != 3:
        raise ValueError(f"expected Wx3 poses, got shape {poses.shape}")
    return np.ascontiguousarray(poses, dtype=dtype)


def identity_quaternions(n: int, dtype=np.float32) -> np.ndarray:
    """(n, 4) identity wxyz quaternions — the reference's default waypoint
    orientation (`src/trajectory_optimization_sample.py:46-49`)."""
    q = np.zeros((n, 4), dtype=dtype)
    q[:, 0] = 1.0
    return q


def bucket_size(n: int, *, multiple: int = 1024, min_size: int = 1024) -> int:
    """Round a cloud size up to a power-of-two-ish bucket.

    Buckets avoid one XLA recompilation per distinct message size
    (SURVEY.md §7 "per-message recompilation"). Growth is by doubling above
    ``multiple`` so the number of distinct compiled shapes stays O(log N).
    """
    n = max(int(n), 1)
    if n <= min_size:
        return min_size
    b = min_size
    while b < n:
        b *= 2
    # refine to 1/4 steps between powers of two to cap padding waste at ~25%
    for frac in (b // 2 + b // 8, b // 2 + b // 4, b // 2 + 3 * b // 8, b // 2 + b // 2):
        cand = (frac // multiple) * multiple
        if cand >= n:
            return max(cand, min_size)
    return b


def pad_points(
    pts: np.ndarray, target: int | None = None, *, multiple: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad an (N, 3) cloud to a bucketed static size.

    Returns (padded_points (M,3), valid_mask (M,) float32). Padded entries are
    placed far away (1e6) so binary masks naturally exclude them; all mask math
    must still multiply by ``valid`` (see models).
    """
    n = pts.shape[0]
    m = bucket_size(n, multiple=multiple) if target is None else int(target)
    if m < n:
        raise ValueError(f"target {m} < cloud size {n}")
    out = np.full((m, 3), 1.0e6, dtype=pts.dtype)
    out[:n] = pts
    valid = np.zeros((m,), dtype=np.float32)
    valid[:n] = 1.0
    return out, valid


def reference_data_dir() -> str:
    """Directory with bundled sample data (cloud/path index 10)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "data")
