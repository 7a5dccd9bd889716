"""Trajectory geometry metrics, vectorized.

The reference computes polyline length and mean inter-segment angle with
Python loops over waypoints (`src/model.py:135-155`); here both are shifted
differences + reductions, so they fuse into the jitted loss and cost O(W)
vector work with no host round-trips.
"""
from __future__ import annotations

import jax.numpy as jnp

from trajectory_optimization_tpu.ops.numerics import acos_clipped, safe_norm


def polyline_length(traj: jnp.ndarray) -> jnp.ndarray:
    """Total length of the polyline through waypoints (W, 3).

    Parity: reference `length_calc` (`src/model.py:135-139`); safe_norm gives
    torch's zero subgradient for coincident consecutive waypoints.
    """
    seg = traj[1:] - traj[:-1]
    return jnp.sum(safe_norm(seg, axis=-1))


def mean_segment_angle(traj: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Mean angle at interior waypoints: arccos(AB·AC/(‖AB‖‖AC‖+eps)).

    AB = pᵢ₋₁ − pᵢ, AC = pᵢ₊₁ − pᵢ; a straight line gives π (larger = straighter
    = smoother). Parity: reference `mean_angle_calc` (`src/model.py:142-155`).
    The arccos argument is clamped to the closed domain to avoid NaN from
    float32 round-off on exactly-collinear segments (the reference, in
    float32 torch, has the same latent hazard; clamping only activates
    out-of-domain so in-domain values are bit-identical).
    """
    if traj.shape[0] < 3:
        # no interior waypoints: the 0/0 mean below would be NaN and poison
        # the smoothness loss + its gradients (models.traj.traj_criterion).
        # A <3-point path is straight by definition — report pi, the
        # straight-line angle (same convention as models/evaluate.py).
        return jnp.asarray(jnp.pi, dtype=traj.dtype)
    ab = traj[:-2] - traj[1:-1]
    ac = traj[2:] - traj[1:-1]
    cos = jnp.sum(ab * ac, axis=-1) / (
        safe_norm(ab, axis=-1) * safe_norm(ac, axis=-1) + eps
    )
    phi = acos_clipped(cos)
    return jnp.sum(phi) / (traj.shape[0] - 2)


def menger_curvature(traj: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-interior-waypoint Menger curvature 4·Area/(abc) — the smoothness
    variant used by the reference's distance-reward notebook
    (`notebooks/camera_traj_optimization.ipynb`, `curvature_calc`).

    Returns (W-2,) curvatures.
    """
    p1, p2, p3 = traj[:-2], traj[1:-1], traj[2:]
    a = jnp.linalg.norm(p2 - p1, axis=-1)
    b = jnp.linalg.norm(p3 - p2, axis=-1)
    c = jnp.linalg.norm(p3 - p1, axis=-1)
    cross = jnp.cross(p2 - p1, p3 - p1)
    area = 0.5 * jnp.linalg.norm(cross, axis=-1)
    return 4.0 * area / (a * b * c + eps)
