"""Distance-reward trajectory model (notebook parity).

Reference: `notebooks/camera_traj_optimization.ipynb` cells 4/6 — a ModelTraj
variant where the per-waypoint observation probability is a Gaussian of the
world-space distance to the waypoint, exp(−½((‖p−t‖−μ)/σ)²) with μ=3, σ=2,
gated by *binary* frustum membership; camera orientations are 3×3 rotation
matrices (not quaternions); smoothness is available both as mean angle and
Menger curvature (`curvature_calc`); criterion weights differ from the main
model (vis = N/Σrewards, smooth 0.05, length 0.0005).

Batched over waypoints like models.traj (the notebook loops in Python).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from trajectory_optimization_tpu.ops.numerics import safe_norm
from trajectory_optimization_tpu.ops.trajectory import (
    mean_segment_angle,
    menger_curvature,
    polyline_length,
)

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DistanceRewardProblem:
    img_width: float
    img_height: float
    min_dist: float = 1.0
    max_dist: float = 10.0
    dist_rewards_mean: float = 3.0
    dist_rewards_sigma: float = 2.0
    smoothness_weight: float = 0.05
    length_weight: float = 0.0005
    eps: float = 1e-6


def init_distance_reward_params(traj0: np.ndarray) -> Params:
    """traj (W,3) + identity rotation matrices (W,3,3) — the notebook's
    parametrization."""
    traj0 = np.asarray(traj0, np.float32)
    w = len(traj0)
    rots = np.broadcast_to(np.eye(3, dtype=np.float32), (w, 3, 3)).copy()
    return {"traj": jnp.asarray(traj0), "rots": jnp.asarray(rots)}


def gaussian(x, mu: float = 3.0, sigma: float = 100.0, normalize: bool = False):
    """Unnormalized (or normalized) Gaussian bump (notebook `gaussian`)."""
    g = jnp.exp(-0.5 * jnp.square((x - mu) / sigma))
    if normalize:
        g = g / (sigma * jnp.sqrt(2.0 * jnp.pi))
    return g


def distance_reward_forward(
    params: Params,
    points: jnp.ndarray,
    K: jnp.ndarray,
    traj0: jnp.ndarray,
    problem: DistanceRewardProblem,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss + rewards for the distance-reward variant.

    Per waypoint (batched): cam = Rᵀ(p − t); binary z-range AND pixel-border
    frustum test; observation p = gaussian(‖p_world − t‖) · mask; clip to
    [0.5, 1−eps]; log-odds sum; σ; composite criterion.
    """
    traj, rots = params["traj"], params["rots"]  # (W,3), (W,3,3)

    # cam = Rᵀ (p − t): columns of R are camera axes ⇒ (p − t) @ R
    cam = jnp.einsum("nj,wjk->wnk", points, rots, precision="highest") - jnp.einsum(
        "wj,wjk->wk", traj, rots, precision="highest"
    )[:, None, :]
    zc = cam[..., 2]
    dist_mask = (zc > problem.min_dist) & (zc < problem.max_dist)
    ph = jnp.matmul(cam, K.T, precision="highest")
    u = ph[..., 0] / ph[..., 2]
    v = ph[..., 1] / ph[..., 2]
    fov_mask = (
        (ph[..., 2] > 0)
        & (u > 1) & (u < problem.img_width - 1)
        & (v > 1) & (v < problem.img_height - 1)
    )
    mask = dist_mask & fov_mask  # (W, N)

    dists = safe_norm(points[None, :, :] - traj[:, None, :], axis=-1)  # world-space
    p = gaussian(dists, problem.dist_rewards_mean, problem.dist_rewards_sigma) * mask
    p = jnp.clip(p, 0.5, 1.0 - problem.eps)
    lo_sum = jnp.sum(jnp.log(p / (1.0 - p)), axis=0)
    rewards = 1.0 / (1.0 + jnp.exp(-lo_sum))

    n = points.shape[0]
    loss_vis = n / (jnp.sum(rewards) + problem.eps)
    loss_l2 = safe_norm(traj[0] - traj0[0])
    loss_smooth = problem.smoothness_weight / (
        mean_segment_angle(traj, problem.eps) + problem.eps
    )
    loss_length = problem.length_weight * jnp.abs(
        polyline_length(traj) - polyline_length(traj0)
    )
    loss = loss_vis + loss_l2 + loss_length + loss_smooth
    return loss, {
        "rewards": rewards,
        "loss_vis": loss_vis,
        "loss_l2": loss_l2,
        "loss_smooth": loss_smooth,
        "loss_length": loss_length,
        "mean_curvature": jnp.mean(menger_curvature(traj, problem.eps)),
        "mean_reward": jnp.mean(rewards),
    }
