"""Finite-difference frustum visibility estimator (notebook parity).

Reference: `notebooks/camera_pose_optimization.ipynb` cells 2-3 — a camera
parametrized by (dist, elev, azim) around the origin scores visibility as the
*binary count* of in-frustum points; since the count is piecewise-constant,
the notebook estimates gradients by finite differences (δ=0.1 perturbations
of the look-at transform) inside a custom autograd Function.

Replicated here with jax.custom_vjp, including the notebook's quirks:
  * the backward multiplies the cotangent by the raw reward difference
    f(x+δ)−f(x), NOT the quotient (f(x+δ)−f(x))/δ;
  * the world→camera transform subtracts pytorch3d's T (which is −C·R, not
    the camera position) directly from world points.
Both are bug-compatible by design and documented where they occur.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics


def look_at_view_transform(
    dist, elev, azim, *, degrees: bool = True, up=(0.0, 1.0, 0.0), at=(0.0, 0.0, 0.0)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pytorch3d-convention look-at: returns (R (3,3), T (3,)) with
    X_cam = X_world @ R + T (row-vector convention; R columns are the camera
    axes in world coordinates, T = −C·R for camera position C)."""
    if degrees:
        elev = jnp.deg2rad(elev)
        azim = jnp.deg2rad(azim)
    at = jnp.asarray(at, jnp.float32)
    C = at + dist * jnp.stack(
        [jnp.cos(elev) * jnp.sin(azim), jnp.sin(elev), jnp.cos(elev) * jnp.cos(azim)]
    )
    z = at - C
    z = z / jnp.linalg.norm(z)
    upv = jnp.asarray(up, jnp.float32)
    x = jnp.cross(upv, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=1)  # columns = camera axes
    T = -jnp.matmul(C, R, precision="highest")  # bf16 here skews pixels ~4 px
    return R, T


def binary_visibility_count(
    dist_elev_azim: jnp.ndarray,
    points: jnp.ndarray,
    *,
    min_dist: float = 1.0,
    max_dist: float = 10.0,
) -> jnp.ndarray:
    """Count of points inside the frustum of the (dist, elev, azim) camera.

    Notebook `rewards_from_pose`: cam = Rᵀ(p − T) — note T is pytorch3d's
    −C·R, subtracted as if it were the camera position (notebook behavior,
    kept for parity) — then hard z-range and 1-px-border pixel tests.
    """
    intr = default_intrinsics()
    K = intr.matrix()
    d, e, a = dist_elev_azim[0], dist_elev_azim[1], dist_elev_azim[2]
    R, T = look_at_view_transform(d, e, a)
    cam = jnp.matmul(points - T, R, precision="highest")  # Rᵀ(p − T), row-vector form
    zc = cam[:, 2]
    dist_mask = (zc > min_dist) & (zc < max_dist)
    ph = jnp.matmul(cam, K.T, precision="highest")  # strict border tests need f32
    u = ph[:, 0] / ph[:, 2]
    v = ph[:, 1] / ph[:, 2]
    fov_mask = (
        (ph[:, 2] > 0)
        & (u > 1) & (u < intr.width - 1)
        & (v > 1) & (v < intr.height - 1)
    )
    return jnp.sum(dist_mask & fov_mask).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def frustum_visibility_fd(dist_elev_azim, points, delta: float = 0.1):
    """Binary visibility count with finite-difference gradients (δ per axis).

    Parity: `FrustumVisibilityEst` — the backward scales the cotangent by the
    raw differences f(x+δeᵢ)−f(x) (the notebook never divides by δ).
    """
    return binary_visibility_count(dist_elev_azim, points)


def _fd_fwd(dist_elev_azim, points, delta):
    r0 = binary_visibility_count(dist_elev_azim, points)
    diffs = jnp.stack(
        [
            binary_visibility_count(dist_elev_azim + delta * jnp.eye(3, dtype=jnp.float32)[i], points) - r0
            for i in range(3)
        ]
    )
    return r0, (diffs, points.shape)


def _fd_bwd(delta, res, g):
    diffs, _ = res
    return (g * diffs, None)


frustum_visibility_fd.defvjp(_fd_fwd, _fd_bwd)


def fd_pose_loss(dist_elev_azim, points, delta: float = 0.1) -> jnp.ndarray:
    """Notebook Model criterion: loss = 1/(visible count + eps)."""
    return 1.0 / (frustum_visibility_fd(dist_elev_azim, points, delta) + 1e-6)
