"""Hidden-point removal (Katz spherical-flip HPR).

Reference semantics (`src/tools.py:38-85`): spherical-flip the cloud about the
origin with R = max‖p‖·10^param, append the origin, take the convex hull
(Qhull); hull vertices = visible points. The reference runs this on CPU via
scipy and admits it is non-differentiable (its own TODO, `src/tools.py:61-62`).

This module provides three tiers:

1. :func:`hpr_mask_exact` — bit-exact reference parity: the same spherical
   flip + Qhull hull (scipy wraps the identical Qhull C library the reference
   calls). Host-side, non-differentiable — exactly like the reference, which
   only ever calls it on detached tensors.

2. :func:`hpr_mask_approx` — TPU-native fixed-shape approximation: a point is
   hidden iff some other point dominates it in the flipped geometry,
   ρ'ⱼ·cosθᵢⱼ > ρ'ᵢ  (ρ' = flipped radius 2R − ‖p‖). The pairwise cosθ matrix
   is U·Uᵀ — an (N, N) matmul on the MXU, evaluated in row blocks so memory
   stays O(block·N). Matches Qhull's visible set to ~97% on the sample cloud
   (tests/test_hpr.py) and is jittable.

3. :func:`hpr_mask_soft` — differentiable relaxation of (2): replaces the
   hard max-dominance test with a log-sum-exp + sigmoid, giving useful
   gradients for occlusion-aware optimization — the thing the reference's
   TODO wished for.

The Open3D variant (`src/tools.py:88-119`, same algorithm with an axis flip
and radius = 100·diameter) is subsumed by :func:`hpr_mask_exact` with an
explicit ``radius`` argument.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG_SOFT = 1.0e30  # self-exclusion sentinel for the soft dominance test


def spherical_flip(points: jnp.ndarray, r_param: float = 2.0) -> jnp.ndarray:
    """Katz spherical flip: p' = p·(2R − ‖p‖)/‖p‖ with R = max‖p‖·10^r_param.

    Jittable and differentiable (norms are bounded away from 0 for real
    clouds; a zero point is guarded).
    """
    norms = jnp.linalg.norm(points, axis=-1)
    radius = jnp.max(norms) * 10.0 ** r_param
    safe = jnp.maximum(norms, 1e-12)
    scale = (2.0 * (radius - norms) / safe) + 1.0
    return points * scale[:, None]


def hpr_mask_exact(
    points: np.ndarray, r_param: float = 2.0, radius: Optional[float] = None
) -> np.ndarray:
    """Exact Katz HPR visible-point mask via Qhull (host-side, reference parity).

    Args:
      points: (N, 3) cloud, camera at the origin.
      r_param: flip-radius exponent (reference default 2).
      radius: override the flip radius directly (the Open3D variant uses
        100 · cloud diameter, `src/tools.py:107`).

    Returns (N,) bool visibility mask.
    """
    from scipy.spatial import ConvexHull  # Qhull — the reference's own backend

    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    norms = np.linalg.norm(pts, axis=1)
    if radius is None:
        radius = norms.max() * 10.0 ** r_param
    safe = np.maximum(norms, 1e-12)
    flipped = pts * ((2.0 * (radius - norms) / safe) + 1.0)[:, None]
    hull = ConvexHull(np.vstack([flipped, np.zeros(3)]))
    mask = np.zeros(n, dtype=bool)
    mask[[v for v in hull.vertices if v < n]] = True
    return mask


def hpr_points_exact(points: np.ndarray, r_param: float = 2.0) -> Tuple[np.ndarray, np.ndarray]:
    """(visible_points, mask) — the reference's `hidden_pts_removal` return
    shape (`src/tools.py:67-85`)."""
    mask = hpr_mask_exact(points, r_param)
    return np.asarray(points)[mask], mask


@partial(jax.jit, static_argnames=("r_param", "block", "n_passes"))
def hpr_mask_approx(
    points: jnp.ndarray,
    r_param: float = 2.0,
    *,
    block: int = 1024,
    n_passes: int = 7,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """TPU-native HPR visible mask by support-function sampling (jittable).

    A flipped point p'ᵢ is a hull vertex (⇔ visible) iff it is the argmax of
    the support function d ↦ maxⱼ p'ⱼ·d for SOME direction d. We sample
    directions — the N radial directions uᵢ plus (n_passes−1) jittered
    copies — and mark every winner visible. Each pass is one (block, N)
    matmul chain on the MXU.

    Properties (validated against Qhull on the sample cloud, tests/test_hpr.py):
      * ZERO false positives — every winner is a true hull vertex;
      * recall grows with n_passes (~81% at 1 pass, ~93% at the default 7); missed
        are "barely-visible" vertices with tiny normal cones, so the error
        direction is conservative (never claims a hidden point visible).

    Returns (N,) float mask in {0, 1}.
    """
    n = points.shape[0]
    norms = jnp.linalg.norm(points, axis=-1)
    radius = jnp.max(norms) * 10.0 ** r_param
    rho = 2.0 * radius - norms  # flipped radii (flip preserves direction)
    u = points / jnp.maximum(norms, 1e-12)[:, None]

    n_pad = (-n) % block
    n_blocks = (n + n_pad) // block
    if key is None:
        key = jax.random.PRNGKey(0)
    jitters = [0.0, 0.002, 0.005, 0.01, 0.02, 0.04, 0.08][:n_passes]

    mask = jnp.zeros((n,), jnp.float32)
    for p, scale in enumerate(jitters):
        if scale == 0.0:
            dirs = u
        else:
            noise = jax.random.normal(jax.random.fold_in(key, p), u.shape) * scale
            d = u + noise
            dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        dirs_p = jnp.pad(dirs, ((0, n_pad), (0, 0)))

        def row_block(i, dirs_p=dirs_p):
            db = jax.lax.dynamic_slice(dirs_p, (i * block, 0), (block, 3))
            # full-f32 matmul: support margins are O(0.5%) of ρ'; the TPU's
            # default bf16 contraction would scramble the argmax
            proj = jnp.matmul(db, u.T, precision="highest") * rho
            return jnp.argmax(proj, axis=1)

        winners = jax.lax.map(row_block, jnp.arange(n_blocks)).reshape(-1)
        mask = mask.at[winners].set(1.0)
    return mask


@partial(jax.jit, static_argnames=("r_param", "block", "sharpness", "tau"))
def hpr_mask_soft(
    points: jnp.ndarray,
    r_param: float = 2.0,
    *,
    block: int = 1024,
    sharpness: float = 200.0,
    tau: float = 0.03,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable HPR visibility in (0, 1).

    Smooth margin test in the flipped geometry: point i is visible to the
    degree that its flipped radius stands clear of the strongest radial
    coverer, σ(β·(ρ'ᵢ + τ·scale − softmaxⱼ ρ'ⱼcosθᵢⱼ)). The slack τ = 0.03
    (calibrated against Qhull on the sample cloud, ~88% binary agreement)
    compensates the single-witness-direction bias of the margin test.

    Gradients flow to the point coordinates — usable *inside* the
    optimization loop, which the reference could never do (its HPR is a CPU
    Qhull call on detached tensors; `src/tools.py:61-62`). For a
    high-fidelity non-differentiable mask use :func:`hpr_mask_approx`.
    """
    n = points.shape[0]
    norms = jnp.linalg.norm(points, axis=-1)
    if valid is not None:
        # padded points must neither set the flip radius nor cover anyone
        norms_v = jnp.where(valid > 0, norms, 0.0)
    else:
        norms_v = norms
    radius = jnp.max(norms_v) * 10.0 ** r_param
    rho = 2.0 * radius - norms
    if valid is not None:
        rho = jnp.where(valid > 0, rho, -_BIG_SOFT)
    # normalization constant; stop_gradient — a traced beta multiplying the
    # -BIG self-exclusion sentinel would otherwise poison the backward
    scale = jax.lax.stop_gradient(jnp.maximum(jnp.max(norms_v), 1e-6))
    u = points / jnp.maximum(norms, 1e-12)[:, None]

    n_pad = (-n) % block
    u_p = jnp.pad(u, ((0, n_pad), (0, 0)))
    rho_p = jnp.pad(rho, (0, n_pad), constant_values=-1.0)

    def row_block(i):
        ub = jax.lax.dynamic_slice(u_p, (i * block, 0), (block, 3))
        rb = jax.lax.dynamic_slice(rho_p, (i * block,), (block,))
        cos = jnp.clip(jnp.matmul(ub, u.T, precision="highest"), -1.0, 1.0)
        idx = jax.lax.broadcasted_iota(jnp.int32, cos.shape, 1)
        self_col = i * block + jax.lax.broadcasted_iota(jnp.int32, cos.shape, 0)
        beta = sharpness / scale
        dom = jnp.where(
            idx == self_col, -_BIG_SOFT, jnp.maximum(cos, 0.0) * rho
        )  # finite sentinel: softmax weight underflows to 0, gradient stays clean
        smax = jax.nn.logsumexp(beta * dom, axis=1) / beta
        return jax.nn.sigmoid(beta * (rb + tau * scale - smax))

    n_blocks = (n + n_pad) // block
    vis = jax.lax.map(row_block, jnp.arange(n_blocks))
    return vis.reshape(-1)[:n]
