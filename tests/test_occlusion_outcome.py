"""Outcome referee for occlusion-aware optimization (VERDICT r3 #3).

Mechanism tests (gradients finite, loss decreases) cannot tell whether
differentiable occlusion actually changes RESULTS. Here both variants
optimize the same problem and an EXACT Qhull HPR referees the final poses:
the occlusion-aware run must end up genuinely seeing more — more points
that are simultaneously well-scored AND exactly visible — and must be
fooled less by occluded points it counted as seen.

Scene: a wide occluder slab close to the camera (outside the scoring
distance band, but blocking), a dense target cluster straight behind it,
and a smaller unoccluded cluster off to the side. The occlusion-blind
loss stares through the slab at the dense cluster; the soft-HPR loss
discounts it and re-aims. Measured (CPU, seeds fixed): blind ends with
~87 truly-visible / ~3172 occluded-but-counted, aware with ~436 / ~1581.
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from trajectory_optimization_tpu.models.pose import (
    PoseProblem,
    init_pose_params,
    pose_forward,
)
from trajectory_optimization_tpu.ops.hpr import hpr_mask_exact
from trajectory_optimization_tpu.ops.scores import (
    camera_planes,
    scores_from_planes,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))
from occlusion_outcome_demo import occluded_scene  # single scene source

W_, H_ = 64.0, 48.0
K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]], np.float32)
BAND = dict(min_dist=3.0, max_dist=8.0)


def optimize_pose(pts, soft_hpr, n_steps=200):
    prob = PoseProblem(img_width=W_, img_height=H_, soft_hpr=soft_hpr, **BAND)
    P = jnp.asarray(pts)
    Kj = jnp.asarray(K)
    params = init_pose_params(np.zeros((1, 3), np.float32),
                              np.array([[1.0, 0, 0, 0]], np.float32))
    tx = optax.adam(0.02)
    st = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: pose_forward(q, P, Kj, prob)[0])(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(n_steps):
        params, st = step(params, st)
    return params


def referee_pose(pts, params, obs_thresh=0.05):
    """(truly_visible, occluded_but_counted) at the final pose, judged by
    EXACT Qhull HPR on the camera-frame cloud — the referee neither
    optimizer saw."""
    P, Kj = jnp.asarray(pts), jnp.asarray(K)
    cx, cy, cz = camera_planes(P, params["quat"], params["trans"])
    score = np.asarray(scores_from_planes(cx, cy, cz, Kj, W_, H_, **BAND)[0])
    cam = np.stack([np.asarray(cx)[0], np.asarray(cy)[0],
                    np.asarray(cz)[0]], 1)
    exact = hpr_mask_exact(cam)
    obs = score > obs_thresh
    return int((obs & exact).sum()), int((obs & ~exact).sum())


def test_occlusion_aware_pose_beats_blind_under_exact_referee():
    pts = occluded_scene()
    p_blind = optimize_pose(pts, soft_hpr=False)
    p_aware = optimize_pose(pts, soft_hpr=True)
    good_b, fooled_b = referee_pose(pts, p_blind)
    good_a, fooled_a = referee_pose(pts, p_aware)
    # the aware optimum must genuinely see at least 2x more truly-visible
    # points (measured ~5x; margin for optimizer noise) and be fooled less
    assert good_a >= 2 * max(good_b, 1), (good_a, good_b)
    assert fooled_a < fooled_b, (fooled_a, fooled_b)
