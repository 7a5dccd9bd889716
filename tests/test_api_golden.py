"""Facade API tests + golden-number regression on the benchmark workload.

The goldens are float64-oracle values of the reference equations on
cloud/path index 10 (the reference's deterministic benchmark input,
`src/trajectory_optimization_sample.py:72`); they pin the semantics against
accidental drift.
"""
import numpy as np
import pytest

from trajectory_optimization_tpu.api import PoseOptimizer, TrajectoryOptimizer
from trajectory_optimization_tpu.opt.engine import EarlyStop

import oracles
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics


def test_traj_facade_end_to_end(cloud10, path10):
    opt = TrajectoryOptimizer(lr_pose=0.1, lr_quat=0.02)
    res = opt.optimize(cloud10[::4], path10, n_steps=25)
    assert res.poses.shape == path10.shape
    assert res.n_iters == 25
    assert res.visibility_gain > 1.0
    np.testing.assert_allclose(np.linalg.norm(res.quats_wxyz, axis=1), 1.0, atol=1e-6)
    assert res.rewards.shape == (len(cloud10[::4]),)
    assert 0 <= res.rewards.min() and res.rewards.max() <= 1


def test_traj_facade_early_stop_and_warm_start(cloud10, path10):
    opt = TrajectoryOptimizer(lr_pose=0.1, lr_quat=0.02)
    res = opt.optimize(
        cloud10[::8], path10, n_steps=300,
        early_stop=EarlyStop(rewards_th=1.02, smoothness_th=0.5),
    )
    assert res.n_iters < 300
    # warm start from the previous solution: first-step gain ≈ 1
    import jax.numpy as jnp

    warm = {"poses": jnp.asarray(res.poses, jnp.float32),
            "quats": jnp.asarray(res.quats_wxyz, jnp.float32)}
    res2 = opt.optimize(cloud10[::8], path10, n_steps=5, warm_start=warm)
    assert res2.n_iters == 5


def test_pose_facade(cloud10):
    opt = PoseOptimizer(lr_pose=0.02, lr_quat=0.02)
    res = opt.optimize(cloud10[::8], [6.0, 2.0, 0.0], [0.9, 0.1, -0.2, 0.3], n_steps=60)
    assert np.isfinite(res.loss)
    assert res.observations.shape == (len(cloud10[::8]),)
    np.testing.assert_allclose(np.linalg.norm(res.quat_wxyz), 1.0, atol=1e-6)


def test_golden_initial_losses(cloud10, path10):
    """Initial-state loss terms on the exact benchmark workload, from the
    float64 oracle (regression pin; rtol covers f32 evaluation)."""
    intr = default_intrinsics()
    quats = identity_quaternions(len(path10))
    _, terms, rewards = oracles.traj_loss(
        cloud10.astype(np.float64),
        path10.astype(np.float64),
        quats.astype(np.float64),
        path10.astype(np.float64),
        intr.matrix_np(np.float64),
        intr.width,
        intr.height,
        wps_step=2,  # = waypoint_stride(path10, 0.5)
    )
    # goldens (float64 oracle, 2026-08): pin the semantics
    np.testing.assert_allclose(terms["vis"], 1.8899, rtol=2e-3)
    np.testing.assert_allclose(terms["smooth"], 5.0641, rtol=2e-3)
    assert terms["l2"] == 0.0 and terms["length"] == 0.0
    np.testing.assert_allclose(rewards.mean(), 0.52912, rtol=2e-3)

    # and the framework must reproduce them in float32
    from trajectory_optimization_tpu.models.traj import (
        TrajProblem, init_traj_params, traj_forward, waypoint_stride,
    )
    import jax.numpy as jnp

    assert waypoint_stride(path10, 0.5) == 2
    prob = TrajProblem(img_width=intr.width, img_height=intr.height, wps_step=2)
    loss, aux = traj_forward(
        init_traj_params(path10, quats), jnp.asarray(cloud10), intr.matrix(),
        jnp.asarray(path10), jnp.asarray(quats), prob,
    )
    np.testing.assert_allclose(float(aux["loss_vis"]), terms["vis"], rtol=1e-3)
    np.testing.assert_allclose(float(aux["loss_smooth"]), terms["smooth"], rtol=1e-3)
    np.testing.assert_allclose(float(aux["mean_reward"]), rewards.mean(), rtol=1e-3)


def test_golden_pose_initial_loss(cloud10):
    intr = default_intrinsics()
    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    t0 = np.array([6.0, 2.0, 0.0])
    loss, obs = oracles.pose_loss(
        cloud10.astype(np.float64), q0, t0, intr.matrix_np(np.float64),
        intr.width, intr.height,
    )
    # golden (float64 oracle): total visibility score of the start pose
    np.testing.assert_allclose(obs.sum(), 1857.20, rtol=2e-3)

    from trajectory_optimization_tpu.models.pose import PoseProblem, init_pose_params, pose_forward
    import jax.numpy as jnp

    prob = PoseProblem(img_width=intr.width, img_height=intr.height)
    l32, aux = pose_forward(
        init_pose_params(t0[None], q0[None]), jnp.asarray(cloud10), intr.matrix(), prob
    )
    np.testing.assert_allclose(float(l32), loss, rtol=1e-3)
