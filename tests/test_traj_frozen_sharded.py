"""Frozen-routing occlusion-aware trajectory step on a ('wps','pts') mesh.

The sharded frozen plan (parallel.traj_frozen_sharded) must reproduce the
single-chip frozen loss (models.traj_frozen) — and hence, at a refresh, the
per-step-routed ``traj_forward(soft_hpr=True, soft_hpr_dense_max=0)`` — with
queries partitioned across point shards, coverers duplicated from the full
cloud, and waypoints padded with inactive dummies (reference context: the
sequential per-waypoint loop `src/model.py:210-217` and the HPR TODO
`src/tools.py:56-85` have no multi-device analogue at all).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    init_traj_params,
    traj_forward,
)
from trajectory_optimization_tpu.models.traj_frozen import (
    FrozenPlanConfig,
    FrozenTrajOptimizer,
    build_traj_plan,
    traj_forward_frozen,
)
from trajectory_optimization_tpu.opt.engine import OptimizerConfig
from trajectory_optimization_tpu.parallel.traj_frozen_sharded import (
    FrozenShardedTrajOptimizer,
    build_frozen_sharded_plan,
    traj_frozen_loss_sharded,
)
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics


def _mesh(shape):
    return Mesh(np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape),
                ("wps", "pts"))


@pytest.fixture
def scene():
    rng = np.random.default_rng(0)
    n = 4096
    pts = (rng.normal(size=(n, 3)) * [6, 6, 2] + [5, 0, 1]).astype(np.float32)
    w = 4
    t = np.linspace(0, 1, w, dtype=np.float32)
    poses0 = np.stack([t * 4, t * 1.5, 0.5 + 0 * t], axis=1)
    quats0 = identity_quaternions(w)
    intr = default_intrinsics()
    problem = TrajProblem(
        img_width=intr.width, img_height=intr.height, wps_step=1,
        soft_hpr=True, soft_hpr_dense_max=0, hpr_cap=256)
    return pts, poses0, quats0, intr.matrix(), problem


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_frozen_matches_single_chip(scene, mesh_shape):
    """Loss and rewards match the single-chip frozen step bit-for-bit at
    this scale (the query partition is exact, coverer bands per shard are
    supersets of every owned query's relevant set); gradients to f32
    tolerance. Transitively this is parity with the per-step-routed kernel
    at a refresh (test_traj_frozen pins that leg)."""
    pts, poses0, quats0, K, problem = scene
    params = init_traj_params(poses0, quats0)
    P, p0, q0 = jnp.asarray(pts), jnp.asarray(poses0), jnp.asarray(quats0)

    plan1_np, meta1 = build_traj_plan(pts, None, poses0, quats0, K, problem)
    plan1 = {k: jnp.asarray(v) for k, v in plan1_np.items()
             if not k.startswith("_")}
    (l1, aux1), g1 = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen(p, plan1, meta1, P, K, p0, q0, problem),
        has_aux=True))(params)

    mesh = _mesh(mesh_shape)
    plan2_np, meta2 = build_frozen_sharded_plan(
        pts, None, poses0, quats0, K, problem,
        d_wps=mesh_shape[0], d_pts=mesh_shape[1])
    assert meta2.n_points == len(pts) // mesh_shape[1]
    plan2 = {k: jnp.asarray(v) for k, v in plan2_np.items()}
    valid = jnp.ones(len(pts), jnp.float32)
    (l2, aux2), g2 = jax.jit(jax.value_and_grad(
        lambda p: traj_frozen_loss_sharded(
            mesh, p, plan2, meta2, P, valid, jnp.asarray(K), p0, problem),
        has_aux=True))(params)

    assert abs(float(l2) - float(l1)) / abs(float(l1)) < 1e-6
    d = np.abs(np.asarray(aux1["rewards"]) - np.asarray(aux2["rewards"]))
    assert d.max() < 1e-6, d.max()
    for k in ("poses", "quats"):
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 1e-4, (k, rel)


def test_sharded_frozen_matches_per_step_routing(scene):
    """Direct leg to the per-step-routed kernel: at a refresh the sharded
    frozen loss matches traj_forward(soft_hpr=True) to gate tolerance."""
    pts, poses0, quats0, K, problem = scene
    params = init_traj_params(poses0, quats0)
    P, p0, q0 = jnp.asarray(pts), jnp.asarray(poses0), jnp.asarray(quats0)

    (l_ref, aux_ref) = jax.jit(
        lambda p: traj_forward(p, P, K, p0, q0, problem))(params)

    mesh = _mesh((2, 4))
    plan_np, meta = build_frozen_sharded_plan(
        pts, None, poses0, quats0, K, problem, d_wps=2, d_pts=4)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()}
    valid = jnp.ones(len(pts), jnp.float32)
    l_sh, aux_sh = jax.jit(
        lambda p: traj_frozen_loss_sharded(
            mesh, p, plan, meta, P, valid, jnp.asarray(K), p0, problem))(params)

    assert abs(float(l_sh) - float(l_ref)) / abs(float(l_ref)) < 1e-5
    # f32 reduction-order noise: the sharded leg sums log-odds through a
    # psum over 'wps' and all_gather'd min/max, a different summation order
    # than the single-chip kernel (the frozen-vs-frozen leg above is
    # bit-exact; this cross leg is not)
    d = np.abs(np.asarray(aux_ref["rewards"]) - np.asarray(aux_sh["rewards"]))
    assert d.max() < 5e-5, d.max()


def test_sharded_frozen_runner_padding_and_valid(scene):
    """The runner on a 2x4 mesh with an ODD waypoint count (pads a dummy
    onto the wps axis) and a valid-masked padded cloud tracks the
    single-chip frozen runner step for step; async refresh stays within
    the documented drift bound."""
    pts, poses0, quats0, K, problem = scene
    n = len(pts)
    w = 5
    t = np.linspace(0, 1, w, dtype=np.float32)
    poses0 = np.stack([t * 4, t * 1.5, 0.5 + 0 * t], axis=1)
    quats0 = identity_quaternions(w)
    pts = pts.copy()
    pts[-512:] = 1e6  # padding rows
    valid = np.ones(n, np.float32)
    valid[-512:] = 0.0

    opt_cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    pcfg = FrozenPlanConfig(refresh_every=4, async_refresh=False)

    ref = FrozenTrajOptimizer(pts, K, poses0, quats0, problem, opt_cfg,
                              pcfg, valid=valid)
    p_ref, losses_ref = ref.run(init_traj_params(poses0, quats0), 12)

    mesh = _mesh((2, 4))
    sh = FrozenShardedTrajOptimizer(mesh, pts, K, poses0, quats0, problem,
                                    opt_cfg, pcfg, valid=valid)
    p_sh, losses_sh = sh.run(init_traj_params(poses0, quats0), 12)
    dev = max(abs(a - b) / abs(a) for a, b in zip(losses_ref, losses_sh))
    assert dev < 1e-3, (dev, losses_ref, losses_sh)
    pd = np.linalg.norm(np.asarray(p_sh["poses"]) - np.asarray(p_ref["poses"]))
    assert pd < 0.01, pd

    # async refresh (production default): plans lag one boundary
    sh2 = FrozenShardedTrajOptimizer(
        mesh, pts, K, poses0, quats0, problem, opt_cfg,
        FrozenPlanConfig(refresh_every=4, async_refresh=True), valid=valid)
    p2, losses2 = sh2.run(init_traj_params(poses0, quats0), 12)
    sh2.close()
    dev = max(abs(a - b) / abs(a) for a, b in zip(losses_ref, losses2))
    assert dev < 2e-2, dev
