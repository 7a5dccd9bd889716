"""Frozen-routing occlusion-aware trajectory loss (models.traj_frozen).

The frozen plan must reproduce the per-step-routed kernel
(``traj_forward(soft_hpr=True, soft_hpr_dense_max=0)``) at a refresh point
— same formula, same bin membership, same coverer truncation — up to the
gate threshold (points with negligible score are excluded outright), and
track its optimization path between refreshes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    init_traj_params,
    traj_forward,
)
from trajectory_optimization_tpu.models.traj_frozen import (
    FrozenPlanConfig,
    FrozenTrajOptimizer,
    build_traj_plan,
    perm_apply,
    traj_forward_frozen,
)
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics


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


def test_perm_apply_roundtrip_and_grad():
    """perm_apply applies the stored permutation (fwd_key[j] = destination
    of slot j); with bwd_key = the inverse permutation its VJP matches the
    numeric gradient, including slots whose destination is sliced off."""
    rng = np.random.default_rng(1)
    m, n_out, n_ext = 6, 9, 12
    dest = rng.permutation(n_ext)  # slot j -> destination dest[j]
    inv = np.argsort(dest)         # destination i -> slot inv[i]
    x_np = rng.normal(size=(2, m)).astype(np.float32)
    x = jnp.asarray(x_np)
    fk = jnp.asarray(np.broadcast_to(dest, (2, n_ext)))
    bk = jnp.asarray(np.broadcast_to(inv, (2, n_ext)))

    out = perm_apply(fk, bk, x, fill=7.5, n_out=n_out)
    full = np.full((2, n_ext), 7.5, np.float32)
    for j in range(m):
        full[:, dest[j]] = x_np[:, j]
    np.testing.assert_allclose(np.asarray(out), full[:, :n_out], atol=0)

    def f(xx):
        return jnp.sum(perm_apply(fk, bk, xx, 7.5, n_out) ** 2)

    g = jax.grad(f)(x)
    eps = 1e-2
    for j in range(m):
        xp = x_np.copy(); xp[0, j] += eps
        xm = x_np.copy(); xm[0, j] -= eps
        num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(float(g[0, j]), num, rtol=1e-2, atol=1e-3)


def test_frozen_matches_per_step_routing_at_refresh(scene):
    """At a refresh (zero drift) the frozen loss/rewards match the
    per-step-routed binned kernel bit-for-bit at this scale, gradients to
    f32 tolerance (VERDICT r3 #1 'pinned loss/grad tolerance')."""
    pts, poses0, quats0, K, problem = scene
    params = init_traj_params(poses0, quats0)
    P = jnp.asarray(pts)
    p0, q0 = jnp.asarray(poses0), jnp.asarray(quats0)

    plan_np, meta = build_traj_plan(pts, None, poses0, quats0, K, problem)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()}

    (l_ref, aux_ref), g_ref = jax.jit(jax.value_and_grad(
        lambda p: traj_forward(p, P, K, p0, q0, problem),
        has_aux=True))(params)
    (l_fr, aux_fr), g_fr = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen(p, plan, meta, P, K, p0, q0, problem),
        has_aux=True))(params)

    assert abs(float(l_fr) - float(l_ref)) / abs(float(l_ref)) < 1e-5
    d = np.abs(np.asarray(aux_ref["rewards"]) - np.asarray(aux_fr["rewards"]))
    assert d.max() < 1e-6, d.max()
    for k in ("poses", "quats"):
        a, b = np.asarray(g_ref[k]), np.asarray(g_fr[k])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 1e-4, (k, rel)


def test_frozen_runner_tracks_per_step_routing(scene):
    """A short Adam run through FrozenTrajOptimizer stays within tolerance
    of the per-step-routed optimization path at the default refresh cadence
    (drift between refreshes only perturbs the PAIRING, which the safety
    slack absorbs)."""
    import optax

    from trajectory_optimization_tpu.opt.engine import (
        OptimizerConfig, make_optimizer)

    pts, poses0, quats0, K, problem = scene
    opt_cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    P = jnp.asarray(pts)
    p0, q0 = jnp.asarray(poses0), jnp.asarray(quats0)

    tx = make_optimizer(opt_cfg)

    @jax.jit
    def ref_step(p, s):
        (l, _), g = jax.value_and_grad(
            lambda q: traj_forward(q, P, K, p0, q0, problem),
            has_aux=True)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    pr = init_traj_params(poses0, quats0)
    s = tx.init(pr)
    ref_losses = []
    for _ in range(12):
        pr, s, l = ref_step(pr, s)
        ref_losses.append(float(l))

    # sync refresh: the fidelity reference — plans always built from the
    # CURRENT params, so only intra-window drift separates the paths
    opt = FrozenTrajOptimizer(pts, K, poses0, quats0, problem, opt_cfg,
                              FrozenPlanConfig(refresh_every=4,
                                               async_refresh=False))
    pf, losses = opt.run(init_traj_params(poses0, quats0), 12)
    dev = max(abs(a - b) / abs(a) for a, b in zip(ref_losses, losses))
    assert dev < 1e-3, (dev, ref_losses, losses)
    pd = np.linalg.norm(np.asarray(pf["poses"]) - np.asarray(pr["poses"]))
    assert pd < 0.01, pd

    # async refresh (the production default): plans lag one boundary, so
    # the path deviates more — bound it loosely, and the LOSS trajectory
    # must still track
    opt = FrozenTrajOptimizer(pts, K, poses0, quats0, problem, opt_cfg,
                              FrozenPlanConfig(refresh_every=4,
                                               async_refresh=True))
    pf, losses = opt.run(init_traj_params(poses0, quats0), 12)
    opt.close()
    dev = max(abs(a - b) / abs(a) for a, b in zip(ref_losses, losses))
    assert dev < 2e-2, (dev, ref_losses, losses)
    pd = np.linalg.norm(np.asarray(pf["poses"]) - np.asarray(pr["poses"]))
    assert pd < 0.3, pd


def test_frozen_valid_mask_and_padding(scene):
    """Padded points must contribute nothing: same plan semantics as the
    kernel's valid convention."""
    pts, poses0, quats0, K, problem = scene
    n = len(pts)
    pad = 512
    pts_p = np.concatenate(
        [pts, np.full((pad, 3), 1e6, np.float32)], axis=0)
    valid = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])

    params = init_traj_params(poses0, quats0)
    P = jnp.asarray(pts_p)
    p0, q0 = jnp.asarray(poses0), jnp.asarray(quats0)
    plan_np, meta = build_traj_plan(pts_p, valid, poses0, quats0, K, problem)
    # no padded point may enter any layout
    assert (plan_np["_q_id"] < n).all()
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if not k.startswith("_")}
    loss_p, aux_p = jax.jit(
        lambda p: traj_forward_frozen(p, plan, meta, P, K, p0, q0, problem,
                                      valid=jnp.asarray(valid)))(params)
    r = np.asarray(aux_p["rewards"])
    np.testing.assert_allclose(r[n:], 0.5, atol=1e-6)  # σ(0) for padding

    # and the loss matches the unpadded scene
    plan2_np, meta2 = build_traj_plan(pts, None, poses0, quats0, K, problem)
    plan2 = {k: jnp.asarray(v) for k, v in plan2_np.items()}
    loss_u, _ = jax.jit(
        lambda p: traj_forward_frozen(p, plan2, meta2, jnp.asarray(pts), K,
                                      p0, q0, problem))(params)
    np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)


def test_frozen_wps_and_pose_variants(scene):
    """The waypoints-mode and pose-mode frozen runners: parity with their
    per-step-routed single-chip losses at a refresh, and a short run that
    reduces the loss."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params, pose_forward,
    )
    from trajectory_optimization_tpu.models.traj_frozen import (
        FrozenPoseOptimizer, FrozenWpsOptimizer,
    )
    from trajectory_optimization_tpu.models.wps_opt import (
        WpsOptProblem, init_wps_params, wps_forward,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig

    pts, poses0, quats0, _, _ = scene
    # intrinsics consistent with the claimed 64x48 image (the scene
    # fixture's full-resolution K would put the principal point outside
    # this image — a degenerate config that tests nothing real)
    K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]], np.float32)
    P = jnp.asarray(pts)
    opt_cfg = OptimizerConfig(lr_pose=0.05, lr_quat=0.05)

    # --- waypoints mode -------------------------------------------------
    wp_prob = WpsOptProblem(
        img_width=64.0, img_height=48.0, soft_hpr=True,
        soft_hpr_dense_max=0, hpr_cap=256)
    params, frozen = init_wps_params(poses0, quats0)
    opt = FrozenWpsOptimizer(pts, K, frozen, wp_prob, opt_cfg,
                             FrozenPlanConfig(async_refresh=False))
    st = opt.init(params)
    p1, st, l0, aux = opt.step(params, st)
    # parity at the refresh: frozen loss == per-step-routed wps_forward
    (l_ref, _), _ = jax.jit(jax.value_and_grad(
        lambda p: wps_forward(p, frozen, P, jnp.asarray(K), wp_prob),
        has_aux=True))(params)
    assert abs(float(l0) - float(l_ref)) / abs(float(l_ref)) < 1e-4
    for _ in range(7):
        p1, st, loss, aux = opt.step(p1, st)
    assert float(loss) < float(l0), (loss, l0)
    opt.close()

    # --- pose mode ------------------------------------------------------
    po_prob = PoseProblem(
        img_width=64.0, img_height=48.0, soft_hpr=True,
        soft_hpr_dense_max=0, hpr_cap=256)
    params = init_pose_params(np.array([[1.0, 0.5, 0.4]], np.float32),
                              np.array([[1.0, 0, 0, 0]], np.float32))
    opt = FrozenPoseOptimizer(pts, K, po_prob, opt_cfg,
                              FrozenPlanConfig(async_refresh=False))
    st = opt.init(params)
    p1, st, l0, _ = opt.step(params, st)
    (l_ref, _), _ = jax.jit(jax.value_and_grad(
        lambda p: pose_forward(p, P, jnp.asarray(K), po_prob),
        has_aux=True))(params)
    assert abs(float(l0) - float(l_ref)) / abs(float(l_ref)) < 1e-4
    for _ in range(7):
        p1, st, loss, _ = opt.step(p1, st)
    assert float(loss) < float(l0), (loss, l0)
    opt.close()


def test_frozen_gradient_finite_at_sensor_origin(scene):
    """Real scans contain points EXACTLY at the sensor origin (cloud-10
    has one per scan pose — the round-3 NaN regression); the frozen
    kernel's safe_norm path must keep the whole gradient finite when a
    waypoint coincides with a cloud point."""
    pts, poses0, quats0, K, problem = scene
    pts = pts.copy()
    pts[0] = poses0[1]  # a point exactly at waypoint 1
    params = init_traj_params(poses0, quats0)
    P = jnp.asarray(pts)
    p0, q0 = jnp.asarray(poses0), jnp.asarray(quats0)
    plan_np, meta = build_traj_plan(pts, None, poses0, quats0, K, problem)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if not k.startswith("_")}
    (_, _), g = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen(p, plan, meta, P, K, p0, q0, problem),
        has_aux=True))(params)
    for k in ("poses", "quats"):
        assert np.isfinite(np.asarray(g[k])).all(), k


def test_tile_ladder_and_prewarm():
    """Geometric tile-ladder rounding (round-5 recompile-stall fix) and the
    background pre-warm: after the first refresh the runner compiles the
    three neighbor rungs (T↑, TB↑, both↑) on a daemon thread, so active-set
    growth onto the next rung finds a warm program instead of a 15-25 s
    blocking compile."""
    import dataclasses
    import time as _t

    from trajectory_optimization_tpu.models.traj_frozen import (
        _ladder_ceil,
        _ladder_next,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig
    from trajectory_optimization_tpu.utils.intrinsics import (
        default_intrinsics,
    )

    # ladder math: multiples of base, strictly increasing, ≥ ratio apart
    assert _ladder_ceil(1, 8, 1.15) == 8
    assert _ladder_ceil(16, 8, 1.15) == 16
    assert _ladder_ceil(17, 8, 1.15) == 24
    assert _ladder_ceil(100, 8, 1.0) == 104  # ratio 1 = plain ceil-to-base
    v = 8
    for _ in range(12):
        nv = _ladder_next(v, 8, 1.15)
        assert nv > v and nv % 8 == 0 and nv <= max(v + 8, int(v * 1.3))
        v = nv

    # prewarm on a tiny scene (fast compiles)
    rng = np.random.default_rng(2)
    pts = (rng.normal(size=(512, 3)) * [4, 4, 1] + [4, 0, 1]).astype(
        np.float32)
    poses0 = np.asarray([[0.0, 0.0, 0.5], [1.0, 0.4, 0.5]], np.float32)
    quats0 = identity_quaternions(2)
    intr = default_intrinsics()
    problem = TrajProblem(
        img_width=intr.width, img_height=intr.height, wps_step=1,
        soft_hpr=True, soft_hpr_dense_max=0, hpr_cap=64)
    opt = FrozenTrajOptimizer(
        pts, intr.matrix(), poses0, quats0, problem,
        OptimizerConfig(lr_pose=0.1, lr_quat=0.02),
        FrozenPlanConfig(refresh_every=4, async_refresh=False, prewarm=True))
    params = init_traj_params(poses0, quats0)
    st = opt.init(params)
    params, st, _, _ = opt.step(params, st)
    meta = opt._meta
    deadline = _t.time() + 180
    while _t.time() < deadline and opt._warming:
        _t.sleep(0.2)
    assert not opt._warming
    r = opt.plan_cfg.tile_ladder_ratio
    nt = _ladder_next(meta.tiles, opt.plan_cfg.tile_round, r)
    ntb = _ladder_next(meta.t_big, 4, r)
    for m in (dataclasses.replace(meta, tiles=nt, t_big=ntb),
              dataclasses.replace(meta, tiles=nt),
              dataclasses.replace(meta, t_big=ntb)):
        assert m in opt._step_cache, m
    assert opt.stats["prewarms"] == 3
    # a forced jump onto the warmed rung runs without tracing anew
    opt._t_floor = nt
    opt._tb_floor = ntb
    opt.reset()
    p2, st2, loss, _ = opt.step(params, st)
    assert opt._meta.tiles == nt and opt._meta.t_big == ntb
    assert np.isfinite(float(loss))
    opt.close()


def test_frozen_big_bin_stratified_parity():
    """Over-full bins (count ≫ cap): the frozen plan's stratified ext
    coverers must track the per-step kernel's stratified layout. Per-point
    visibilities near the log-odds clip amplify tail differences (CLAUDE.md
    numerics note), so the pin is loss-level plus bulk gradients."""
    from trajectory_optimization_tpu.utils.intrinsics import (
        default_intrinsics,
    )

    rng = np.random.default_rng(0)
    n = 6144
    pts = (rng.normal(size=(n, 3)) * [2, 2, 0.5] + [6, 0, 1]).astype(
        np.float32)
    t = np.linspace(0, 1, 3, dtype=np.float32)
    poses0 = np.stack([t * 2, t * 1.0, 0.5 + 0 * t], axis=1)
    quats0 = identity_quaternions(3)
    intr = default_intrinsics()
    problem = TrajProblem(
        img_width=intr.width, img_height=intr.height, wps_step=1,
        soft_hpr=True, soft_hpr_dense_max=0, hpr_cap=64)
    K = intr.matrix()
    params = init_traj_params(poses0, quats0)
    P, p0, q0 = jnp.asarray(pts), jnp.asarray(poses0), jnp.asarray(quats0)

    plan_np, meta = build_traj_plan(pts, None, poses0, quats0, K, problem)
    assert (plan_np["c_sel"] >= 0).sum() > 100  # really exercises ext tiles
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if not k.startswith("_")}
    (l_ref, _), g_ref = jax.jit(jax.value_and_grad(
        lambda p: traj_forward(p, P, K, p0, q0, problem),
        has_aux=True))(params)
    (l_fr, _), g_fr = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen(p, plan, meta, P, K, p0, q0, problem),
        has_aux=True))(params)
    assert abs(float(l_fr) - float(l_ref)) / abs(float(l_ref)) < 1e-4
    a, b = np.asarray(g_ref["poses"]), np.asarray(g_fr["poses"])
    assert np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30) < 0.02
    # quats gradients are small in norm here; the relnorm is tail-dominated
    a, b = np.asarray(g_ref["quats"]), np.asarray(g_fr["quats"])
    assert np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30) < 0.15


def test_sparse_mean_matches_embed_path(scene):
    """traj_forward_frozen_mean (the production training step's sparse
    criterion tail: query-row scores, host-grouped cross-waypoint fusion,
    closed-form σ(0)/2 for untouched points) must match the embedding path
    to f32 summation-order tolerance — loss, mean_reward and gradients —
    including under a valid mask."""
    from trajectory_optimization_tpu.models.traj_frozen import (
        traj_forward_frozen_mean,
    )

    pts, poses0, quats0, K, problem = scene
    params = init_traj_params(poses0, quats0)
    P, p0, q0 = jnp.asarray(pts), jnp.asarray(poses0), jnp.asarray(quats0)
    plan_np, meta = build_traj_plan(pts, None, poses0, quats0, K, problem)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()
            if not k.startswith("_")}
    (l_e, aux_e), g_e = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen(p, plan, meta, P, K, p0, q0, problem),
        has_aux=True))(params)
    (l_s, aux_s), g_s = jax.jit(jax.value_and_grad(
        lambda p: traj_forward_frozen_mean(
            p, plan, meta, P, K, p0, q0, problem),
        has_aux=True))(params)
    assert abs(float(l_s) - float(l_e)) / abs(float(l_e)) < 1e-6
    assert abs(float(aux_s["mean_reward"]) - float(aux_e["mean_reward"])) < 1e-6
    for k in ("poses", "quats"):
        a, b = np.asarray(g_e[k]), np.asarray(g_s[k])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 1e-4, (k, rel)

    # valid mask: untouched-but-invalid points must not enter the mean
    n = len(pts)
    valid = np.ones(n, np.float32)
    valid[-500:] = 0.0
    pts2 = pts.copy()
    pts2[-500:] = 1e6
    plan2_np, meta2 = build_traj_plan(pts2, valid, poses0, quats0, K,
                                      problem)
    plan2 = {k: jnp.asarray(v) for k, v in plan2_np.items()
             if not k.startswith("_")}
    l2e, _ = jax.jit(lambda p: traj_forward_frozen(
        p, plan2, meta2, jnp.asarray(pts2), K, p0, q0, problem,
        valid=jnp.asarray(valid)))(params)
    l2s, _ = jax.jit(lambda p: traj_forward_frozen_mean(
        p, plan2, meta2, jnp.asarray(pts2), K, p0, q0, problem,
        valid=jnp.asarray(valid)))(params)
    assert abs(float(l2s) - float(l2e)) / abs(float(l2e)) < 1e-6
