"""Multi-chip occlusion-aware TRAJECTORY step vs the single-chip loss.

Runs on the 8-virtual-device CPU mesh (conftest). The sharded loss forces
the binned HPR kernel (the dense form cannot be point-sharded), so the
single-chip reference pins ``soft_hpr_dense_max=0``; agreement is then up
to quantized-key candidate ties (see parallel.hpr_sharded), the same
tolerance class as the sharded-HPR kernel tests.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    init_traj_params,
    traj_forward,
)
from trajectory_optimization_tpu.opt.engine import OptimizerConfig
from trajectory_optimization_tpu.parallel.mesh import make_mesh
from trajectory_optimization_tpu.parallel.traj_sharded import (
    make_sharded_traj_step,
    traj_soft_hpr_loss_sharded,
)
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics


N_PTS = 512
N_WPS = 13  # stride 2 → 7 selected → pads to 8 on a 4-shard waypoint axis


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    pts = (rng.normal(size=(N_PTS, 3)) * [6, 6, 2] + [5, 0, 1]).astype(
        np.float32)
    t = np.linspace(0, 1, N_WPS, dtype=np.float32)
    poses0 = np.stack([10 * t, 4 * np.sin(3 * t), 0.3 * t], axis=1)
    quats0 = identity_quaternions(N_WPS)
    intr = default_intrinsics()
    problem = TrajProblem(
        img_width=intr.width, img_height=intr.height,
        min_dist=1.0, max_dist=8.0, wps_step=2,
        soft_hpr=True, soft_hpr_dense_max=0,  # force binned = the sharded tier
    )
    params = init_traj_params(poses0, quats0)
    return (params, jnp.asarray(pts), intr.matrix(),
            jnp.asarray(poses0), jnp.asarray(quats0), problem)


def _single_chip(setup):
    params, P, K, p0, q0, problem = setup

    def loss(params):
        return traj_forward(params, P, K, p0, q0, problem)[0]

    return jax.value_and_grad(loss)(params)


def _relnorm(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.mark.parametrize("wps", [1, 4])
def test_loss_grad_parity(setup, wps):
    """1D point sharding (wps=1) and the full 2D mesh (wps=4, pts=2) both
    reproduce the single-chip occlusion-aware loss and its gradients."""
    params, P, K, p0, q0, problem = setup
    mesh = make_mesh(8, wps=wps)
    v_ref, g_ref = _single_chip(setup)

    def loss_sh(params):
        valid = jnp.ones((P.shape[0],), jnp.float32)
        return traj_soft_hpr_loss_sharded(
            mesh, params, P, valid, K, p0, problem)[0]

    v_sh, g_sh = jax.jit(jax.value_and_grad(loss_sh))(params)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4), (v_sh, v_ref)
    for k in ("poses", "quats"):
        rel = _relnorm(g_sh[k], g_ref[k])
        assert rel < 5e-3, (k, rel)


def test_sharded_step_optimizes(setup):
    """Twelve full steps on the 2D mesh: finite, the loss drops below its
    starting value, the mean visibility reward rises, and the real
    (non-dummy) waypoints move. (The soft-HPR landscape is rough — the
    loss overshoots for ~5 Adam steps before descending, measured; the
    reward climb is the steadier optimization signal.)"""
    params, P, K, p0, q0, problem = setup
    mesh = make_mesh(8, wps=2)
    cfg = OptimizerConfig(lr_pose=0.05, lr_quat=0.02)
    init_fn, step_fn = make_sharded_traj_step(mesh, problem, cfg)
    valid = jnp.ones((P.shape[0],), jnp.float32)
    params = jax.tree.map(jnp.array, params)  # step_fn donates its inputs
    opt_state = init_fn(params)
    losses, rewards = [], []
    for _ in range(12):
        params, opt_state, loss, scal = step_fn(
            params, opt_state, P, valid, K, p0, q0)
        losses.append(float(loss))
        rewards.append(float(scal["mean_reward"]))
    assert np.isfinite(losses).all(), losses
    assert min(losses[1:]) < losses[0], losses
    assert rewards[-1] > rewards[0] > 0, rewards
    assert not np.allclose(np.asarray(params["poses"]), np.asarray(p0))
    assert np.isfinite(np.asarray(params["poses"])).all()
    assert np.isfinite(np.asarray(params["quats"])).all()


def test_real_cloud_sensor_origin_parity(setup):
    """Real data (cloud-10 + path-10): 16 of the 27 recorded waypoints
    coincide EXACTLY with cloud points, putting points at the camera
    origin where norm gradients are 0/0 — the case that exposed the
    safe_norm NaN (CLAUDE.md round-3). The sharded loss must stay finite
    and match single-chip on this geometry, not just synthetic scenes.

    Shapes mirror the synthetic fixture (512 pts, 13 wps, same problem)
    so the compiled programs come from the cache."""
    from trajectory_optimization_tpu.utils.data import (
        load_path,
        load_point_cloud,
    )

    _, _, K, _, _, problem = setup
    pts = np.asarray(load_point_cloud(
        "data/points/point_cloud_10.npz"), np.float32)
    path = np.asarray(load_path("data/paths/path_poses_10.npz"), np.float32)
    poses0 = path[:N_WPS]
    # subsample to the fixture size, force-including every point that
    # coincides with a selected waypoint (the sensor-origin points)
    d = np.linalg.norm(pts[None] - poses0[:, None], axis=-1)
    coincident = np.unique(d.argmin(axis=1)[d.min(axis=1) == 0.0])
    assert coincident.size >= 5  # the real data really has them
    rest = np.setdiff1d(
        np.linspace(0, len(pts) - 1, N_PTS, dtype=np.int64), coincident)
    sel = np.concatenate([coincident, rest])[:N_PTS]
    P = jnp.asarray(pts[sel])
    quats0 = identity_quaternions(N_WPS)
    params = init_traj_params(poses0, quats0)
    mesh = make_mesh(8, wps=4)
    setup_real = (params, P, K, jnp.asarray(poses0), jnp.asarray(quats0),
                  problem)
    v_ref, g_ref = _single_chip(setup_real)
    assert np.isfinite(float(v_ref))
    for k in ("poses", "quats"):
        assert np.isfinite(np.asarray(g_ref[k])).all(), k

    def loss_sh(params):
        valid = jnp.ones((N_PTS,), jnp.float32)
        return traj_soft_hpr_loss_sharded(
            mesh, params, P, valid, K, jnp.asarray(poses0), problem)[0]

    v_sh, g_sh = jax.jit(jax.value_and_grad(loss_sh))(params)
    assert np.isclose(float(v_sh), float(v_ref), rtol=1e-4), (v_sh, v_ref)
    for k in ("poses", "quats"):
        assert np.isfinite(np.asarray(g_sh[k])).all(), k
        rel = _relnorm(g_sh[k], g_ref[k])
        assert rel < 5e-3, (k, rel)


def test_rejects_non_soft_hpr(setup):
    params, P, K, p0, q0, problem = setup
    import dataclasses

    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="soft_hpr"):
        make_sharded_traj_step(
            mesh, dataclasses.replace(problem, soft_hpr=False),
            OptimizerConfig())


def test_rejects_indivisible_cloud(setup):
    params, P, K, p0, q0, problem = setup
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        traj_soft_hpr_loss_sharded(
            mesh, params, P[:501], jnp.ones((501,), jnp.float32), K, p0,
            problem)


def test_padded_cloud_valid_mask(setup):
    """Padding points (valid=0) contribute nothing: same loss as the
    unpadded cloud on a divisible size."""
    params, P, K, p0, q0, problem = setup
    from trajectory_optimization_tpu.utils.data import pad_points

    mesh = make_mesh(8, wps=2)
    padded, valid = pad_points(np.asarray(P[:448]), target=512)

    @jax.jit
    def loss(pts, val):
        return traj_soft_hpr_loss_sharded(
            mesh, params, pts, val, K, p0, problem)[0]

    l_pad = float(loss(jnp.asarray(padded), jnp.asarray(valid)))
    # reference: the same 448 points, padded only to the shard multiple
    padded2, valid2 = pad_points(np.asarray(P[:448]), target=448)
    l_ref = float(loss(jnp.asarray(padded2), jnp.asarray(valid2)))
    assert np.isclose(l_pad, l_ref, rtol=1e-5), (l_pad, l_ref)
