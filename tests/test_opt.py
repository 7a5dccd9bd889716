import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.models.pose import PoseProblem, init_pose_params, pose_forward
from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    init_traj_params,
    traj_forward,
    waypoint_stride,
)
from trajectory_optimization_tpu.opt.engine import (
    EarlyStop,
    OptimizerConfig,
    exponential_every,
    optimize,
    optimize_with_history,
)
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

INTR = default_intrinsics()


def test_exponential_every_matches_torch_schedule():
    # torch: scheduler.step() after optimizer.step() on iterations {0, k, 2k, ...}
    sched = exponential_every(0.1, 0.9, 40)
    lrs = [float(sched(i)) for i in [0, 1, 40, 41, 80, 81]]
    np.testing.assert_allclose(
        lrs, [0.1, 0.1 * 0.9, 0.1 * 0.9, 0.1 * 0.81, 0.1 * 0.81, 0.1 * 0.9 ** 3], rtol=1e-5
    )


def test_adam_update_matches_torch_adam():
    torch = pytest.importorskip("torch")
    # a tiny quadratic in both frameworks; identical trajectories expected
    w0 = np.array([[1.0, -2.0, 3.0]], dtype=np.float32)

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([wt], lr=0.1)
    for _ in range(25):
        opt.zero_grad()
        loss = (wt ** 2).sum()
        loss.backward()
        opt.step()

    # ours: reuse the engine with a dummy two-group pytree
    params = {"poses": jnp.asarray(w0), "quats": jnp.zeros((1, 4))}

    def loss_fn(p):
        return jnp.sum(p["poses"] ** 2), {"mean_reward": jnp.float32(1.0), "loss_smooth": jnp.float32(1.0)}

    cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.0)
    out, n, _ = optimize(loss_fn, params, cfg, 25)
    assert n == 25
    # torch computes sqrt(v)/sqrt(1-b2^t), optax sqrt(v/(1-b2^t)) — same math,
    # different f32 rounding, ~1e-4 drift over 25 steps.
    np.testing.assert_allclose(np.asarray(out["poses"]), wt.detach().numpy(), atol=5e-4)


def _traj_loss_fn(pts, path10, quats, prob):
    pts = jnp.asarray(pts)
    p0 = jnp.asarray(path10)
    q0 = jnp.asarray(quats)
    K = INTR.matrix()

    def loss_fn(params):
        return traj_forward(params, pts, K, p0, q0, prob)

    return loss_fn


def test_traj_optimization_improves_visibility(cloud10, path10):
    pts = cloud10[::4]  # 10k pts for speed on CPU
    quats = identity_quaternions(len(path10))
    step = waypoint_stride(path10, 0.5)
    prob = TrajProblem(img_width=INTR.width, img_height=INTR.height, wps_step=step)
    loss_fn = _traj_loss_fn(pts, path10, quats, prob)
    params = init_traj_params(path10, quats)

    _, aux0 = loss_fn(params)
    cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    out, hist = optimize_with_history(loss_fn, params, cfg, 30)
    _, aux1 = loss_fn(out)
    gain = float(aux1["mean_reward"]) / float(aux0["mean_reward"])
    assert gain > 1.05, f"visibility gain {gain} too small"
    assert hist["loss"][-1] < hist["loss"][0]


def test_early_stop_fires(cloud10, path10):
    pts = cloud10[::8]
    quats = identity_quaternions(len(path10))
    step = waypoint_stride(path10, 0.5)
    prob = TrajProblem(img_width=INTR.width, img_height=INTR.height, wps_step=step)
    loss_fn = _traj_loss_fn(pts, path10, quats, prob)
    params = init_traj_params(path10, quats)
    cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    # loose thresholds: must stop before the full budget
    out, n, _ = optimize(
        loss_fn, params, cfg, 200, early_stop=EarlyStop(rewards_th=1.02, smoothness_th=0.5)
    )
    assert n < 200


def test_pose_optimization_converges(cloud10):
    pts = jnp.asarray(cloud10[::8])
    prob = PoseProblem(img_width=INTR.width, img_height=INTR.height)
    params = init_pose_params(
        np.array([[6.0, 2.0, 0.0]], dtype=np.float32),
        np.array([[0.7, 0.1, 0.5, -0.2]], dtype=np.float32),
    )
    K = INTR.matrix()

    def loss_fn(p):
        loss, aux = pose_forward(p, pts, K, prob)
        return loss, {
            "mean_reward": jnp.mean(aux["observations"]),
            "loss_smooth": jnp.float32(1.0),
            **aux,
        }

    loss0, _ = loss_fn(params)
    cfg = OptimizerConfig(lr_pose=0.02, lr_quat=0.02)
    out, n, loss = optimize(
        loss_fn, params, cfg, 100, pose_key="trans", quat_key="quat"
    )
    assert n == 100
    assert loss < float(loss0) * 0.9, f"loss {loss} vs initial {float(loss0)}"
