"""Direct-execution parity vs the ACTUAL reference implementation.

Every other numerical test in this suite pins the JAX kernels against
independently re-derived NumPy f64 oracles (tests/oracles.py). This module is
the stronger statement: it imports and RUNS the reference's own model code
(`/root/reference/src/model.py`) on CPU torch — the torch build baked into
this image — and compares losses, per-term criteria, gradients, and whole
Adam optimization trajectories against this framework.

The only shims injected are the two quaternion helpers the reference pulls
from pytorch3d (`src/model.py:4`), written here from the standard Hamilton
product (pytorch3d semantics: wxyz, apply = q p q⁻¹), plus empty stand-ins
for `rospy` / `tools` whose members the exercised paths never call.

Measured parity on cloud-10 (calibration run, this host):
  * pose loss/grad at random poses: rel ≤ 2e-6;
  * traj loss + all four criterion terms at a generic point: rel ≤ 4e-7,
    grads relnorm ≤ 2e-6;
  * 60-step pose Adam + ExponentialLR(0.95 every N//10) curve: ≤ 1.8e-5;
  * 20-step traj Adam (launch lrs 0.12/0.05) curve from a generic start:
    ≤ 1.4e-5, final poses relnorm 3e-6.

At the EXACT initial path the two implementations intentionally differ in
gradient only (documented in CLAUDE.md / models/traj.py): ‖p₀−p₀⁰‖ and
|len−len⁰| are evaluated at their non-differentiable points, where this
framework takes the zero subgradient (safe_norm) while torch's autograd takes
an arbitrary sign from f32 rounding noise. Values still match exactly; the
curve tests therefore start from a generic perturbed point.

Skipped wholesale when /root/reference is not present.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import optax

from trajectory_optimization_tpu.models.pose import (
    PoseProblem,
    init_pose_params,
    pose_forward,
)
from trajectory_optimization_tpu.models.traj import (
    TrajProblem,
    init_traj_params,
    traj_forward,
    waypoint_stride,
)
from trajectory_optimization_tpu.opt.engine import OptimizerConfig, make_optimizer
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

REF_MODEL = Path("/root/reference/src/model.py")

pytestmark = pytest.mark.skipif(
    not REF_MODEL.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")
F = torch.nn.functional

IMG_W, IMG_H = 1232.0, 1616.0


# ---------------------------------------------------------------------------
# reference loading (pytorch3d quaternion shims from the standard math)
# ---------------------------------------------------------------------------

def _quaternion_raw_multiply(a, b):
    aw, ax, ay, az = torch.unbind(a, -1)
    bw, bx, by, bz = torch.unbind(b, -1)
    return torch.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def _quaternion_invert(q):
    return q * q.new_tensor([1.0, -1.0, -1.0, -1.0])


def _quaternion_apply(q, point):
    zeros = point.new_zeros(point.shape[:-1] + (1,))
    p4 = torch.cat([zeros, point], -1)
    out = _quaternion_raw_multiply(
        _quaternion_raw_multiply(q, p4), _quaternion_invert(q)
    )
    return out[..., 1:]


@pytest.fixture(scope="module")
def ref():
    """The reference src/model.py, imported and executed as-is."""
    shims = {}
    p3d = types.ModuleType("pytorch3d")
    tr = types.ModuleType("pytorch3d.transforms")
    tr.quaternion_invert = _quaternion_invert
    tr.quaternion_apply = _quaternion_apply
    p3d.transforms = tr
    shims["pytorch3d"] = p3d
    shims["pytorch3d.transforms"] = tr
    shims["rospy"] = types.ModuleType("rospy")
    tools = types.ModuleType("tools")  # `from tools import ...` (model.py:5);
    tools.load_intrinsics = None      # neither member is called with hpr=False
    tools.hidden_pts_removal = None
    shims["tools"] = tools
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        spec = importlib.util.spec_from_file_location("_reference_model", REF_MODEL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


# cloud10 / path10 come from conftest.py's session fixtures (which also
# guard against a transposed (3, N) sample layout)


def _K():
    return np.asarray(default_intrinsics().matrix(), np.float32)


def _relnorm(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


CPU = torch.device("cpu")


# ---------------------------------------------------------------------------
# single-evaluation parity
# ---------------------------------------------------------------------------

def test_pose_loss_and_grads_match_reference_execution(ref, cloud10):
    """ModelPose.forward + autograd (`src/model.py:98-127`) vs pose_forward."""
    Kn = _K()
    prob = PoseProblem(img_width=IMG_W, img_height=IMG_H)
    vg = jax.jit(
        jax.value_and_grad(
            lambda p: pose_forward(p, jnp.asarray(cloud10), jnp.asarray(Kn), prob),
            has_aux=True,
        )
    )
    rng = np.random.default_rng(0)
    for _ in range(3):
        t0 = cloud10.mean(0, keepdims=True) + rng.normal(size=(1, 3)).astype(np.float32)
        q0 = rng.normal(size=4).astype(np.float32)
        q0 /= np.linalg.norm(q0)

        model = ref.ModelPose(
            torch.tensor(cloud10), torch.tensor(t0), torch.tensor(q0[None]),
            torch.tensor(Kn), IMG_W, IMG_H, device=CPU,
        )
        loss_t = model()
        loss_t.backward()

        (loss_j, aux), g = vg(init_pose_params(t0, q0[None]))
        assert float(loss_j) == pytest.approx(loss_t.item(), rel=5e-5)
        assert (
            _relnorm(aux["observations"], model.observations.detach().numpy()) < 5e-5
        )
        grad_t = np.concatenate(
            [model.trans.grad.numpy().ravel(), model.quat.grad.numpy().ravel()]
        )
        grad_j = np.concatenate(
            [np.asarray(g["trans"]).ravel(), np.asarray(g["quat"]).ravel()]
        )
        assert _relnorm(grad_j, grad_t) < 1e-4


def test_traj_loss_terms_and_grads_match_reference_execution(ref, cloud10, path10):
    """ModelTraj.forward + criterion (`src/model.py:200-260`) vs traj_forward,
    at a generic (perturbed) parameter point: composite loss, all four loss
    terms, the per-point rewards, and both parameter gradients."""
    Kn = _K()
    quats0 = np.tile(np.array([1, 0, 0, 0], np.float32), (len(path10), 1))
    step = waypoint_stride(path10)

    model = ref.ModelTraj(
        torch.tensor(cloud10), torch.tensor(path10), torch.tensor(quats0),
        torch.tensor(Kn), IMG_W, IMG_H, device=CPU,
    )
    # the reference recomputes the stride from frozen poses0 every forward
    # (`src/model.py:213-215`); ours is hoisted to setup — must agree
    mean_d = (model.poses0[1:] - model.poses0[:-1]).norm(dim=1).mean()
    assert int(0.5 / mean_d) + 1 == step

    rng = np.random.default_rng(7)
    poses = path10 + rng.normal(size=path10.shape).astype(np.float32) * 0.3
    quats = quats0 + rng.normal(size=quats0.shape).astype(np.float32) * 0.05
    model.poses.data = torch.tensor(poses)
    model.quats.data = torch.tensor(quats)
    loss_t = model(vis_wps_dist=0.5)
    loss_t.backward()

    prob = TrajProblem(img_width=IMG_W, img_height=IMG_H, wps_step=step, backend="xla")
    (loss_j, aux), g = jax.jit(
        jax.value_and_grad(
            lambda p: traj_forward(
                p, jnp.asarray(cloud10), jnp.asarray(Kn),
                jnp.asarray(path10), jnp.asarray(quats0), prob,
            ),
            has_aux=True,
        )
    )({"poses": jnp.asarray(poses), "quats": jnp.asarray(quats)})

    assert float(loss_j) == pytest.approx(loss_t.item(), rel=5e-5)
    for ours, theirs in [
        ("loss_vis", "vis"), ("loss_l2", "l2"),
        ("loss_smooth", "smooth"), ("loss_length", "length"),
    ]:
        assert float(aux[ours]) == pytest.approx(
            model.loss[theirs].item(), rel=5e-5, abs=1e-6
        ), ours
    assert _relnorm(aux["rewards"], model.rewards.detach().numpy()) < 5e-5
    assert _relnorm(g["poses"], model.poses.grad.numpy()) < 1e-4
    assert _relnorm(g["quats"], model.quats.grad.numpy()) < 1e-4


def test_traj_values_match_reference_at_exact_init(ref, cloud10, path10):
    """At the un-perturbed initial path the VALUES must still match exactly
    (the documented deviations at this degenerate point are gradient-only:
    safe_norm subgradient, |len−len⁰| sign — models/traj.py docstring)."""
    Kn = _K()
    quats0 = np.tile(np.array([1, 0, 0, 0], np.float32), (len(path10), 1))
    model = ref.ModelTraj(
        torch.tensor(cloud10), torch.tensor(path10), torch.tensor(quats0),
        torch.tensor(Kn), IMG_W, IMG_H, device=CPU,
    )
    loss_t = model(vis_wps_dist=0.5)
    prob = TrajProblem(
        img_width=IMG_W, img_height=IMG_H, wps_step=waypoint_stride(path10),
        backend="xla",
    )
    loss_j, aux = jax.jit(
        lambda p: traj_forward(
            p, jnp.asarray(cloud10), jnp.asarray(Kn),
            jnp.asarray(path10), jnp.asarray(quats0), prob,
        )
    )(init_traj_params(path10, quats0))
    assert float(loss_j) == pytest.approx(loss_t.item(), rel=5e-5)
    assert float(aux["loss_l2"]) == pytest.approx(model.loss["l2"].item(), abs=1e-7)
    # |len−len0| is 0 up to one ulp of rounding on both sides
    assert float(aux["loss_length"]) == pytest.approx(0.0, abs=1e-4)
    assert model.loss["length"].item() == pytest.approx(0.0, abs=1e-4)


# ---------------------------------------------------------------------------
# full optimization-curve parity (torch.optim.Adam vs the optax engine)
# ---------------------------------------------------------------------------

def test_pose_adam_exponential_lr_curve_matches_reference(ref, cloud10):
    """The reference pose sample's loop — Adam two param groups +
    ExponentialLR(0.95) stepped every N//10 iterations after the update
    (`src/pose_optimization_sample.py:76-98`) — reproduced with the actual
    reference model and torch.optim, vs our jitted optax engine. Per-step
    losses must track through all 60 steps and 10 LR decays."""
    pts = cloud10[::5]  # keep the torch side fast; parity is size-independent
    Kn = _K()
    n_steps = 60
    t0 = pts.mean(0, keepdims=True) + np.array([[0.5, -0.4, 0.2]], np.float32)
    q0 = np.array([0.9, 0.1, -0.2, 0.15], np.float32)
    q0 /= np.linalg.norm(q0)

    model = ref.ModelPose(
        torch.tensor(pts), torch.tensor(t0), torch.tensor(q0[None]),
        torch.tensor(Kn), IMG_W, IMG_H, device=CPU,
    )
    opt = torch.optim.Adam(
        [{"params": [model.trans], "lr": 0.02}, {"params": [model.quat], "lr": 0.02}]
    )
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.95)
    losses_t = []
    for i in range(n_steps):
        opt.zero_grad()
        loss = model()
        loss.backward()
        opt.step()
        if i % (n_steps // 10) == 0:
            sched.step()
        losses_t.append(loss.item())

    prob = PoseProblem(img_width=IMG_W, img_height=IMG_H)
    cfg = OptimizerConfig(
        lr_pose=0.02, lr_quat=0.02, decay_gamma=0.95, decay_every=n_steps // 10
    )
    tx = make_optimizer(cfg, pose_key="trans", quat_key="quat")
    params = init_pose_params(t0, q0[None])
    state = tx.init(params)
    P, Kj = jnp.asarray(pts), jnp.asarray(Kn)

    @jax.jit
    def step(params, state):
        (loss, _), g = jax.value_and_grad(
            lambda p: pose_forward(p, P, Kj, prob), has_aux=True
        )(params)
        upd, state = tx.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    losses_j = []
    for _ in range(n_steps):
        params, state, loss = step(params, state)
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=3e-4)
    final_t = np.concatenate(
        [model.trans.detach().numpy().ravel(), model.quat.detach().numpy().ravel()]
    )
    final_j = np.concatenate(
        [np.asarray(params["trans"]).ravel(), np.asarray(params["quat"]).ravel()]
    )
    assert _relnorm(final_j, final_t) < 1e-4


def test_traj_adam_curve_matches_reference(ref, cloud10, path10):
    """20 trajectory Adam steps at the launch-file learning rates (0.12/0.05,
    `launch/trajectory_optimization.launch:46-47`) from a generic start: the
    reference model driven by torch.optim vs our engine, per-step losses and
    final waypoints."""
    pts = cloud10[::5]
    Kn = _K()
    n_steps = 20
    quats0 = np.tile(np.array([1, 0, 0, 0], np.float32), (len(path10), 1))
    rng = np.random.default_rng(1)
    poses_init = path10 + rng.normal(size=path10.shape).astype(np.float32) * 0.15

    model = ref.ModelTraj(
        torch.tensor(pts), torch.tensor(path10), torch.tensor(quats0),
        torch.tensor(Kn), IMG_W, IMG_H, device=CPU,
    )
    model.poses.data = torch.tensor(poses_init)
    opt = torch.optim.Adam(
        [{"params": [model.poses], "lr": 0.12}, {"params": [model.quats], "lr": 0.05}]
    )
    losses_t = []
    for _ in range(n_steps):
        opt.zero_grad()
        loss = model(vis_wps_dist=0.5)
        loss.backward()
        opt.step()
        losses_t.append(loss.item())

    prob = TrajProblem(
        img_width=IMG_W, img_height=IMG_H, wps_step=waypoint_stride(path10),
        backend="xla",
    )
    tx = make_optimizer(OptimizerConfig(lr_pose=0.12, lr_quat=0.05))
    params = {"poses": jnp.asarray(poses_init), "quats": jnp.asarray(quats0)}
    state = tx.init(params)
    P, Kj = jnp.asarray(pts), jnp.asarray(Kn)
    p0, q0 = jnp.asarray(path10), jnp.asarray(quats0)

    @jax.jit
    def step(params, state):
        (loss, _), g = jax.value_and_grad(
            lambda p: traj_forward(p, P, Kj, p0, q0, prob), has_aux=True
        )(params)
        upd, state = tx.update(g, state, params)
        return optax.apply_updates(params, upd), state, loss

    losses_j = []
    for _ in range(n_steps):
        params, state, loss = step(params, state)
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=3e-4)
    assert _relnorm(params["poses"], model.poses.detach().numpy()) < 1e-4
