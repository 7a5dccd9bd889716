"""Outcome referee: does occlusion-aware optimization actually SEE more?

Optimizes the same problems with and without differentiable soft-HPR
occlusion in the loss, then referees BOTH results with exact Qhull HPR
(`hpr_mask_exact`) — the judge neither optimizer had access to. Two cases:

1. POSE (synthetic occluded scene, mirrors tests/test_occlusion_outcome.py):
   a wide close occluder, a dense target cluster in its shadow, a smaller
   visible cluster off-axis.
2. TRAJECTORY (reference workload: cloud-10 x 27-waypoint path): plain
   `traj_forward` vs the frozen-routing occlusion-aware engine; referee =
   exact per-selected-waypoint HPR on the full 40k cloud.

Prints the refereed counts and writes demos/occlusion_outcome.png.
Numbers are recorded in PARITY.md ("occlusion-aware outcomes").
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
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
from trajectory_optimization_tpu.models.traj_frozen import (
    FrozenPlanConfig,
    FrozenTrajOptimizer,
)
from trajectory_optimization_tpu.opt.engine import OptimizerConfig, make_optimizer
from trajectory_optimization_tpu.ops.hpr import hpr_mask_exact
from trajectory_optimization_tpu.ops.scores import camera_planes, scores_from_planes
from trajectory_optimization_tpu.utils.data import (
    identity_quaternions,
    load_path,
    load_point_cloud,
)
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

# dataviz reference palette, categorical slots 1-2 (validated default)
BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#0b0b0b", "#52514e"

W_, H_ = 64.0, 48.0
K_POSE = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]], np.float32)
BAND = dict(min_dist=3.0, max_dist=8.0)


def _grid(n, z, cx, cy, half, seed):
    r = np.random.default_rng(seed)
    a = np.linspace(-half, half, n)
    g1, g2 = np.meshgrid(a, a)
    pts = np.stack([cx + g1.ravel(), cy + g2.ravel(), np.full(g1.size, z)], 1)
    return (pts + r.normal(scale=0.01, size=pts.shape)).astype(np.float32)


def occluded_scene():
    """The refereed scene — single source; tests/test_occlusion_outcome.py
    imports it so the CI pin and the PARITY.md numbers cannot de-sync."""
    return np.vstack([
        _grid(40, 1.5, 0.0, 0.0, 2.0, seed=1),   # occluder (out of band)
        _grid(55, 6.0, 0.0, 0.0, 2.0, seed=2),   # dense, shadowed
        _grid(35, 5.0, 5.5, 0.0, 1.5, seed=3),   # smaller, visible
    ]).astype(np.float32)


def pose_case():
    pts = occluded_scene()
    P, Kj = jnp.asarray(pts), jnp.asarray(K_POSE)
    out = {}
    for soft in (False, True):
        prob = PoseProblem(img_width=W_, img_height=H_, soft_hpr=soft, **BAND)
        params = init_pose_params(np.zeros((1, 3), np.float32),
                                  np.array([[1.0, 0, 0, 0]], np.float32))
        tx = optax.adam(0.02)
        st = tx.init(params)

        @jax.jit
        def step(p, s, prob=prob):
            g = jax.grad(lambda q: pose_forward(q, P, Kj, prob)[0])(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        for _ in range(200):
            params, st = step(params, st)
        cx, cy, cz = camera_planes(P, params["quat"], params["trans"])
        score = np.asarray(
            scores_from_planes(cx, cy, cz, Kj, W_, H_, **BAND)[0])
        cam = np.stack([np.asarray(cx)[0], np.asarray(cy)[0],
                        np.asarray(cz)[0]], 1)
        exact = hpr_mask_exact(cam)
        obs = score > 0.05
        out["aware" if soft else "blind"] = {
            "good": int((obs & exact).sum()),
            "fooled": int((obs & ~exact).sum()),
            "pose": np.asarray(params["trans"])[0],
        }
    return pts, out


def traj_case(n_steps=150):
    pts = load_point_cloud(os.path.join(
        os.path.dirname(__file__), "..", "data/points/point_cloud_10.npz"))
    path = load_path(os.path.join(
        os.path.dirname(__file__), "..", "data/paths/path_poses_10.npz"))
    intr = default_intrinsics()
    quats = identity_quaternions(len(path))
    stride = waypoint_stride(path, 0.5)
    K = np.asarray(intr.matrix())
    opt_cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    finals = {}

    # occlusion-blind: plain visibility loss
    prob_b = TrajProblem(img_width=intr.width, img_height=intr.height,
                         wps_step=stride)
    tx = make_optimizer(opt_cfg)
    P, Kj = jnp.asarray(pts), jnp.asarray(K)
    p0, q0 = jnp.asarray(path), jnp.asarray(quats)

    @jax.jit
    def step_b(p, s):
        (_, _), g = jax.value_and_grad(
            lambda q: traj_forward(q, P, Kj, p0, q0, prob_b),
            has_aux=True)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    params = init_traj_params(path, quats)
    st = tx.init(params)
    for _ in range(n_steps):
        params, st = step_b(params, st)
    finals["blind"] = jax.device_get(params)

    # occlusion-aware: frozen-routing soft-HPR engine
    prob_a = TrajProblem(img_width=intr.width, img_height=intr.height,
                         wps_step=stride, soft_hpr=True, soft_hpr_dense_max=0)
    opt = FrozenTrajOptimizer(pts, K, path, quats, prob_a, opt_cfg,
                              FrozenPlanConfig())
    params = init_traj_params(path, quats)
    st = opt.init(params)
    for _ in range(n_steps):
        params, st, _, _ = opt.step(params, st)
    opt.close()
    finals["aware"] = jax.device_get(params)

    # referee: exact Qhull per selected waypoint on the FULL cloud
    from trajectory_optimization_tpu.ops.quat import to_matrix

    sel = slice(None, None, stride)
    out = {}
    for name, p in finals.items():
        poses_sel = np.asarray(p["poses"])[sel]
        quats_sel = np.asarray(p["quats"])[sel]
        Rm = np.asarray(to_matrix(jnp.asarray(
            quats_sel / np.linalg.norm(quats_sel, axis=1, keepdims=True))))
        good = fooled = 0
        for w in range(len(poses_sel)):
            cam = (pts - poses_sel[w]) @ Rm[w]
            cxp, cyp, czp = cam[:, 0], cam[:, 1], cam[:, 2]
            score = np.asarray(scores_from_planes(
                jnp.asarray(cxp)[None], jnp.asarray(cyp)[None],
                jnp.asarray(czp)[None], Kj,
                intr.width, intr.height)[0])
            exact = hpr_mask_exact(cam.astype(np.float32))
            obs = score > 0.05
            good += int((obs & exact).sum())
            fooled += int((obs & ~exact).sum())
        out[name] = {"good": good, "fooled": fooled}
    return out


def plot(pts, pose_res, traj_res, out_png):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13.5, 4.2), facecolor="#fcfcfb")
    ax = axes[0]
    ax.scatter(pts[:, 2], pts[:, 0], s=1, c="#c3c2b7", linewidths=0)
    for name, color, dy in (("blind", ORANGE, -12), ("aware", BLUE, 8)):
        p = pose_res[name]["pose"]
        ax.scatter([p[2]], [p[0]], s=60, c=color, marker="^",
                   edgecolors="#fcfcfb", linewidths=1.5, zorder=3)
        ax.annotate(name, (p[2], p[0]), textcoords="offset points",
                    xytext=(8, dy), color=INK, fontsize=9)
    ax.scatter([0], [0], s=40, c=MUTED, marker="x")
    ax.annotate("start", (0, 0), textcoords="offset points", xytext=(6, 4),
                color=MUTED, fontsize=8)
    ax.set_xlabel("z (m)", color=MUTED)
    ax.set_ylabel("x (m)", color=MUTED)
    ax.set_title("pose case: scene (top-down), final poses",
                 color=INK, fontsize=10)

    groups = ["truly visible", "falsely counted"]
    for ax, res, title in ((axes[1], pose_res, "pose case"),
                           (axes[2], traj_res, "trajectory (cloud-10)")):
        x = np.arange(len(groups))
        for i, (name, color) in enumerate((("blind", ORANGE),
                                           ("aware", BLUE))):
            vals = [res[name]["good"], res[name]["fooled"]]
            bars = ax.bar(x + (i - 0.5) * 0.34, vals, width=0.3,
                          color=color, label=name)
            for b, v in zip(bars, vals):
                ax.annotate(f"{v:,}", (b.get_x() + b.get_width() / 2, v),
                            ha="center", va="bottom", color=INK, fontsize=8)
        ax.set_xticks(x, groups)
        ax.set_title(f"{title}: exact-HPR referee", color=INK, fontsize=10)
        ax.tick_params(colors=MUTED)
        ax.margins(y=0.15)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.legend(frameon=False, fontsize=9)
    for ax in axes:
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, color="#e8e7e2", linewidth=0.5)
        ax.set_axisbelow(True)
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    print("wrote", out_png)


def main():
    import json

    here = os.path.dirname(__file__)
    cache = os.path.join(here, "occlusion_outcome.json")
    if os.path.exists(cache) and "--replot" in sys.argv:
        blob = json.load(open(cache))
        pts, pose_res, traj_res = occluded_scene(), blob["pose"], blob["traj"]
        for v in pose_res.values():
            v["pose"] = np.asarray(v["pose"])
    else:
        pts, pose_res = pose_case()
        traj_res = traj_case()
        json.dump({"traj": traj_res,
                   "pose": {k: {**v, "pose": v["pose"].tolist()}
                            for k, v in pose_res.items()}},
                  open(cache, "w"))
    for k, v in pose_res.items():
        print(f"pose {k}: truly-visible {v['good']}, "
              f"occluded-but-counted {v['fooled']}, pose {np.round(v['pose'], 2)}")
    for k, v in traj_res.items():
        print(f"traj {k}: truly-visible {v['good']}, "
              f"occluded-but-counted {v['fooled']}")
    gain_p = pose_res["aware"]["good"] / max(pose_res["blind"]["good"], 1)
    gain_t = traj_res["aware"]["good"] / max(traj_res["blind"]["good"], 1)
    print(f"exact-visible gain: pose x{gain_p:.2f}, trajectory x{gain_t:.3f}")
    plot(pts, pose_res, traj_res, os.path.join(here, "occlusion_outcome.png"))


if __name__ == "__main__":
    main()
