#!/usr/bin/env python
"""Offline trajectory optimization demo.

Parity with the reference `src/trajectory_optimization_sample.py`: load cloud
+ 27-waypoint path (index 10), identity initial orientations; Adam +
ExponentialLR(0.9) every N/10 steps; log visibility gain R/R0 and smoothness
gain L0/L every `pub_sample` iterations; detect optimality against thresholds
(1.1, 0.9); publish initial/optimized paths and the rewards cloud to the
scene bus; save the convergence plot headlessly; print mean step time.

Run: python demos/trajectory_optimization_demo.py [opt_steps=400] ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from trajectory_optimization_tpu.bus.launch import enable_compilation_cache

    enable_compilation_cache()  # repeat runs reload executables

    from trajectory_optimization_tpu.bus.core import Bus
    from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PathMsg
    from trajectory_optimization_tpu.models.traj import (
        TrajProblem,
        init_traj_params,
        traj_forward,
        waypoint_stride,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig, OptimizerLoop
    from trajectory_optimization_tpu.utils.data import identity_quaternions, load_path, load_point_cloud
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    # knobs (reference `src/trajectory_optimization_sample.py:54-59`)
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    pub_sample = int(args.get("pub_sample", 10))
    n_steps = int(args.get("opt_steps", 400))
    smooth_weight = float(args.get("smooth_weight", 14.0))
    length_weight = float(args.get("length_weight", 0.02))
    lr_pose = float(args.get("lr_pose", 0.1))
    lr_quat = float(args.get("lr_quat", 0.02))
    index = int(args.get("pc_index", 10))
    REWARDS_TH, SMOOTHNESS_TH = 1.1, 0.9

    here = os.path.dirname(os.path.abspath(__file__))
    pts_np = load_point_cloud(os.path.join(here, "..", "data", "points", f"point_cloud_{index}.npz"))
    poses_np = load_path(os.path.join(here, "..", "data", "paths", f"path_poses_{index}.npz"))
    quats_np = identity_quaternions(len(poses_np))
    intr = default_intrinsics()

    problem = TrajProblem(
        img_width=intr.width,
        img_height=intr.height,
        smoothness_weight=smooth_weight,
        length_weight=length_weight,
        wps_step=waypoint_stride(poses_np, 0.5),
    )
    P, K = jnp.asarray(pts_np), intr.matrix()
    p0, q0 = jnp.asarray(poses_np), jnp.asarray(quats_np)

    def loss_fn(params):
        return traj_forward(params, P, K, p0, q0, problem)

    loop = OptimizerLoop(
        loss_fn,
        init_traj_params(poses_np, quats_np),
        OptimizerConfig(lr_pose=lr_pose, lr_quat=lr_quat, decay_gamma=0.9,
                        decay_every=max(n_steps // 10, 1)),
    )

    bus = Bus()
    log = {"visibility": [], "smoothness": []}
    reward0 = smooth0 = None
    optimal_at = None
    t_step, done = 0.0, 0

    while done < n_steps:
        t0 = time.perf_counter()
        n = min(pub_sample, n_steps - done)
        loss, aux = loop.run(n)
        np.asarray(loop.params["poses"])  # true device sync
        done += n
        t_step += time.perf_counter() - t0

        if reward0 is None:
            reward0 = float(aux["mean_reward"])
            smooth0 = float(aux["loss_smooth"])
        log["visibility"].append(float(aux["mean_reward"]) / reward0)
        log["smoothness"].append(smooth0 / float(aux["loss_smooth"]))
        if optimal_at is None and log["visibility"][-1] > REWARDS_TH and log["smoothness"][-1] > SMOOTHNESS_TH:
            optimal_at = done
            print(f"Found optimal trajectory after {optimal_at} steps")

        rewards = np.asarray(aux["rewards"])
        bus.publish("/pts", CloudMsg(Header.make("world"),
                                     np.concatenate([pts_np, rewards[:, None]], axis=1)))
        bus.publish("/path/initial", PathMsg.straight(poses_np))
        quats = np.asarray(loop.params["quats"], np.float64)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        bus.publish("/path/optimized", PathMsg(
            Header.make("world"),
            np.asarray(loop.params["poses"], np.float64),
            np.concatenate([quats[:, 1:], quats[:, :1]], axis=1),
        ))

    print(f"visibility gain: {log['visibility'][-1]:.4f}, smoothness gain: {log['smoothness'][-1]:.4f}")
    print(f"Mean optimization step time: {1000 * t_step / n_steps} msec")

    try:  # headless convergence plot (the reference shows it live in matplotlib)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(16, 8))
        axes[0].plot(log["visibility"], color="b")
        axes[0].set(title="Visibility reward gain: R / R0", xlabel="opt steps", ylabel="R / R0")
        axes[1].plot(log["smoothness"], color="b")
        axes[1].set(title="Trajectory smoothness", xlabel="opt steps", ylabel="L0 / L")
        for ax in axes:
            if optimal_at is not None:
                ax.axvline(optimal_at // pub_sample, 0, 1)
            ax.grid(True)
        out = os.path.join(here, "traj_opt_convergence.png")
        fig.savefig(out, dpi=80)
        print(f"saved convergence plot to {out}")
    except ImportError:
        pass
    return log


if __name__ == "__main__":
    main()
