#!/usr/bin/env python
"""Trajectory Evaluation demo — score a fixed path, then show the gain.

Parity with the reference README's "Trajectory Evaluation" demo
(`README.md:73-80`, `demos/cam_traj_eval.gif`): evaluate a camera trajectory
by the number of observed points (voxels), fusing single-pose visibility
rewards through the OctoMap log-odds representation. The reference has no
dedicated entry point for this — it reads ModelTraj's `rewards`
(`src/model.py:225-242`); here it is one gradient-free jitted forward
(models/evaluate.py).

The demo evaluates the initial reference path (cloud + path index 10),
optimizes it, re-evaluates, and prints the observed-voxel census and gains.

Run: python demos/trajectory_evaluation_demo.py [opt_steps=200] [pc_index=10]
     [voxel=0] (voxel=0.15 first downsamples the cloud to literal voxels)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from trajectory_optimization_tpu.bus.launch import enable_compilation_cache

    enable_compilation_cache()

    from trajectory_optimization_tpu.api import TrajectoryOptimizer
    from trajectory_optimization_tpu.models.evaluate import evaluate_trajectory
    from trajectory_optimization_tpu.models.traj import TrajProblem, waypoint_stride
    from trajectory_optimization_tpu.utils.data import (
        identity_quaternions,
        load_path,
        load_point_cloud,
    )

    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    n_steps = int(args.get("opt_steps", 200))
    index = int(args.get("pc_index", 10))
    voxel = float(args.get("voxel", 0.0))

    here = os.path.dirname(os.path.abspath(__file__))
    pts = load_point_cloud(
        os.path.join(here, "..", "data", "points", f"point_cloud_{index}.npz")
    )
    poses0 = load_path(
        os.path.join(here, "..", "data", "paths", f"path_poses_{index}.npz")
    )
    quats0 = identity_quaternions(len(poses0))
    if voxel > 0:
        from trajectory_optimization_tpu.ops.voxel import voxel_downsample

        pts = np.asarray(voxel_downsample(pts, voxel))
        print(f"voxelized at {voxel} m -> {len(pts)} voxels")

    opt = TrajectoryOptimizer()
    problem = TrajProblem(
        img_width=opt.intr.width, img_height=opt.intr.height,
        wps_step=waypoint_stride(poses0, opt.vis_wps_dist),
    )
    K = opt.intr.matrix()

    def report(tag, ev, dt):
        print(f"{tag}: observed {ev.n_observed}/{len(pts)} points "
              f"({100 * ev.frac_observed:.1f}%), mean reward {ev.mean_reward:.4f}, "
              f"length {ev.length:.2f} m, mean angle {ev.mean_angle:.3f} rad "
              f"[{dt * 1e3:.1f} ms]")

    t0 = time.time()
    ev0 = evaluate_trajectory(pts, poses0, quats0, K, problem)
    report("initial  ", ev0, time.time() - t0)

    res = opt.optimize(pts, poses0, n_steps=n_steps)
    t0 = time.time()
    ev1 = evaluate_trajectory(
        pts, res.poses.astype(np.float32), res.quats_wxyz.astype(np.float32),
        K, problem,
    )
    report("optimized", ev1, time.time() - t0)
    print(f"gain: x{ev1.n_observed / max(ev0.n_observed, 1):.2f} observed voxels, "
          f"x{ev1.mean_reward / max(ev0.mean_reward, 1e-9):.2f} mean reward "
          f"({res.n_iters} optimizer iters)")
    return ev0, ev1


if __name__ == "__main__":
    main()
