#!/usr/bin/env python
"""Waypoints Optimization demo — per-waypoint X/Y/yaw camera refinement.

Parity with the reference README's "Waypoints Optimization" demo
(`README.md:66-71`, `demos/cam_wps_opt.gif`): "Camera pose (X, Y and Yaw)
optimization is consequently applied here for each separate sampled
way-point of an initial trajectory." Here all waypoints optimize in ONE
batched device program (the problems are independent — see
models/wps_opt.py); this demo loads the reference scene (cloud + path index
10), refines every waypoint, prints per-waypoint visibility gains, and
publishes the initial/refined paths plus the per-point observation cloud to
the scene bus.

Run: python demos/waypoints_optimization_demo.py [opt_steps=100] [lr_xy=0.02]
     [lr_yaw=0.02] [pc_index=10] [soft_hpr=0]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    from trajectory_optimization_tpu.bus.launch import enable_compilation_cache

    enable_compilation_cache()

    from trajectory_optimization_tpu.bus.core import Bus
    from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PathMsg
    from trajectory_optimization_tpu.models.wps_opt import (
        WpsOptProblem,
        optimize_waypoints,
    )
    from trajectory_optimization_tpu.ops import quat as quat_ops
    from trajectory_optimization_tpu.utils.data import (
        identity_quaternions,
        load_path,
        load_point_cloud,
    )
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    n_steps = int(args.get("opt_steps", 100))
    lr_xy = float(args.get("lr_xy", 0.02))
    lr_yaw = float(args.get("lr_yaw", 0.02))
    index = int(args.get("pc_index", 10))
    soft_hpr = bool(int(args.get("soft_hpr", 0)))

    here = os.path.dirname(os.path.abspath(__file__))
    pts = load_point_cloud(
        os.path.join(here, "..", "data", "points", f"point_cloud_{index}.npz")
    )
    poses0 = load_path(
        os.path.join(here, "..", "data", "paths", f"path_poses_{index}.npz")
    )
    quats0 = identity_quaternions(len(poses0))
    intr = default_intrinsics()

    problem = WpsOptProblem(
        img_width=intr.width, img_height=intr.height, soft_hpr=soft_hpr
    )
    t0 = time.time()
    trans, quats, aux = optimize_waypoints(
        pts, poses0, quats0, intr.matrix(), problem,
        n_steps=n_steps, lr_xy=lr_xy, lr_yaw=lr_yaw,
    )
    dt = time.time() - t0

    losses0 = np.asarray(aux["losses0"])
    losses = np.asarray(aux["losses"])
    gains = losses0 / np.maximum(losses, 1e-12)  # loss is 1/visibility
    print(f"{len(poses0)} waypoints x {len(pts)} points, {n_steps} steps "
          f"in {dt:.2f}s ({n_steps / dt:.1f} steps/s)")
    for w, g in enumerate(gains):
        print(f"  wp {w:2d}: visibility x{g:.2f}  "
              f"yaw {np.degrees(2 * np.arctan2(np.asarray(quats)[w, 3], np.asarray(quats)[w, 0])):+6.1f} deg  "
              f"dxy {np.linalg.norm(np.asarray(trans)[w, :2] - poses0[w, :2]):.2f} m")
    print(f"mean visibility gain x{gains.mean():.2f} "
          f"(min x{gains.min():.2f}, max x{gains.max():.2f})")

    # publish for the headless visualizer / any live subscriber
    bus = Bus()
    stamp = time.time()
    bus.publish("/path/initial", PathMsg(
        header=Header(stamp=stamp, frame_id="map"),
        positions=poses0,
        orientations_xyzw=quat_ops.wxyz_to_xyzw_np(quats0)))
    bus.publish("/path/waypoints_optimized", PathMsg(
        header=Header(stamp=stamp, frame_id="map"),
        positions=np.asarray(trans),
        orientations_xyzw=quat_ops.wxyz_to_xyzw_np(np.asarray(quats))))
    # per-point best observation over waypoints as the intensity channel
    intensity = np.asarray(aux["observations"]).max(axis=0)
    bus.publish("/pts", CloudMsg(
        header=Header(stamp=stamp, frame_id="map"),
        points=np.concatenate([pts, intensity[:, None]], axis=1)))
    return gains


if __name__ == "__main__":
    main()
