#!/usr/bin/env python
"""Bag-replay demo (parity with `launch/play_bag.launch`: rosbag play into a
live node graph). Synthesizes a short ROS1 ``.bag`` session — moving-robot
TF, clouds, a path — then replays it into the trajectory-optimization node
graph and reports what the nodes produced.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from trajectory_optimization_tpu.bus.launch import (
        launch_play_bag,
        launch_trajectory_optimization,
    )
    from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PathMsg, TransformMsg
    from trajectory_optimization_tpu.bus.rosbag import read_bag, write_bag
    from trajectory_optimization_tpu.utils.data import load_path, load_point_cloud

    here = os.path.dirname(os.path.abspath(__file__))
    pts = load_point_cloud(os.path.join(here, "..", "data", "points", "point_cloud_10.npz"))
    path = load_path(os.path.join(here, "..", "data", "paths", "path_poses_10.npz"))

    # --- record a session ---------------------------------------------------
    msgs = []
    for i in range(3):
        t = float(i)
        msgs.append(("/tf", TransformMsg(Header(stamp=t, frame_id="map"), "X1",
                                         np.array([0.5 * i, 0.0, 0.0]),
                                         np.array([0.0, 0.0, 0.0, 1.0]))))
        msgs.append(("/X1/local_map",
                     CloudMsg(Header(stamp=t + 0.1, frame_id="map"), pts[i::3])))
        msgs.append(("/X1/path",
                     PathMsg.straight(path, frame_id="map", stamp=t + 0.2)))
    bag = os.path.join(tempfile.gettempdir(), "trajopt_demo_session.bag")
    n = write_bag(bag, msgs)
    print(f"wrote {n} messages to {bag} ({os.path.getsize(bag)/1e6:.1f} MB)")
    print("topics:", sorted({t for _, t, _ in read_bag(bag)}))

    # --- replay into the node graph (play_bag.launch workflow) --------------
    launch = launch_trajectory_optimization()
    optimized = []
    launch.bus.subscribe("/X1/path/optimized", optimized.append)
    t0 = time.time()
    replayed = launch_play_bag(bag, launch)
    dt = time.time() - t0
    print(f"replayed {replayed} messages in {dt:.2f}s; bus errors: {launch.bus.errors}")
    print(f"optimized paths published: {len(optimized)}")
    for i, p in enumerate(optimized):
        print(f"  [{i}] {p.positions.shape[0]} waypoints, "
              f"first → last: {np.round(p.positions[0], 2)} → {np.round(p.positions[-1], 2)}")
    assert not launch.bus.errors and optimized


if __name__ == "__main__":
    main()
