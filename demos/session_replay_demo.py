#!/usr/bin/env python
"""Session-scale bag replay: the reference's recorded-robot workflow.

The reference drives its node graph from a 15.1 GB / 1225 s rosbag with six
cameras (354,807 msgs: /tf flood, 6× camera_info at 0.9 Hz, clouds at
0.1-0.3 Hz, /path at 0.1 Hz — `launch/rosbag_info.txt`). This demo
synthesizes a session with the same topic structure and rates, writes it to
a real ROS1 ``.bag``, replays it into the full node graph (PointsProcessor
six-camera rig + TrajOpt), and reports the realtime factor.

Usage: python demos/session_replay_demo.py [duration_s] [tf_hz] [img_scale]
(img_scale < 1 shrinks the camera for quick CPU runs/tests)
"""
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_session(pts, path, duration: float, tf_hz: float, img_scale: float = 1.0):
    """Messages mirroring the reference session's topic structure/rates."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg
    from trajectory_optimization_tpu.bus.messages import (
        CameraInfoMsg,
        CloudMsg,
        Header,
        ImageMsg,
        PathMsg,
        TransformMsg,
    )
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    Km = np.asarray(intr.matrix()) * img_scale
    Km[2, 2] = 1.0
    K = tuple(Km.reshape(-1).tolist())
    img_w, img_h = int(intr.width * img_scale), int(intr.height * img_scale)
    qi = np.array([0.0, 0.0, 0.0, 1.0])
    msgs = []

    # static rig: six cameras in a yaw ring on the robot (tf_static burst)
    for i in range(6):
        a = i * math.pi / 3.0
        q = np.array([0.0, 0.0, math.sin(a / 2.0), math.cos(a / 2.0)])
        msgs.append(("/tf_static", TransformMsg(
            Header(stamp=0.0, frame_id="X1"), f"camera_{i}", [0.0, 0.0, 0.4], q)))

    # moving robot on /tf (the bag's dominant topic)
    n_tf = int(duration * tf_hz)
    for k in range(n_tf):
        t = k / tf_hz
        pose = np.array([0.4 * t, 2.0 * math.sin(0.2 * t), 0.0])
        msgs.append(("/tf", TransformMsg(Header(stamp=t, frame_id="map"), "X1", pose, qi)))

    # clouds at 0.3 Hz for the processor, cloud+path at 0.1 Hz for the optimizer
    for k in range(int(duration * 0.3)):
        t = k / 0.3 + 0.05
        msgs.append(("/dynamic_point_cloud",
                     CloudMsg(Header(stamp=t, frame_id="map"), pts[k % 3 :: 3])))
    for k in range(int(duration * 0.1)):
        t = k / 0.1 + 0.11
        msgs.append(("/final_cost_cloud", CloudMsg(Header(stamp=t, frame_id="map"), pts)))
        msgs.append(("/path", PathMsg.straight(path, frame_id="map", stamp=t + 0.02)))

    # six camera_info + CompressedImage (JPEG) topics at 0.9 Hz each —
    # the reference bag's /viz/camera_*/image/compressed streams
    # (launch/rosbag_info.txt:30-41), encoded with the framework's own
    # from-spec codec and decoded back to pixels on replay
    frames = []
    yy, xx = np.mgrid[0:img_h, 0:img_w]
    for i in range(6):
        frame = np.stack([
            (xx * 255 // max(img_w, 1) + i * 40) % 256,
            (yy * 255 // max(img_h, 1)) % 256,
            ((xx + yy) // 4 + i * 17) % 256,
        ], axis=-1).astype(np.uint8)
        frames.append(np.frombuffer(encode_jpeg(frame, quality=85), np.uint8))
    for k in range(int(duration * 0.9)):
        t = k / 0.9 + 0.3
        for i in range(6):
            msgs.append((f"/viz/camera_{i}/camera_info", CameraInfoMsg(
                Header(stamp=t, frame_id=f"camera_{i}"),
                width=img_w, height=img_h, K=K)))
            msgs.append((f"/viz/camera_{i}/image/compressed", ImageMsg(
                Header(stamp=t, frame_id=f"camera_{i}"),
                frames[i], encoding="jpeg")))
    msgs.sort(key=lambda m: m[1].header.stamp)
    return msgs


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    duration = float(argv[0]) if argv else 30.0
    tf_hz = float(argv[1]) if len(argv) > 1 else 20.0
    img_scale = float(argv[2]) if len(argv) > 2 else 1.0

    from trajectory_optimization_tpu.bus.core import Bus
    from trajectory_optimization_tpu.bus.launch import (
        Launch,
        enable_compilation_cache,
        launch_play_bag,
    )

    enable_compilation_cache()  # process restarts replay warm
    from trajectory_optimization_tpu.bus.nodes import PointsProcessorNode, TrajOptNode
    from trajectory_optimization_tpu.bus.rosbag import write_bag
    from trajectory_optimization_tpu.utils.config import (
        PointsProcessorConfig,
        TrajOptNodeConfig,
    )
    from trajectory_optimization_tpu.utils.data import load_path, load_point_cloud

    here = os.path.dirname(os.path.abspath(__file__))
    pts = load_point_cloud(os.path.join(here, "..", "data", "points", "point_cloud_10.npz"))
    path = load_path(os.path.join(here, "..", "data", "paths", "path_poses_10.npz"))

    msgs = synth_session(pts, path, duration, tf_hz, img_scale)
    bag = os.path.join(tempfile.gettempdir(), "trajopt_session.bag")
    n = write_bag(bag, msgs)
    print(f"wrote {n} messages / {duration:.0f}s session to {bag} "
          f"({os.path.getsize(bag)/1e6:.1f} MB)")

    # the reference's play_bag graph: processor rig + trajectory optimizer
    bus = Bus()
    proc = PointsProcessorNode(bus, PointsProcessorConfig(
        pc_topic="/dynamic_point_cloud",
        cam_info_topics=tuple(f"/viz/camera_{i}/camera_info" for i in range(6)),
    ))
    traj = TrajOptNode(bus, TrajOptNodeConfig(
        pc_topic="/final_cost_cloud", path_topic="/path",
        opt_steps=30, smooth_weight=28.0, lr_pose=0.12, lr_quat=0.05,
    ))
    launch = Launch(bus, {"pc_processor": proc, "traj_opt": traj}, [])
    optimized = []
    bus.subscribe("/path/optimized", optimized.append)
    camera_frames = []
    for i in range(6):
        bus.subscribe(f"/viz/camera_{i}/image/compressed", camera_frames.append)

    # cold pass (includes per-bucket jit compiles), then warm — the
    # steady-state rate a session-length bag (the reference's is 1225 s)
    # actually sees
    factors = []
    for phase in ("cold", "warm"):
        t0 = time.perf_counter()
        replayed = launch_play_bag(bag, launch)
        wall = time.perf_counter() - t0
        traj.flush()
        factors.append(duration / wall)
        print(f"{phase}: replayed {replayed} msgs in {wall:.2f}s — "
              f"realtime factor {factors[-1]:.1f}x")

    # camera decoding dominates the warm replay (six JPEG streams at
    # 0.9 Hz each); consumers that only need clouds/paths can skip it
    from trajectory_optimization_tpu.bus.rosbag import set_image_decoding

    n_decoded_frames = len(camera_frames)  # frames from the decoding passes
    prev = set_image_decoding(False)
    try:
        t0 = time.perf_counter()
        launch_play_bag(bag, launch)
        wall = time.perf_counter() - t0
        traj.flush()
        print(f"warm, cameras passthrough (set_image_decoding(False)): "
              f"{duration / wall:.1f}x realtime")
    finally:
        set_image_decoding(prev)

    rigs = proc.n_batched + proc.n_serial
    decoded_passes = camera_frames[:n_decoded_frames]
    n_px = sum(1 for m in decoded_passes if getattr(m.data, "ndim", 0) == 3)
    print(f"rig evaluations: {proc.n_batched} batched / {proc.n_serial} serial; "
          f"optimized paths: {len(optimized)}; "
          f"camera frames decoded: {n_px}/{n_decoded_frames}; "
          f"bus errors: {len(bus.errors)}")
    assert not bus.errors, bus.errors[:2]
    assert optimized and rigs > 0
    assert decoded_passes and n_px == n_decoded_frames

    # the paper's qualitative check: render the cloud from camera_0's TF
    # pose beside the real (decoded) frame — same machinery a real-session
    # bag uses (reference src/pc_processor.py:190-197 + rviz image views)
    from visualize import rendered_vs_real

    frame = next(m for m in reversed(camera_frames)
                 if m.header.frame_id == "camera_0"
                 and getattr(m.data, "ndim", 0) == 3)
    cloud = bus.latest("/dynamic_point_cloud")
    info = bus.latest("/viz/camera_0/camera_info")
    K = np.asarray(info.K, np.float32).reshape(3, 3)
    out_png = os.path.join(tempfile.gettempdir(), "rendered_vs_real.png")
    _, ncc = rendered_vs_real(
        proc.frames, np.asarray(cloud.points)[:, :3], cloud.header.frame_id,
        "camera_0", K, np.asarray(frame.data),
        time=frame.header.stamp, out=out_png)
    print(f"rendered-vs-real (camera_0): ncc {ncc:+.3f} -> {out_png}")
    return factors[-1]


if __name__ == "__main__":
    main()
