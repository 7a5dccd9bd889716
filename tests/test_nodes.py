"""End-to-end node-graph tests: feeders → optimizers → output topics,
the replay harness standing in for the reference's ROS graph (SURVEY.md §4)."""
import numpy as np
import pytest

from trajectory_optimization_tpu.bus.core import Bus
from trajectory_optimization_tpu.bus.messages import (
    CameraInfoMsg,
    CloudMsg,
    Header,
    PathMsg,
    PoseMsg,
)
from trajectory_optimization_tpu.bus.nodes import (
    CloudFeederNode,
    PointsProcessorNode,
    PoseFeederNode,
    PoseOptNode,
    TrajOptNode,
    VoxelFilterNode,
)
from trajectory_optimization_tpu.utils.config import (
    CloudFeederConfig,
    PointsProcessorConfig,
    PoseFeederConfig,
    PoseOptNodeConfig,
    TrajOptNodeConfig,
    VoxelFilterConfig,
)


def test_traj_opt_node_end_to_end(cloud10, path10):
    bus = Bus()
    node = TrajOptNode(
        bus,
        TrajOptNodeConfig(
            pc_topic="/pc", path_topic="/path", opt_steps=15,
            lr_pose=0.1, lr_quat=0.02, publish_rewards_cloud=True,
        ),
    )
    outputs = {}
    bus.subscribe("/path/optimized", lambda m: outputs.setdefault("path", m))
    bus.subscribe("/pc/rewards", lambda m: outputs.setdefault("rewards", m))

    bus.publish("/pc", CloudMsg(Header(stamp=1.0, frame_id="map"), cloud10[::4]))
    bus.publish("/path", PathMsg.straight(path10, frame_id="map", stamp=1.2))

    assert "path" in outputs, "no optimized path published"
    out = outputs["path"]
    assert out.positions.shape == path10.shape
    assert out.header.frame_id == "map"
    # quaternions normalized, xyzw
    np.testing.assert_allclose(
        np.linalg.norm(out.orientations_xyzw, axis=1), 1.0, atol=1e-5
    )
    # the optimizer moved the trajectory
    assert np.abs(out.positions - path10).max() > 1e-4
    assert node.last_result["mean_reward"] > 0

    rew = outputs["rewards"]
    assert rew.points.shape == (len(cloud10[::4]), 4)
    assert rew.intensity.min() >= 0 and rew.intensity.max() <= 1


def test_traj_opt_node_pipelined_matches_sync(cloud10, path10):
    """pipeline_depth > 1 changes only WHEN results are published (lagging
    by up to depth-1 messages, drained by flush), never WHAT: same inputs in
    the same order must give bit-identical optimized paths."""

    def run(depth, n_msgs=3):
        bus = Bus()
        node = TrajOptNode(
            bus,
            TrajOptNodeConfig(
                pc_topic="/pc", path_topic="/path", opt_steps=6,
                lr_pose=0.1, lr_quat=0.02, rewards_th=float("inf"),
                pipeline_depth=depth,
            ),
        )
        out = []
        bus.subscribe("/path/optimized", out.append)
        for i in range(n_msgs):
            stamp = float(i) * 10.0
            # vary the cloud per message so lagged publishes are detectable
            bus.publish(
                "/pc", CloudMsg(Header(stamp=stamp, frame_id="map"), cloud10[:: 4 + i])
            )
            bus.publish("/path", PathMsg.straight(path10, frame_id="map", stamp=stamp))
            if depth > 1:  # outputs lag: at most i+1 published so far
                assert len(out) <= i + 1
        node.flush()
        assert len(out) == n_msgs
        return out

    sync = run(1)
    piped = run(3)
    for a, b in zip(sync, piped):
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.orientations_xyzw, b.orientations_xyzw)


def test_pose_opt_node_publishes_progress(cloud10):
    bus = Bus()
    node = PoseOptNode(
        bus,
        PoseOptNodeConfig(
            pc_topic="/pts", pose_topic="/pose", opt_steps=20,
            lr_pose=0.02, lr_quat=0.02, num_pub_samples=4,
        ),
    )
    odoms, infos = [], []
    bus.subscribe("/odom", odoms.append)
    bus.subscribe("/camera/camera_info", infos.append)
    bus.publish("/pts", CloudMsg(Header(stamp=5.0, frame_id="world"), cloud10[::8]))
    bus.publish(
        "/pose",
        PoseMsg(Header(stamp=5.1, frame_id="world"), [6.0, 2.0, 0.0], [0.1, -0.3, 0.2, 0.9]),
    )
    assert len(odoms) >= 4  # published num_pub_samples times during the loop
    assert node.last_result["n_iters"] == 20
    assert infos and infos[-1].K[0] > 0
    # optimized camera pose landed in the frame graph
    t, q = node.frames.lookup("world", "camera_frame")
    assert np.isfinite(t).all()


def test_pose_opt_node_zero_steps(cloud10):
    """opt_steps=0 must not raise (ADVICE round-1: loss was unbound when both
    the segment loop and the remainder branch were skipped)."""
    bus = Bus(error_policy="raise")
    node = PoseOptNode(
        bus, PoseOptNodeConfig(pc_topic="/pts", pose_topic="/pose", opt_steps=0)
    )
    bus.publish("/pts", CloudMsg(Header(stamp=1.0, frame_id="world"), cloud10[::64]))
    bus.publish(
        "/pose", PoseMsg(Header(stamp=1.1, frame_id="world"), [6.0, 2.0, 0.0], [1, 0, 0, 0])
    )
    assert node.last_result["n_iters"] == 0


def test_points_processor_pipeline(cloud10):
    bus = Bus()
    node = PointsProcessorNode(
        bus,
        PointsProcessorConfig(
            pc_topic="/cloud", cam_info_topics=("/cam0/info",),
            frustum_min_dist=1.0, frustum_max_dist=15.0, hpr_backend="approx",
            render=False,
        ),
    )
    # camera sits at the pose-demo start, looking along world +z
    node.frames.set_transform("world", "cam0", [6.0, 2.0, -3.0], [0, 0, 0, 1])
    outputs = {}
    bus.subscribe("/cam0/pointcloud", lambda m: outputs.setdefault("culled", m))
    bus.subscribe("/cam0/pointcloud_visible", lambda m: outputs.setdefault("visible", m))

    bus.publish("/cloud", CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10))
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    bus.publish(
        "/cam0/info",
        CameraInfoMsg(
            Header(stamp=0.0, frame_id="cam0"),
            int(intr.width), int(intr.height),
            K=tuple(intr.matrix_np(np.float64).reshape(-1)),
        ),
    )
    assert "culled" in outputs and "visible" in outputs
    n_culled = len(outputs["culled"].points)
    n_visible = len(outputs["visible"].points)
    assert 0 < n_visible <= n_culled < len(cloud10)


def test_points_processor_six_camera_rig_batches(cloud10):
    """Six CameraInfo topics sharing intrinsics (the reference's rig,
    `src/pc_processor.py:33-39`): one fused evaluation per cloud, outputs
    matching the serial per-camera path (VERDICT round-1 item 5)."""
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    cams = [f"cam{i}" for i in range(6)]
    topics = tuple(f"/{c}/info" for c in cams)

    def build(topics_, hpr="none"):
        # hpr 'none' for the batched-vs-serial equality check: HPR's hull
        # membership is legitimately sensitive to the ~1e-5 f32 transform
        # difference between the batched device path and the serial f64 host
        # path, so the comparison targets the deterministic cull geometry
        bus = Bus(error_policy="raise")
        node = PointsProcessorNode(
            bus,
            PointsProcessorConfig(
                pc_topic="/cloud", cam_info_topics=topics_,
                hpr_backend=hpr, render=False,
            ),
        )
        for i, c in enumerate(cams):
            # ring of cameras around the cloud
            a = 2 * np.pi * i / 6
            node.frames.set_transform(
                "world", c, [6 + 3 * np.cos(a), 2 + 3 * np.sin(a), -2.0], [0, 0, 0, 1]
            )
        return bus, node

    def info(c):
        return CameraInfoMsg(
            Header(stamp=0.0, frame_id=c), int(intr.width), int(intr.height),
            K=tuple(intr.matrix_np(np.float64).reshape(-1)),
        )

    # batched rig
    bus_b, node_b = build(topics)
    got_b = {}
    for c in cams:
        bus_b.subscribe(f"/{c}/pointcloud_visible", lambda m, c=c: got_b.__setitem__(c, m))
    bus_b.publish("/cloud", CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10[::4]))
    for c in cams:
        bus_b.publish(f"/{c}/info", info(c))
    assert node_b.n_batched == 1 and node_b.n_serial == 0
    assert set(got_b) == set(cams)

    # serial reference: single-topic nodes, same cameras
    for c in cams:
        bus_s, node_s = build((f"/{c}/info",))
        got_s = {}
        bus_s.subscribe(f"/{c}/pointcloud_visible", lambda m: got_s.__setitem__(c, m))
        bus_s.publish("/cloud", CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10[::4]))
        bus_s.publish(f"/{c}/info", info(c))
        assert node_s.n_serial == 1
        a, b = got_b[c].points, got_s[c].points
        assert len(a) == len(b), f"{c}: batched {len(a)} vs serial {len(b)}"
        np.testing.assert_allclose(a, b, atol=2e-4)

    # the approx-HPR batched path still runs end-to-end
    bus_h, node_h = build(topics[:3], hpr="approx")
    seen = []
    for c in cams[:3]:
        bus_h.subscribe(f"/{c}/pointcloud_visible", seen.append)
    bus_h.publish("/cloud", CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10[::16]))
    for c in cams[:3]:
        bus_h.publish(f"/{c}/info", info(c))
    assert node_h.n_batched == 1 and len(seen) == 3
    assert all(len(m.points) > 0 for m in seen)

    # mixed intrinsics fall back to the serial path
    bus_m, node_m = build(topics[:2])
    bus_m.publish("/cloud", CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10[::16]))
    other = CameraInfoMsg(Header(stamp=0.0, frame_id="cam1"), 640, 480,
                          K=(100.0, 0, 320, 0, 100, 240, 0, 0, 1))
    bus_m.publish("/cam0/info", info("cam0"))
    bus_m.publish("/cam1/info", other)
    assert node_m.n_batched == 0 and node_m.n_serial == 2


def test_voxel_filter_node(cloud10):
    bus = Bus()
    VoxelFilterNode(
        bus, VoxelFilterConfig(input_topic="/raw", output_topic="/filtered", leaf_size=0.3)
    )
    out = []
    bus.subscribe("/filtered", out.append)
    bus.publish("/raw", CloudMsg(Header(stamp=0.0), cloud10))
    assert out and 0 < len(out[0].points) < len(cloud10)


def test_feeders(tmp_path, cloud10):
    np.savez(tmp_path / "point_cloud_7.npz", pts=cloud10[:100])
    bus = Bus()
    clouds, poses = [], []
    bus.subscribe("/pts", clouds.append)
    bus.subscribe("/pose", poses.append)
    CloudFeederNode(
        bus, CloudFeederConfig(output_topic="/pts", pc_index=7, data_dir=str(tmp_path))
    ).tick()
    PoseFeederNode(
        bus, PoseFeederConfig(output_topic="/pose", x=1.0, y=2.0, z=3.0,
                              roll=0.0, pitch=0.0, yaw=0.0)
    ).tick()
    assert clouds[0].points.shape == (100, 3)
    np.testing.assert_allclose(poses[0].position, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(poses[0].orientation_xyzw, [0, 0, 0, 1], atol=1e-7)


def test_launch_pose_optimization_graph(tmp_path, cloud10):
    np.savez(tmp_path / "point_cloud_10.npz", pts=cloud10[::16])
    from trajectory_optimization_tpu.bus.launch import launch_pose_optimization

    launch = launch_pose_optimization(data_dir=str(tmp_path))
    launch.nodes["pose_opt"].cfg.opt_steps = 8
    launch.nodes["pose_opt"].cfg.num_pub_samples = 2
    results = []
    launch.bus.subscribe("/odom", results.append)
    launch.step()
    assert results, "pose optimizer produced no odometry"


def test_cli_entry_point(tmp_path, cloud10, path10, capsys):
    """`python -m trajectory_optimization_tpu` (bus/__main__): presets run
    with rosparam-style overrides, bag replay feeds the graph, and the
    summary reports output-topic counts."""
    from trajectory_optimization_tpu.__main__ import main
    from trajectory_optimization_tpu.bus.messages import CloudMsg, PathMsg, Header
    from trajectory_optimization_tpu.bus.rosbag import write_bag

    np.savez(tmp_path / "point_cloud_10.npz", pts=cloud10[::16])
    rc = main(["pose_optimization", "opt_steps=6", "num_pub_samples=2",
               "--steps", "1", "--data-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0 and "/odom:" in out
    n = int(out.rsplit("/odom:", 1)[1].split()[0])
    assert n > 0, out

    q = np.zeros((len(path10), 4), np.float64)
    q[:, 3] = 1.0
    hdr = Header(stamp=1.0, frame_id="map")
    bag = str(tmp_path / "cli.bag")
    write_bag(bag, [("/pc", CloudMsg(hdr, cloud10[::16])),
                    ("/path", PathMsg(hdr, path10, q))])
    # pipeline_depth=3 with a single pair: the result sits in-flight until
    # Launch.close() flushes the node — the summary must still count it.
    # --record (rosbag-record -a equivalent) captures inputs AND outputs.
    rec = str(tmp_path / "rec.bag")
    rc = main(["trajectory_optimization", "pc_topic=/pc", "path_topic=/path",
               "opt_steps=4", "pipeline_depth=3", "--play", bag,
               "--record", rec])
    out = capsys.readouterr().out
    assert rc == 0 and "/path/optimized: 1 msgs" in out, out
    assert "recorded" in out, out
    from trajectory_optimization_tpu.bus.rosbag import read_bag

    topics = {t for _, t, _ in read_bag(rec)}
    assert "/path/optimized" in topics and "/pc" in topics, topics

    # topic overrides rewire the pose preset's feeder/filter chain too
    rc = main(["pose_optimization", "opt_steps=6", "num_pub_samples=2",
               "pc_topic=/cloud", "pose_topic=/p0", "--steps", "1",
               "--data-dir", str(tmp_path)])
    out = capsys.readouterr().out
    n = int(out.rsplit("/odom:", 1)[1].split()[0])
    assert rc == 0 and n > 0, out

    rc = main(["voxels_filtering", "input_topic=/pc", "output_topic=/vox",
               "leaf_size=0.3", "--play", bag])
    out = capsys.readouterr().out
    assert rc == 0 and "/vox: 1 msgs" in out, out

    with pytest.raises(SystemExit):
        main(["play_bag"])  # requires --play


def test_opt_nodes_soft_hpr_config(cloud10, path10):
    """use_soft_hpr=True threads PoseProblem/TrajProblem.soft_hpr through
    both optimizer nodes: full callbacks, occlusion recomputed
    differentiably inside every step."""
    bus = Bus()
    tnode = TrajOptNode(
        bus,
        TrajOptNodeConfig(
            pc_topic="/pc", path_topic="/path", opt_steps=4,
            lr_pose=0.1, lr_quat=0.02, use_soft_hpr=True,
        ),
    )
    pnode = PoseOptNode(
        bus,
        PoseOptNodeConfig(
            pc_topic="/pc", pose_topic="/pose", opt_steps=4,
            num_pub_samples=2, use_soft_hpr=True,
        ),
    )
    outputs = {}
    odoms = []
    bus.subscribe("/path/optimized", lambda m: outputs.setdefault("path", m))
    bus.subscribe("/odom", odoms.append)  # PoseOptNode's output topic

    sub = cloud10[::16]  # small: the dense differentiable tier
    bus.publish("/pc", CloudMsg(Header(stamp=1.0, frame_id="map"), sub))
    bus.publish("/path", PathMsg.straight(path10, frame_id="map", stamp=1.2))
    bus.publish(
        "/pose",
        PoseMsg(
            Header(stamp=1.1, frame_id="map"),
            np.array([6.0, 2.0, 0.0], np.float32),
            np.array([1.0, 0.0, 0.0, 0.0], np.float32),
        ),
    )

    assert bus.errors == [], bus.errors
    assert "path" in outputs and odoms
    assert np.isfinite(outputs["path"].positions).all()
    assert np.isfinite(odoms[-1].position).all()
    assert tnode.last_result["mean_reward"] > 0
    assert pnode.last_result is not None
