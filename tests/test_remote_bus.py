"""Cross-process scene bus (bus.remote): the reference's node-per-process
runtime shape (`launch/pose_optimization.launch:13-60` runs feeders, the
voxel nodelet, and the optimizer as separate OS processes over TCPROS).

These tests spawn REAL OS processes; frames cross unix sockets using the
bag wire codecs.
"""
import time

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.core import Bus
from trajectory_optimization_tpu.bus.messages import (
    CameraInfoMsg,
    CloudMsg,
    Header,
    ImageMsg,
    PathMsg,
    PoseMsg,
    TransformMsg,
)
from trajectory_optimization_tpu.bus.remote import BusBridge, BusBroker, NodeProcess


def _wait(pred, timeout=30.0, dt=0.02):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(dt)
    return pred()


def test_bridge_roundtrip_all_codecs():
    """Every wire-codec message type crosses bridged buses intact."""
    rng = np.random.default_rng(0)
    with BusBroker() as broker:
        a, b = Bus(), Bus()
        ba = BusBridge(a, broker.address, name="A")
        bb = BusBridge(b, broker.address, name="B")
        assert broker.wait_for_clients(2, timeout=10)
        got = {}
        for t in ("/pc", "/pose", "/path", "/tf", "/img"):
            b.subscribe(t, lambda m, t=t: got.setdefault(t, m))

        pts = rng.normal(size=(64, 4)).astype(np.float32)
        a.publish("/pc", CloudMsg(Header(stamp=1.0, frame_id="map"), pts))
        a.publish("/pose", PoseMsg(Header(stamp=1.1, frame_id="map"),
                                   [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0]))
        a.publish("/path", PathMsg.straight(
            rng.normal(size=(5, 3)).astype(np.float32), frame_id="map", stamp=1.2))
        a.publish("/tf", TransformMsg(Header(stamp=1.3, frame_id="map"), "X1",
                                      np.array([0.5, 0.0, 0.2]),
                                      np.array([0.0, 0.0, 0.0, 1.0])))
        a.publish("/img", ImageMsg(Header(stamp=1.4, frame_id="cam"),
                                   rng.integers(0, 255, (6, 8, 3)).astype(np.uint8),
                                   encoding="rgb8"))
        assert _wait(lambda: len(got) == 5, 10), f"only {sorted(got)} arrived"
        np.testing.assert_allclose(np.asarray(got["/pc"].points), pts, rtol=1e-6)
        assert got["/pc"].header.frame_id == "map"
        np.testing.assert_allclose(got["/pose"].position, [1.0, 2.0, 3.0])
        assert got["/tf"].child_frame_id == "X1"
        assert got["/img"].data.shape == (6, 8, 3)
        # no echo loops: each bridge exported exactly its 5 local publishes
        time.sleep(0.1)
        assert ba.n_sent == 5 and bb.n_sent == 0
        ba.close()
        bb.close()


def test_bridge_export_filter_and_internal_topics():
    with BusBroker() as broker:
        a, b = Bus(), Bus()
        ba = BusBridge(a, broker.address, name="A", export={"/yes"})
        bb = BusBridge(b, broker.address, name="B")
        assert broker.wait_for_clients(2, timeout=10)
        got = []
        b.subscribe("/yes", got.append)
        b.subscribe("/no", got.append)
        a.publish("/no", PoseMsg(Header(stamp=1.0, frame_id="m"), [0, 0, 0],
                                 [0, 0, 0, 1]))
        a.publish("/__internal", PoseMsg(Header(stamp=1.0, frame_id="m"),
                                         [0, 0, 0], [0, 0, 0, 1]))
        a.publish("/yes", PoseMsg(Header(stamp=2.0, frame_id="m"), [1, 1, 1],
                                  [0, 0, 0, 1]))
        assert _wait(lambda: len(got) == 1, 10)
        time.sleep(0.1)
        assert len(got) == 1 and got[0].header.stamp == 2.0
        assert ba.n_sent == 1
        ba.close()
        bb.close()


def test_bridge_over_tcp():
    """TCP addresses work identically to unix sockets (the multi-host
    transport mode; a (host, port) broker spans machines)."""
    with BusBroker(("127.0.0.1", 0)) as broker:
        assert isinstance(broker.address, tuple) and broker.address[1] > 0
        a, b = Bus(), Bus()
        ba = BusBridge(a, broker.address, name="A")
        bb = BusBridge(b, broker.address, name="B")
        assert broker.wait_for_clients(2, timeout=10)
        got = []
        b.subscribe("/p", got.append)
        a.publish("/p", PoseMsg(Header(stamp=1.0, frame_id="m"), [1, 2, 3],
                                [0, 0, 0, 1]))
        assert _wait(lambda: got, 10)
        np.testing.assert_allclose(got[0].position, [1.0, 2.0, 3.0])
        ba.close()
        bb.close()


def test_broker_survives_client_churn():
    """A client dying mid-stream (the reference's crashing-ROS-node case)
    must not take down the broker or the surviving subscribers."""
    with BusBroker() as broker:
        a, b = Bus(), Bus()
        ba = BusBridge(a, broker.address, name="A")
        bb = BusBridge(b, broker.address, name="B")
        c = Bus()
        bc = BusBridge(c, broker.address, name="C")
        assert broker.wait_for_clients(3, timeout=10)
        got_b, got_c = [], []
        b.subscribe("/p", got_b.append)
        c.subscribe("/p", got_c.append)

        def send(stamp):
            a.publish("/p", PoseMsg(Header(stamp=stamp, frame_id="m"),
                                    [stamp, 0, 0], [0, 0, 0, 1]))

        send(1.0)
        assert _wait(lambda: got_b and got_c, 10)
        # C dies abruptly (socket close, no goodbye)
        bc._sock.close()
        for k in range(20):
            send(2.0 + k)
        assert _wait(lambda: len(got_b) >= 21, 10), len(got_b)
        time.sleep(0.2)
        assert broker.n_clients() == 2  # C reaped
        # B still healthy and ordered
        stamps = [m.header.stamp for m in got_b]
        assert stamps == sorted(stamps)
        ba.close()
        bb.close()


def test_broker_drop_oldest_backpressure():
    """A slow subscriber loses its OLDEST frames (ROS queue_size semantics)
    instead of deadlocking the broker (bounded outbox)."""
    with BusBroker(queue_size=4) as broker:
        a, b = Bus(), Bus()
        ba = BusBridge(a, broker.address, name="A")
        blocked = []
        block = [True]

        def slow_cb(m):
            while block[0]:
                time.sleep(0.01)
            blocked.append(m)

        b.subscribe("/p", slow_cb)
        bb = BusBridge(b, broker.address, name="B")
        assert broker.wait_for_clients(2, timeout=10)
        for k in range(40):
            a.publish("/p", PoseMsg(Header(stamp=float(k), frame_id="m"),
                                    [float(k), 0, 0], [0, 0, 0, 1]))
        time.sleep(0.3)
        block[0] = False
        assert _wait(lambda: ba.n_sent == 40, 10)
        assert _wait(lambda: len(blocked) >= 2, 10)
        time.sleep(0.5)
        # far fewer than 40 delivered; the NEWEST survived
        assert len(blocked) < 40
        assert blocked[-1].header.stamp == 39.0
        ba.close()
        bb.close()


@pytest.mark.slow
def test_trajopt_node_cross_process(cloud10, path10):
    """launch_trajectory_optimization(processes=True): the optimizer runs in
    its own OS process; inputs/outputs cross the socket; the optimized path
    matches the in-process graph on the same inputs."""
    from trajectory_optimization_tpu.bus.launch import launch_trajectory_optimization
    from trajectory_optimization_tpu.utils.config import TrajOptNodeConfig

    cfg = TrajOptNodeConfig(pc_topic="/pc", path_topic="/path", opt_steps=8,
                            lr_pose=0.1, lr_quat=0.02)
    cloud = CloudMsg(Header(stamp=1.0, frame_id="map"), cloud10[::16])
    path = PathMsg.straight(path10, frame_id="map", stamp=1.2)

    # in-process result for comparison
    ref_launch = launch_trajectory_optimization(overrides=cfg)
    ref_out = []
    ref_launch.bus.subscribe("/path/optimized", ref_out.append)
    ref_launch.bus.publish("/pc", cloud)
    ref_launch.bus.publish("/path", path)
    assert ref_out

    with launch_trajectory_optimization(overrides=cfg, processes=True) as launch:
        assert launch.nodes["traj_opt"].alive()
        out = []
        launch.bus.subscribe("/path/optimized", out.append)
        launch.bus.publish("/pc", cloud)
        launch.bus.publish("/path", path)
        # worker compiles its kernels on first message (persistent cache
        # makes repeats fast); allow a generous first-run window
        assert _wait(lambda: out, timeout=240), "no optimized path from process"
        got = out[0]
        assert got.positions.shape == path10.shape
        np.testing.assert_allclose(
            np.asarray(got.positions), np.asarray(ref_out[0].positions),
            rtol=0, atol=1e-5)
    assert _wait(lambda: not launch.nodes["traj_opt"].alive(), timeout=20)


def test_crashed_worker_fails_fast():
    """A worker that dies before HELLO (bad node class here; bad import /
    missing __main__ guard in the wild) must surface promptly as
    RuntimeError via the liveness poll, not burn the full 120 s attach
    budget."""
    import time

    from trajectory_optimization_tpu.bus.launch import _attach_process_graph

    with BusBroker() as broker:
        proc = NodeProcess("NoSuchNodeClass", None, broker.address)
        bus = Bus()
        t0 = time.monotonic()
        with pytest.raises(RuntimeError, match="died before attaching"):
            _attach_process_graph(bus, broker, [proc], 2)
        assert time.monotonic() - t0 < 60, "liveness poll did not fire"


@pytest.mark.slow
def test_points_processor_cross_process(cloud10):
    """PointsProcessor in its own OS process: TF (list-decoded TFMessage),
    camera info, and the cloud all cross the socket; culled/visible clouds
    come back on the parent bus (reference pc_processor as a ROS node)."""
    from trajectory_optimization_tpu.utils.config import PointsProcessorConfig
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    with BusBroker() as broker:
        proc = NodeProcess("PointsProcessorNode", PointsProcessorConfig(
            pc_topic="/cloud", cam_info_topics=("/cam0/info",),
            hpr_backend="approx", render=False), broker.address)
        bus = Bus()
        bridge = BusBridge(bus, broker.address, name="parent")
        try:
            assert broker.wait_for_clients(2, timeout=60)
            outputs = {}
            bus.subscribe("/cam0/pointcloud",
                          lambda m: outputs.setdefault("culled", m))
            bus.subscribe("/cam0/pointcloud_visible",
                          lambda m: outputs.setdefault("visible", m))
            bus.publish("/tf_static", TransformMsg(
                Header(stamp=0.0, frame_id="world"), "cam0",
                np.array([6.0, 2.0, -3.0]), np.array([0.0, 0.0, 0.0, 1.0])))
            time.sleep(0.3)  # static TF must land before the rig flushes
            bus.publish("/cloud", CloudMsg(Header(stamp=1.0, frame_id="world"),
                                           cloud10))
            intr = default_intrinsics()
            bus.publish("/cam0/info", CameraInfoMsg(
                Header(stamp=1.0, frame_id="cam0"),
                int(intr.width), int(intr.height),
                K=tuple(intr.matrix_np(np.float64).reshape(-1))))
            assert _wait(lambda: "visible" in outputs and "culled" in outputs,
                         timeout=240), sorted(outputs)
            n_culled = len(outputs["culled"].points)
            n_visible = len(outputs["visible"].points)
            assert 0 < n_visible <= n_culled < len(cloud10)
        finally:
            bridge.close()
            proc.terminate()


@pytest.mark.slow
def test_pose_graph_cross_process(tmp_path, cloud10):
    """The pose_optimization launch topology as real processes: local
    feeders -> [voxel filter process] -> [pose optimizer process] -> /odom
    back on the parent bus (reference launch/pose_optimization.launch)."""
    from trajectory_optimization_tpu.bus.nodes import CloudFeederNode, PoseFeederNode
    from trajectory_optimization_tpu.utils.config import (
        CloudFeederConfig,
        PoseFeederConfig,
        PoseOptNodeConfig,
        VoxelFilterConfig,
    )

    np.savez(tmp_path / "point_cloud_10.npz", pts=cloud10[::16])
    with BusBroker() as broker:
        filt = NodeProcess("VoxelFilterNode", VoxelFilterConfig(
            input_topic="/pts_raw", output_topic="/pts", leaf_size=0.15),
            broker.address)
        opt = NodeProcess("PoseOptNode", PoseOptNodeConfig(
            pc_topic="/pts", pose_topic="/pose", opt_steps=6,
            num_pub_samples=2, lr_pose=0.02, lr_quat=0.02), broker.address)
        bus = Bus()
        bridge = BusBridge(bus, broker.address, name="parent")
        try:
            assert broker.wait_for_clients(3, timeout=60)
            feeder_c = CloudFeederNode(bus, CloudFeederConfig(
                output_topic="/pts_raw", data_dir=str(tmp_path)))
            feeder_p = PoseFeederNode(bus, PoseFeederConfig(output_topic="/pose"))
            results = []
            bus.subscribe("/odom", results.append)
            t0 = time.time()
            while not results and time.time() - t0 < 240:
                feeder_c.tick()
                feeder_p.tick()
                time.sleep(0.5)
            assert results, "pose optimizer process produced no odometry"
            assert np.isfinite(np.asarray(results[0].position)).all()
        finally:
            bridge.close()
            filt.terminate()
            opt.terminate()
