"""ROS1 .bag container roundtrips (bus.rosbag) — real-bag replay parity
(reference `launch/play_bag.launch`, SURVEY.md §4.4)."""
import struct

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.core import Bus
from trajectory_optimization_tpu.bus.messages import (
    CameraInfoMsg,
    CloudMsg,
    Header,
    ImageMsg,
    OdometryMsg,
    PathMsg,
    PoseMsg,
    TransformMsg,
)
from trajectory_optimization_tpu.bus.rosbag import (
    MAGIC,
    BagPlayer,
    BagRecorder,
    open_player,
    read_bag,
    write_bag,
)


def _sample_messages():
    rng = np.random.default_rng(0)
    cloud = CloudMsg(Header(stamp=1.0, frame_id="map"), rng.normal(size=(100, 4)).astype(np.float32))
    pose = PoseMsg(Header(stamp=1.1, frame_id="map"), [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0])
    path = PathMsg(Header(stamp=1.2, frame_id="map"),
                   rng.normal(size=(5, 3)), np.tile([0.0, 0.0, 0.0, 1.0], (5, 1)))
    odom = OdometryMsg(Header(stamp=1.3, frame_id="map"), np.array([4.0, 5.0, 6.0]),
                       np.array([0.0, 0.0, 0.0, 1.0]), child_frame_id="base")
    info = CameraInfoMsg(Header(stamp=1.4, frame_id="cam0"), 1232, 1616,
                         K=(758.04, 0.0, 621.47, 0.0, 761.62, 756.86, 0.0, 0.0, 1.0),
                         D=(0.1, -0.2, 0.0, 0.0, 0.0))
    img = ImageMsg(Header(stamp=1.5, frame_id="cam0"),
                   rng.integers(0, 255, size=(8, 16, 3), dtype=np.uint8).astype(np.uint8),
                   encoding="rgb8")
    tf = TransformMsg(Header(stamp=1.6, frame_id="map"), "base",
                      np.array([0.5, 0.0, 0.2]), np.array([0.0, 0.0, 0.0, 1.0]))
    return [("/pts", cloud), ("/pose", pose), ("/path", path), ("/odom", odom),
            ("/cam0/info", info), ("/cam0/image", img), ("/tf", tf)]


def test_decode_compressed_image_passthrough():
    """The reference bag's sensor_msgs/CompressedImage streams decode to an
    ImageMsg carrying the raw codec payload (no image codec in this image)."""
    from trajectory_optimization_tpu.bus.messages import Header
    from trajectory_optimization_tpu.bus.rosbag import _Writer, _decode_compressed_image

    w = _Writer()
    w.header(Header(stamp=3.5, frame_id="camera_0", seq=7))
    w.string("jpeg")
    blob = bytes(range(64))
    w.u32(len(blob))
    w.raw(blob)
    msg = _decode_compressed_image(w.bytes())
    assert msg.encoding == "jpeg"
    assert msg.header.frame_id == "camera_0" and msg.header.stamp == 3.5
    assert bytes(msg.data) == blob


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip_all_types(tmp_path, compression):
    msgs = _sample_messages()
    path = str(tmp_path / f"test_{compression}.bag")
    n = write_bag(path, msgs, compression=compression)
    assert n == len(msgs)
    with open(path, "rb") as f:
        assert f.read(len(MAGIC)) == MAGIC

    got = list(read_bag(path))
    assert len(got) == len(msgs)
    by_topic = {topic: m for _, topic, m in got}

    cloud0 = msgs[0][1]
    np.testing.assert_allclose(by_topic["/pts"].points, cloud0.points, atol=1e-6)
    assert by_topic["/pts"].header.frame_id == "map"
    assert abs(by_topic["/pts"].header.stamp - 1.0) < 1e-6

    np.testing.assert_allclose(by_topic["/pose"].position, [1, 2, 3])
    np.testing.assert_allclose(by_topic["/path"].positions, msgs[2][1].positions)
    np.testing.assert_allclose(by_topic["/odom"].position, [4, 5, 6])
    assert by_topic["/odom"].child_frame_id == "base"

    info = by_topic["/cam0/info"]
    assert (info.width, info.height) == (1232, 1616)
    np.testing.assert_allclose(info.K[:3], (758.04, 0.0, 621.47))
    np.testing.assert_allclose(info.D, (0.1, -0.2, 0.0, 0.0, 0.0))

    np.testing.assert_array_equal(by_topic["/cam0/image"].data, msgs[5][1].data)
    assert by_topic["/cam0/image"].encoding == "rgb8"

    tf = by_topic["/tf"]
    assert tf.child_frame_id == "base"
    np.testing.assert_allclose(tf.translation, [0.5, 0.0, 0.2])


def test_bag_float_image_roundtrip(tmp_path):
    """Non-uint8 images must keep pixel width/dtype on the wire (width is in
    PIXELS, step in BYTES — the sensor_msgs/Image contract)."""
    rng = np.random.default_rng(1)
    depth = ImageMsg(Header(stamp=2.0, frame_id="cam"),
                     rng.normal(size=(4, 6)).astype(np.float32), encoding="32FC1")
    rgbf = ImageMsg(Header(stamp=2.1, frame_id="cam"),
                    rng.random(size=(8, 16, 3)).astype(np.float32), encoding="rgb32f")
    path = str(tmp_path / "img.bag")
    write_bag(path, [("/depth", depth), ("/rgbf", rgbf)])
    by_topic = {topic: m for _, topic, m in read_bag(path)}
    np.testing.assert_array_equal(by_topic["/depth"].data, depth.data)
    assert by_topic["/depth"].data.dtype == np.float32
    np.testing.assert_array_equal(by_topic["/rgbf"].data, rgbf.data)
    assert by_topic["/rgbf"].data.shape == (8, 16, 3)


def test_bag_streaming_player(tmp_path):
    msgs = _sample_messages()
    path = str(tmp_path / "s.bag")
    write_bag(path, msgs)
    player = BagPlayer(path, streaming=True)
    with pytest.raises(TypeError):
        len(player)
    bus = Bus(error_policy="raise")
    got = []
    bus.subscribe("/pose", got.append)
    assert player.play(bus) == len(msgs)
    assert len(got) == 1
    # a streaming player can replay repeatedly (fresh iterator each play)
    assert player.play(bus) == len(msgs)


def test_bag_player_abort_releases_prefetch_thread(tmp_path):
    """An aborted play() must not leak the prefetch reader blocked in
    q.put (it would pin the open bag file inside the suspended read_bag
    generator frame in a long-lived serving process)."""
    import threading
    import time

    msgs = [("/pose", PoseMsg(Header(stamp=float(i), frame_id="m"),
                              [float(i), 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]))
            for i in range(64)]
    path = str(tmp_path / "abort.bag")
    write_bag(path, msgs)

    class _Boom:
        def __init__(self):
            self.n = 0

        def publish(self, topic, msg):
            self.n += 1
            if self.n >= 2:
                raise RuntimeError("consumer abort")

    player = BagPlayer(path, streaming=True)
    with pytest.raises(RuntimeError, match="consumer abort"):
        player.play(_Boom(), prefetch=4)
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline and any(
            t.name == "bag-prefetch" for t in threading.enumerate()):
        time.sleep(0.05)
    assert not any(t.name == "bag-prefetch" for t in threading.enumerate())


def test_bag_player_no_prefetch_thread_when_materialized(tmp_path):
    """Non-streaming players decoded everything in __init__ — play() must
    not spawn a reader thread just to shuttle a list through a queue."""
    import threading

    msgs = _sample_messages()
    path = str(tmp_path / "mat.bag")
    write_bag(path, msgs)

    seen = []

    class _Check:
        def publish(self, topic, msg):
            seen.append(any(t.name == "bag-prefetch"
                            for t in threading.enumerate()))

    n = BagPlayer(path).play(_Check())
    assert n == len(msgs) and seen and not any(seen)


def test_bag_recorder_incremental_chunks(tmp_path):
    """Recorder flushes through BagWriter chunks: multi-chunk bags read back
    completely and a pre-close crash keeps the flushed chunks on disk."""
    from trajectory_optimization_tpu.bus.rosbag import BagWriter

    bus = Bus(error_policy="raise")
    path = str(tmp_path / "inc.bag")
    rng = np.random.default_rng(0)
    with BagRecorder(bus, ["/pts"], path) as rec:
        for i in range(12):  # ~3.5 MB of clouds → several 1 MB chunks
            bus.publish("/pts", CloudMsg(Header(stamp=float(i), frame_id="m"),
                                         rng.normal(size=(25000, 3)).astype(np.float32)))
        rec.flush()  # writer thread: drain the queue before inspecting
        assert rec._writer._chunk_infos  # chunks flushed before close
    got = list(read_bag(path))
    assert len(got) == 12
    assert [round(t) for t, _, _ in got] == list(range(12))


def test_bag_topic_filter_and_order(tmp_path):
    msgs = _sample_messages()
    path = str(tmp_path / "f.bag")
    write_bag(path, msgs)
    got = list(read_bag(path, topics=["/pose", "/tf"]))
    assert [topic for _, topic, _ in got] == ["/pose", "/tf"]
    # bag times carry the header stamps here
    assert got[0][0] < got[1][0]


def test_bag_player_onto_bus(tmp_path):
    msgs = _sample_messages()
    path = str(tmp_path / "p.bag")
    write_bag(path, msgs)
    player = open_player(path)
    assert isinstance(player, BagPlayer) and len(player) == len(msgs)
    bus = Bus(error_policy="raise")
    seen = []
    for t in ("/pts", "/pose", "/tf"):
        bus.subscribe(t, seen.append)
    n = player.play(bus)
    assert n == len(msgs)
    assert len(seen) == 3


def test_bag_recorder(tmp_path):
    bus = Bus(error_policy="raise")
    path = str(tmp_path / "rec.bag")
    with BagRecorder(bus, ["/pts"], path):
        bus.publish("/pts", CloudMsg(Header(stamp=2.0, frame_id="m"), np.ones((7, 3), np.float32)))
        bus.publish("/other", PoseMsg(Header(stamp=2.1), [0, 0, 0], [0, 0, 0, 1]))
    got = list(read_bag(path))
    assert len(got) == 1 and got[0][1] == "/pts"
    assert got[0][2].points.shape == (7, 3)


def test_bag_recorder_all_topics(tmp_path):
    """topics=None = `rosbag record -a`: every topic lands via the bus tap
    (internal /__ topics excluded), unserializable messages are counted in
    `skipped` instead of raising into the publisher, and the recorded bag
    replays back in publish order."""
    bus = Bus(error_policy="raise")
    path = str(tmp_path / "all.bag")
    with BagRecorder(bus, None, path) as rec:
        bus.publish("/pts", CloudMsg(Header(stamp=1.0, frame_id="m"),
                                     np.ones((5, 3), np.float32)))
        bus.publish("/pose", PoseMsg(Header(stamp=1.1), [1, 2, 3],
                                     [0, 0, 0, 1]))
        bus.publish("/__errors__", {"not": "a bag message"})  # internal
        bus.publish("/weird", object())  # no bag encoding -> skipped
        rec.flush()
        assert rec.count == 2 and rec.skipped == 1
    got = list(read_bag(path))
    assert [t for _, t, _ in got] == ["/pts", "/pose"]


def test_bag_skips_unknown_connection_types(tmp_path):
    """A connection of an unsupported type must be skipped, not crash."""
    from trajectory_optimization_tpu.bus import rosbag as rb

    path = str(tmp_path / "u.bag")
    write_bag(path, [("/pose", PoseMsg(Header(stamp=1.0), [0, 0, 0], [0, 0, 0, 1]))])
    # append an unchunked record pair for a bogus type at top level
    with open(path, "ab") as f:
        conn_hdr = rb._pack_header({"topic": b"/weird", "type": b"foo_msgs/Bar",
                                    "md5sum": b"0", "message_definition": b""})
        rec_hdr = rb._pack_header({"op": bytes([0x07]), "conn": struct.pack("<I", 99),
                                   "topic": b"/weird"})
        f.write(struct.pack("<I", len(rec_hdr)) + rec_hdr)
        f.write(struct.pack("<I", len(conn_hdr)) + conn_hdr)
        msg_hdr = rb._pack_header({"op": bytes([0x02]), "conn": struct.pack("<I", 99),
                                   "time": rb._time_bytes(3.0)})
        f.write(struct.pack("<I", len(msg_hdr)) + msg_hdr)
        f.write(struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    got = list(read_bag(path))
    assert [topic for _, topic, _ in got] == ["/pose"]


def test_bag_moving_robot_tf_replay(tmp_path):
    """Replay a moving-robot bag: TF transforms land in a FrameGraph with
    stamps, and time-indexed lookups recover the poses at cloud times."""
    from trajectory_optimization_tpu.bus.frames import FrameGraph

    msgs = []
    for i in range(5):
        t = float(i)
        msgs.append(("/tf", TransformMsg(Header(stamp=t, frame_id="map"), "base",
                                         np.array([2.0 * i, 0.0, 0.0]),
                                         np.array([0.0, 0.0, 0.0, 1.0]))))
        msgs.append(("/pts", CloudMsg(Header(stamp=t + 0.5, frame_id="base"),
                                      np.ones((4, 3), np.float32))))
    path = str(tmp_path / "tf.bag")
    write_bag(path, msgs)

    bus = Bus(error_policy="raise")
    fg = FrameGraph()
    bus.subscribe("/tf", lambda m: fg.set_transform(
        m.header.frame_id, m.child_frame_id, m.translation, m.rotation_xyzw,
        stamp=m.header.stamp))
    clouds = []
    bus.subscribe("/pts", clouds.append)
    BagPlayer(path).play(bus)
    assert len(clouds) == 5
    # at cloud stamp 2.5 the robot sat between x=4 (t=2) and x=6 (t=3)
    t_, _ = fg.lookup("map", "base", time=2.5)
    np.testing.assert_allclose(t_, [5.0, 0.0, 0.0], atol=1e-9)


# ---------------------------------------------------------------------------
# bag introspection — rosbag info equivalent (reference launch/rosbag_info.txt)
# ---------------------------------------------------------------------------


def test_bag_info_summary(tmp_path):
    """bag_info scans headers + index records only and reproduces the
    rosbag-info view: counts, span, types, per-topic rows, compression."""
    from trajectory_optimization_tpu.bus.rosbag import bag_info

    msgs = []
    for i in range(20):  # /pts at 10 Hz, /pose at 5 Hz
        msgs.append(("/pts", CloudMsg(Header(stamp=1000.0 + 0.1 * i, frame_id="map"),
                                      np.ones((50, 3), np.float32))))
        if i % 2 == 0:
            msgs.append(("/pose", PoseMsg(Header(stamp=1000.0 + 0.2 * (i // 2),
                                                 frame_id="map"),
                                          [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])))
    path = str(tmp_path / "info.bag")
    write_bag(path, msgs, compression="bz2")

    info = bag_info(path)
    assert info.version == "2.0"
    assert info.messages == len(msgs) == 30
    assert info.start == pytest.approx(1000.0)
    assert info.end == pytest.approx(1001.9)
    assert info.duration == pytest.approx(1.9)
    assert info.chunk_count >= 1
    assert info.compression == {"bz2": info.chunk_count}
    assert 0 < info.compressed < info.uncompressed
    assert info.types["sensor_msgs/PointCloud2"]  # md5 present
    assert info.types["geometry_msgs/PoseStamped"]
    by_topic = {t.topic: t for t in info.topics}
    assert by_topic["/pts"].count == 20
    assert by_topic["/pts"].ros_type == "sensor_msgs/PointCloud2"
    assert by_topic["/pts"].frequency == pytest.approx(10.0, rel=1e-6)
    assert by_topic["/pose"].count == 10
    assert by_topic["/pose"].frequency == pytest.approx(5.0, rel=1e-6)

    import re

    text = info.format()
    assert "version:" in text and "2.0" in text
    assert re.search(r"messages:\s+30\b", text)
    assert "/pts" in text and "sensor_msgs/PointCloud2" in text
    assert "compression:" in text and "bz2" in text
    assert "duration:" in text and "start:" in text and "end:" in text


def test_bag_info_never_decompresses(tmp_path, monkeypatch):
    """The scan must seek past chunk payloads — a 15 GB bag summarizes in
    seconds only if bz2/lz4 decompression never runs."""
    import bz2 as _bz2

    from trajectory_optimization_tpu.bus.rosbag import bag_info

    path = str(tmp_path / "sealed.bag")
    write_bag(path, _sample_messages(), compression="bz2")

    def _boom(*a, **k):  # pragma: no cover - the assertion IS the test
        raise AssertionError("bag_info decompressed a chunk")

    monkeypatch.setattr(_bz2, "decompress", _boom)
    info = bag_info(path)
    assert info.messages == len(_sample_messages())


def test_bag_info_crash_tail(tmp_path):
    """A recording cut off before the trailing index section (worker crash)
    still reports counts/times from the per-chunk index records; topic
    names (trailing connection records) are the only loss."""
    from trajectory_optimization_tpu.bus.rosbag import BagWriter, bag_info

    path = str(tmp_path / "crash.bag")
    w = BagWriter(path)
    big = CloudMsg(Header(stamp=5.0, frame_id="map"),
                   np.ones((60000, 3), np.float32))  # ~720 KB/msg
    for i in range(3):  # crosses the ~1 MB chunk target -> >=1 flushed chunk
        w.add("/pts", CloudMsg(Header(stamp=5.0 + i, frame_id="map"), big.points))
    flushed_chunks = len(w._chunk_infos)
    flushed_msgs = sum(sum(c.values()) for _, _, _, c in w._chunk_infos)
    assert flushed_chunks >= 1
    w._f.close()  # simulate a crash: no trailing connection/index section

    info = bag_info(path)
    assert info.chunk_count == flushed_chunks
    assert info.messages == flushed_msgs
    assert info.start == pytest.approx(5.0)
    assert info.topics == []  # names were only in the (missing) trailer
    assert "messages:" in info.format()


def test_bag_info_bad_magic(tmp_path):
    from trajectory_optimization_tpu.bus.rosbag import bag_info

    path = tmp_path / "not_a_bag.bag"
    path.write_bytes(b"PK\x03\x04 definitely a zip")
    with pytest.raises(ValueError, match="bad magic"):
        bag_info(str(path))


def test_cli_info(tmp_path, capsys):
    """`python -m trajectory_optimization_tpu info PATH` prints the summary."""
    from trajectory_optimization_tpu.__main__ import main

    path = str(tmp_path / "cli.bag")
    write_bag(path, _sample_messages())
    assert main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "messages:" in out and "/pts" in out and "types:" in out

    assert main(["info", str(tmp_path / "missing.bag")]) == 1
    assert "info:" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# bag filtering — rosbag filter / compress / decompress equivalent
# ---------------------------------------------------------------------------


def test_filter_bag_topics_and_time(tmp_path):
    from trajectory_optimization_tpu.bus.rosbag import filter_bag

    msgs = []
    for i in range(10):
        msgs.append(("/pts", CloudMsg(Header(stamp=float(i), frame_id="map"),
                                      np.full((4, 3), i, np.float32))))
        msgs.append(("/pose", PoseMsg(Header(stamp=float(i) + 0.5, frame_id="map"),
                                      [float(i), 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])))
    src = str(tmp_path / "src.bag")
    write_bag(src, msgs)

    dst = str(tmp_path / "dst.bag")
    n = filter_bag(src, dst, topics=["/pts"], start=3.0, end=6.0)
    got = list(read_bag(dst))
    assert n == len(got) == 4  # stamps 3,4,5,6 inclusive both ends
    assert all(topic == "/pts" for _, topic, _ in got)
    assert [m.header.stamp for _, _, m in got] == [3.0, 4.0, 5.0, 6.0]
    np.testing.assert_array_equal(got[0][2].points, np.full((4, 3), 3, np.float32))


def test_filter_bag_recompress_roundtrip(tmp_path):
    """No filters + compression= is rosbag compress/decompress: messages
    survive none -> bz2 -> none with identical decoded content."""
    from trajectory_optimization_tpu.bus.rosbag import bag_info, filter_bag

    msgs = _sample_messages()
    src = str(tmp_path / "plain.bag")
    write_bag(src, msgs)

    packed = str(tmp_path / "packed.bag")
    assert filter_bag(src, packed, compression="bz2") == len(msgs)
    info = bag_info(packed)
    assert set(info.compression) == {"bz2"}
    assert info.messages == len(msgs)

    unpacked = str(tmp_path / "unpacked.bag")
    assert filter_bag(packed, unpacked) == len(msgs)
    a = list(read_bag(src))
    b = list(read_bag(unpacked))
    assert [(t, topic) for t, topic, _ in a] == [(t, topic) for t, topic, _ in b]
    np.testing.assert_array_equal(a[0][2].points, b[0][2].points)
    np.testing.assert_array_equal(
        [m.data for _, _, m in a if hasattr(m, "encoding")][0],
        [m.data for _, _, m in b if hasattr(m, "encoding")][0])


def test_filter_bag_preserves_unknown_types(tmp_path):
    """Records whose type this package can't decode must pass through
    byte-identical, with the source connection header (md5sum) preserved —
    rosbag filter keeps everything, so must we."""
    from trajectory_optimization_tpu.bus import rosbag as rb
    from trajectory_optimization_tpu.bus.rosbag import bag_info, filter_bag

    src = str(tmp_path / "mixed.bag")
    write_bag(src, [("/pose", _sample_messages()[1][1])])
    payload = b"\x13\x37" * 9
    with open(src, "r+b") as f:
        f.seek(0, 2)  # append unchunked records after the index section
        conn_hdr = rb._pack_header({"topic": b"/imu",
                                    "type": b"sensor_msgs/Imu",
                                    "md5sum": b"6a62c6daae103f4ff57a132d6f95cec2",
                                    "message_definition": b"original def"})
        rec_hdr = rb._pack_header({"op": bytes([0x07]),
                                   "conn": struct.pack("<I", 55),
                                   "topic": b"/imu"})
        f.write(struct.pack("<I", len(rec_hdr)) + rec_hdr)
        f.write(struct.pack("<I", len(conn_hdr)) + conn_hdr)
        msg_hdr = rb._pack_header({"op": bytes([0x02]),
                                   "conn": struct.pack("<I", 55),
                                   "time": rb._time_bytes(7.0)})
        f.write(struct.pack("<I", len(msg_hdr)) + msg_hdr)
        f.write(struct.pack("<I", len(payload)) + payload)

    dst = str(tmp_path / "copy.bag")
    assert filter_bag(src, dst) == 2  # pose + the foreign Imu record

    info = bag_info(dst)
    assert info.types["sensor_msgs/Imu"] == "6a62c6daae103f4ff57a132d6f95cec2"
    by_topic = {t.topic: t for t in info.topics}
    assert by_topic["/imu"].count == 1

    # the raw payload survives byte-identical inside the copy's chunk
    found = []
    with open(dst, "rb") as f:
        f.read(len(rb.MAGIC))
        while True:
            rec = rb._read_record_stream(f)
            if rec is None:
                break
            hdr, data = rec
            if hdr["op"][0] == 0x05:
                for _, chdr, cdata in rb._iter_records(rb._decompress_chunk(hdr, data)):
                    if chdr["op"][0] == 0x02:
                        found.append(cdata)
    assert payload in found


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_read_bag_topic_filter_skips_chunks(tmp_path, monkeypatch, compression):
    """A topics filter on an indexed bag must drive the scan off the
    trailing chunk-info records: chunks with no wanted messages are seeked
    past, never decompressed — replaying one sparse topic out of a session
    bag costs I/O proportional to the topic, not the 15 GB file."""
    from trajectory_optimization_tpu.bus import rosbag as rb

    path = str(tmp_path / "two.bag")
    big = np.ones((60000, 3), np.float32)  # ~720 KB/cloud -> several chunks
    msgs = [("/pts", CloudMsg(Header(stamp=float(i), frame_id="map"), big))
            for i in range(6)]
    msgs.append(("/pose", PoseMsg(Header(stamp=99.0, frame_id="map"),
                                  [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0])))
    write_bag(path, msgs, compression=compression)
    from trajectory_optimization_tpu.bus.rosbag import bag_info
    n_chunks = bag_info(path).chunk_count
    assert n_chunks >= 3  # the clouds alone span multiple chunks

    calls = []
    orig = rb._decompress_chunk
    monkeypatch.setattr(rb, "_decompress_chunk",
                        lambda h, d: (calls.append(1), orig(h, d))[1])
    got = list(read_bag(path, topics=["/pose"]))
    assert [(t, m.header.stamp) for _, t, m in got] == [("/pose", 99.0)]
    assert len(calls) < n_chunks, "filtered read decompressed every chunk"

    # unknown topic: resolved from the index alone, zero chunks touched
    calls.clear()
    assert list(read_bag(path, topics=["/nope"])) == []
    assert not calls

    # the indexed path returns exactly what the full scan would
    full = [(t, m.header.stamp) for _, t, m in read_bag(path)
            if t == "/pts"]
    filt = [(t, m.header.stamp) for _, t, m in read_bag(path, topics=["/pts"])]
    assert filt == full


@pytest.mark.parametrize("streaming", [False, True])
def test_bag_player_loop_start_duration(tmp_path, streaming):
    """rosbag play -l/-s/-u semantics: skip the first `start` seconds of
    bag time, stop `duration` seconds after that offset, repeat `loop`
    times."""
    from trajectory_optimization_tpu.bus.rosbag import BagPlayer

    path = str(tmp_path / "ten.bag")
    pts = np.ones((8, 3), np.float32)
    write_bag(path, [("/pts", CloudMsg(Header(stamp=float(i), frame_id="map"), pts))
                     for i in range(10)])

    def stamps(**kw):
        bus = Bus()
        seen = []
        bus.subscribe("/pts", lambda m: seen.append(m.header.stamp))
        n = BagPlayer(path, streaming=streaming).play(bus, **kw)
        assert n == len(seen)
        return seen

    assert stamps() == [float(i) for i in range(10)]
    assert stamps(start=3.0) == [float(i) for i in range(3, 10)]
    assert stamps(start=2.0, duration=4.0) == [2.0, 3.0, 4.0, 5.0, 6.0]
    assert stamps(duration=1.0, loop=3) == [0.0, 1.0] * 3


def test_bag_player_window_seeks_via_index(tmp_path, monkeypatch):
    """A windowed streaming replay of an indexed bag must push the time
    window into read_bag's chunk pruning: chunks wholly before the window
    are never decompressed (--start-offset 1000 on a session bag must not
    decode 1000 s of data just to skip it), and the result matches the
    full scan-and-skip semantics."""
    from trajectory_optimization_tpu.bus import rosbag as rb
    from trajectory_optimization_tpu.bus.rosbag import BagPlayer, bag_info

    path = str(tmp_path / "long.bag")
    big = np.ones((60000, 3), np.float32)
    write_bag(path, [("/pts", CloudMsg(Header(stamp=float(i), frame_id="m"),
                                       big)) for i in range(8)])
    n_chunks = bag_info(path).chunk_count
    assert n_chunks >= 3

    calls = []
    orig = rb._decompress_chunk
    monkeypatch.setattr(rb, "_decompress_chunk",
                        lambda h, d: (calls.append(1), orig(h, d))[1])
    bus = Bus()
    seen = []
    bus.subscribe("/pts", lambda m: seen.append(m.header.stamp))
    n = BagPlayer(path, streaming=True).play(bus, start=6.0)
    assert n == 2 and seen == [6.0, 7.0]
    assert len(calls) < n_chunks, "windowed replay decompressed every chunk"

    calls.clear()
    bus2 = Bus()
    seen2 = []
    bus2.subscribe("/pts", lambda m: seen2.append(m.header.stamp))
    BagPlayer(path, streaming=True).play(bus2, start=2.0, duration=2.0)
    assert seen2 == [2.0, 3.0, 4.0]
    assert len(calls) < n_chunks


def test_bag_player_duration_survives_stamp_jitter(tmp_path):
    """Streaming replay runs in record order, where stamps jitter: one
    out-of-order record past the window must be SKIPPED, not end the
    pass — in-window messages behind it still play (regression: the
    duration break originally fired on the first out-of-window stamp)."""
    from trajectory_optimization_tpu.bus.rosbag import BagPlayer, BagWriter

    path = str(tmp_path / "jitter.bag")
    pts = np.ones((8, 3), np.float32)
    w = BagWriter(path)
    for s in [0.0, 1.0, 2.0, 8.0, 3.0, 4.0]:  # 8.0 jitters past the window
        w.add("/pts", CloudMsg(Header(stamp=s, frame_id="m"), pts))
    w.close()
    bus = Bus()
    seen = []
    bus.subscribe("/pts", lambda m: seen.append(m.header.stamp))
    BagPlayer(path, streaming=True).play(bus, duration=5.0)
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]
    # the globally sorted player cuts exactly, jitter or not
    bus2 = Bus()
    seen2 = []
    bus2.subscribe("/pts", lambda m: seen2.append(m.header.stamp))
    BagPlayer(path).play(bus2, duration=5.0)
    assert seen2 == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_stream_window_origin_consistent_under_head_jitter(tmp_path):
    """The -s window origin must not shift with head stamp jitter: the
    indexed path anchors at the index's bag start; the unindexed fallback
    must converge to the same origin via a running stamp MIN (regression:
    it anchored at the FIRST record's stamp, so the same content selected
    a window shifted by the head jitter once the index was distrusted)."""
    from trajectory_optimization_tpu.bus.rosbag import MAGIC, BagPlayer, BagWriter

    path = str(tmp_path / "head.bag")
    pts = np.ones((8, 3), np.float32)
    w = BagWriter(path)
    for s in [2.0, 0.0, 1.0, 3.0, 4.0, 5.0]:  # first record stamped 2.0
        w.add("/pts", CloudMsg(Header(stamp=s, frame_id="m"), pts))
    w.close()

    def stamps(bag, **kw):
        bus = Bus()
        seen = []
        bus.subscribe("/pts", lambda m: seen.append(m.header.stamp))
        BagPlayer(bag, streaming=True).play(bus, **kw)
        return seen

    # indexed: origin = 0.0 from the chunk index
    assert stamps(path, start=3.0) == [3.0, 4.0, 5.0]

    # distrust the index by appending a second bag's records (naive concat)
    junk = str(tmp_path / "junk.bag")
    w = BagWriter(junk)
    w.add("/junk", PoseMsg(Header(stamp=10.0, frame_id="m"),
                           [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]))
    w.close()
    merged = str(tmp_path / "merged.bag")
    with open(merged, "wb") as out:
        with open(path, "rb") as f:
            out.write(f.read())
        with open(junk, "rb") as f:
            f.read(len(MAGIC))
            out.write(f.read())
    # unindexed fallback: same window, not one shifted to [5.0] by the
    # jittered 2.0 head stamp
    assert stamps(merged, start=3.0) == [3.0, 4.0, 5.0]


def test_bgr_pixels_transcode_true_colour(tmp_path):
    """A user-constructed bgr8 ImageMsg with a compressed wire format must
    re-read with red/blue in the right place: the JPEG/PNG codecs take true
    colour order, so the writer swaps BGR(A) bytes before compressing
    (regression: bytes were compressed as-is, then re-labelled rgb8 on
    decode — a semantic channel flip)."""
    from trajectory_optimization_tpu.bus.rosbag import BagWriter, read_bag

    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = 220  # blue plane in BGR order
    img[..., 2] = 30   # red plane
    for wire in ("jpeg", "png"):
        path = str(tmp_path / f"bgr_{wire}.bag")
        w = BagWriter(path)
        w.add("/cam", ImageMsg(Header(stamp=0.0, frame_id="c"), img,
                               encoding="bgr8", wire_format=wire))
        w.close()
        ((_t, _topic, m),) = list(read_bag(path))
        out = np.asarray(m.data)
        assert m.encoding == "rgb8" and out.shape == img.shape
        tol = 0 if wire == "png" else 6  # png lossless, jpeg near-lossless here
        assert abs(int(out[..., 2].mean()) - 220) <= tol  # blue -> channel 2
        assert abs(int(out[..., 0].mean()) - 30) <= tol   # red  -> channel 0


def test_filter_bag_rides_chunk_index(tmp_path, monkeypatch):
    """Topic- or time-filtered copies of an indexed bag must skip chunks
    via the trailing chunk-info records — unwanted chunks are never
    decompressed. Filterless copies still full-scan (the reindex path for
    post-index appended records)."""
    from trajectory_optimization_tpu.bus import rosbag as rb
    from trajectory_optimization_tpu.bus.rosbag import filter_bag

    path = str(tmp_path / "sess.bag")
    big = np.ones((60000, 3), np.float32)  # ~720 KB/cloud -> several chunks
    msgs = [("/pts", CloudMsg(Header(stamp=float(i), frame_id="map"), big))
            for i in range(6)]
    msgs.append(("/pose", PoseMsg(Header(stamp=99.0, frame_id="map"),
                                  [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0])))
    write_bag(path, msgs)
    from trajectory_optimization_tpu.bus.rosbag import bag_info
    n_chunks = bag_info(path).chunk_count
    assert n_chunks >= 3

    calls = []
    orig = rb._decompress_chunk
    monkeypatch.setattr(rb, "_decompress_chunk",
                        lambda h, d: (calls.append(1), orig(h, d))[1])

    # topic filter: only the /pose chunk decompresses
    dst = str(tmp_path / "pose.bag")
    assert filter_bag(path, dst, topics=["/pose"]) == 1
    assert len(calls) < n_chunks
    assert [m.header.stamp for _, _, m in read_bag(dst)] == [99.0]

    # time window: chunks wholly outside [4.5, 99] are skipped
    calls.clear()
    dst2 = str(tmp_path / "tail.bag")
    n = filter_bag(path, dst2, start=4.5)
    assert n == 2  # cloud at 5.0 + pose at 99.0
    assert len(calls) < n_chunks
    assert [m.header.stamp for _, _, m in read_bag(dst2)] == [5.0, 99.0]

    # filterless copy full-scans (every chunk touched)
    calls.clear()
    assert filter_bag(path, str(tmp_path / "all.bag")) == 7
    assert len(calls) == n_chunks


def test_indexed_paths_distrust_bags_with_appended_records(tmp_path):
    """Records appended AFTER the trailing index (naive bag concatenation,
    post-finalization writes) are not in the index — and a concatenated
    bag's own chunk-info offsets are wrong for the combined file. Both
    indexed fast paths (read_bag, filter_bag) must detect the trailing
    junk and fall back to the full scan: nothing dropped, nothing
    duplicated (regression: the unbounded trailing-section parse ingested
    the appended bag's chunk infos and emitted [0,1,2,0,1,2])."""
    from trajectory_optimization_tpu.bus.rosbag import filter_bag

    a = str(tmp_path / "a.bag")
    b = str(tmp_path / "b.bag")
    pose = lambda s: PoseMsg(Header(stamp=s, frame_id="m"),
                             [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])
    write_bag(a, [("/pose", pose(float(i))) for i in range(3)])
    write_bag(b, [("/pose", pose(10.0))])
    merged = str(tmp_path / "merged.bag")
    from trajectory_optimization_tpu.bus.rosbag import MAGIC
    with open(merged, "wb") as out:
        with open(a, "rb") as f:
            out.write(f.read())
        with open(b, "rb") as f:
            f.read(len(MAGIC))  # strip the second magic; records follow
            out.write(f.read())

    got = [m.header.stamp for _, _, m in read_bag(merged, topics=["/pose"])]
    assert got == [0.0, 1.0, 2.0, 10.0], got

    dst = str(tmp_path / "copy.bag")
    assert filter_bag(merged, dst, topics=["/pose"]) == 4
    assert [m.header.stamp for _, _, m in read_bag(dst)] == [0.0, 1.0, 2.0, 10.0]


def test_filter_bag_keeps_distinct_connections(tmp_path):
    """Two source connections sharing (topic, type) — multiple publishers /
    merged bags with differing callerid/md5sum — must stay TWO connections
    in the copy, each with its own preserved header (rosbag filter keeps
    connections individually; collapsing them re-homes messages under the
    wrong md5sum/message_definition)."""
    from trajectory_optimization_tpu.bus import rosbag as rb
    from trajectory_optimization_tpu.bus.rosbag import bag_info, filter_bag

    src = str(tmp_path / "two_conns.bag")
    write_bag(src, [("/pose", _sample_messages()[1][1])])
    with open(src, "r+b") as f:
        f.seek(0, 2)
        for conn_id, md5 in ((55, b"a" * 32), (56, b"b" * 32)):
            conn_hdr = rb._pack_header({
                "topic": b"/imu", "type": b"sensor_msgs/Imu", "md5sum": md5,
                "callerid": b"/node%d" % conn_id,
                "message_definition": b"def %d" % conn_id})
            rec_hdr = rb._pack_header({"op": bytes([0x07]),
                                       "conn": struct.pack("<I", conn_id),
                                       "topic": b"/imu"})
            f.write(struct.pack("<I", len(rec_hdr)) + rec_hdr)
            f.write(struct.pack("<I", len(conn_hdr)) + conn_hdr)
            msg_hdr = rb._pack_header({"op": bytes([0x02]),
                                       "conn": struct.pack("<I", conn_id),
                                       "time": rb._time_bytes(7.0 + conn_id)})
            f.write(struct.pack("<I", len(msg_hdr)) + msg_hdr)
            f.write(struct.pack("<I", 4) + b"\x13\x37" + struct.pack("<H", conn_id))

    dst = str(tmp_path / "copy.bag")
    assert filter_bag(src, dst) == 3  # pose + both Imu records

    info = bag_info(dst)
    by_topic = {t.topic: t for t in info.topics}
    assert by_topic["/imu"].count == 2
    assert by_topic["/imu"].connections == 2

    # both source headers survive verbatim in the copy
    md5s, definitions = set(), set()
    with open(dst, "rb") as f:
        f.read(len(rb.MAGIC))
        while True:
            rec = rb._read_record_stream(f)
            if rec is None:
                break
            hdr, data = rec
            records = ([(None, hdr, data)] if hdr["op"][0] != 0x05 else
                       rb._iter_records(rb._decompress_chunk(hdr, data)))
            for _, chdr, cdata in records:
                if chdr["op"][0] == 0x07 and chdr["topic"] == b"/imu":
                    ch = rb._parse_header(cdata)
                    md5s.add(ch["md5sum"])
                    definitions.add(ch["message_definition"])
    assert md5s == {b"a" * 32, b"b" * 32}
    assert definitions == {b"def 55", b"def 56"}


def test_bag_recorder_split_size(tmp_path):
    """rosbag record --split --size: the recording rolls to fresh,
    independently indexed bags as the active file passes the size cap;
    counts total across files and every file replays on its own."""
    from trajectory_optimization_tpu.bus.rosbag import bag_info

    bus = Bus()
    pts = np.random.default_rng(0).normal(size=(9000, 3)).astype(np.float32)
    with BagRecorder(bus, ["/pts"], str(tmp_path / "out.bag"),
                     split_size=300_000) as rec:
        for i in range(10):  # ~108 KB/cloud -> rolls every ~3 messages
            bus.publish("/pts", CloudMsg(Header(stamp=float(i), frame_id="m"),
                                         pts))
        rec.flush()
        assert rec.count == 10
    assert len(rec.paths) >= 3
    assert rec.paths[0].endswith("out_0.bag")
    total, seen = 0, []
    for p in rec.paths:
        info = bag_info(p)  # each file carries its own trailing index
        total += info.messages
        seen += [m.header.stamp for _, _, m in read_bag(p)]
    assert total == 10 and seen == [float(i) for i in range(10)]


def test_bag_recorder_split_duration(tmp_path):
    """rosbag record --split --duration: rolls on message-stamp span."""
    bus = Bus()
    with BagRecorder(bus, ["/pose"], str(tmp_path / "out.bag"),
                     split_duration=3.0) as rec:
        for i in range(10):
            bus.publish("/pose", PoseMsg(Header(stamp=float(i), frame_id="m"),
                                         [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]))
        rec.flush()
    assert rec.count == 10 and len(rec.paths) >= 3
    for p in rec.paths:
        stamps = [m.header.stamp for _, _, m in read_bag(p)]
        assert stamps and stamps[-1] - stamps[0] < 3.0  # span under the cap


def test_bag_recorder_compression(tmp_path):
    """rosbag record --lz4: recorded chunks compress as they flush, and
    split files inherit the mode."""
    from trajectory_optimization_tpu.bus.rosbag import bag_info

    bus = Bus()
    g = np.mgrid[0:100, 0:120].astype(np.float32)
    pts = np.stack([g[0].ravel(), g[1].ravel(),
                    np.zeros(12000, np.float32)], 1)  # structured: compresses
    with BagRecorder(bus, ["/pts"], str(tmp_path / "out.bag"),
                     compression="lz4", split_size=400_000) as rec:
        for i in range(8):
            bus.publish("/pts", CloudMsg(Header(stamp=float(i), frame_id="m"),
                                         pts))
        rec.flush()
    assert rec.count == 8 and len(rec.paths) >= 2
    for p in rec.paths:
        info = bag_info(p)
        assert info.compression.get("lz4", 0) >= 1
        assert info.compressed < 0.8 * info.uncompressed
    total = sum(1 for p in rec.paths for _ in read_bag(p))
    assert total == 8


def test_bag_recorder_duration_split_skips_unserializable(tmp_path):
    """A message with no bag encoder must neither roll the recording nor
    leave an empty split file — rosbag record never rolls for a message
    it does not write (regression: the duration check originally ran
    before encodability was known)."""
    bus = Bus()
    with BagRecorder(bus, None, str(tmp_path / "out.bag"),
                     split_duration=3.0) as rec:
        bus.publish("/pose", PoseMsg(Header(stamp=0.0, frame_id="m"),
                                     [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]))
        bus.publish("/weird", object())  # stamp 5 equivalent: unencodable
        bus.publish("/pose", PoseMsg(Header(stamp=1.0, frame_id="m"),
                                     [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]))
        rec.flush()
        assert rec.count == 2 and rec.skipped == 1
    assert rec.paths == [str(tmp_path / "out_0.bag")]  # no spurious roll
    assert [m.header.stamp for _, _, m in read_bag(rec.paths[0])] == [0.0, 1.0]


def test_bag_recorder_post_close_enqueue_never_wedges(tmp_path):
    """A publisher preempted between the recorder's closed-check and its
    queue put must not leave an unconsumed item behind close() — that item
    would wedge any later flush() in Queue.join() forever (regression:
    BagRecorder._enqueue/close gate)."""
    bus = Bus()
    path = str(tmp_path / "race.bag")
    rec = BagRecorder(bus, ["/pts"], path)
    msg = CloudMsg(Header(stamp=1.0, frame_id="map"), np.ones((4, 3), np.float32))
    bus.publish("/pts", msg)
    rec.flush()
    assert rec.count == 1
    rec.close()
    # simulates the raced publisher arriving after close(): must be a no-op
    rec._enqueue("/pts", msg)
    import threading

    done = []
    t = threading.Thread(target=lambda: (rec.flush(), done.append(True)))
    t.start()
    t.join(timeout=10.0)
    assert done, "flush() wedged on a post-close enqueue"
    assert rec.count == 1


def test_cli_filter(tmp_path, capsys):
    from trajectory_optimization_tpu.__main__ import main

    src = str(tmp_path / "s.bag")
    write_bag(src, _sample_messages())
    dst = str(tmp_path / "d.bag")
    assert main(["filter", src, dst, "--topics", "/pts", "/tf"]) == 0
    assert "wrote 2 messages" in capsys.readouterr().out
    assert [topic for _, topic, _ in read_bag(dst)] == ["/pts", "/tf"]

    assert main(["filter", str(tmp_path / "nope.bag"), dst]) == 1
    assert "filter:" in capsys.readouterr().err


def test_filter_bag_reindexes_crash_tail(tmp_path):
    """rosbag reindex equivalent: a crash-truncated recording (flushed
    chunks, no trailing section, partial final record) copies through
    filter_bag into a fully indexed bag — info names topics again."""
    from trajectory_optimization_tpu.bus.rosbag import BagWriter, bag_info, filter_bag

    path = str(tmp_path / "crash.bag")
    w = BagWriter(path)
    pts = np.ones((60000, 3), np.float32)
    for i in range(3):
        w.add("/pts", CloudMsg(Header(stamp=5.0 + i, frame_id="map"), pts))
    flushed = sum(sum(c.values()) for _, _, _, c in w._chunk_infos)
    assert flushed >= 1
    w._f.write(b"\x40\x00\x00\x00partial rec")  # torn final write
    w._f.close()

    fixed = str(tmp_path / "fixed.bag")
    assert filter_bag(path, fixed) == flushed
    info = bag_info(fixed)
    assert info.messages == flushed
    assert [t.topic for t in info.topics] == ["/pts"]
    assert [m.header.stamp for _, _, m in read_bag(fixed)] == [
        5.0 + i for i in range(flushed)]


def test_play_decode_pool_order_and_bytes(tmp_path):
    """BagPlayer's camera decode POOL (streaming prefetch) must deliver the
    exact sequential stream: same event order, byte-identical frames, other
    message types interleaved untouched (VERDICT r3 #7)."""
    from trajectory_optimization_tpu.bus.core import Bus
    from trajectory_optimization_tpu.bus.rosbag import BagPlayer, BagWriter

    rng = np.random.default_rng(7)
    path = str(tmp_path / "cams.bag")
    w = BagWriter(path)
    truth = []
    for i in range(6):
        stamp = 1.0 + 0.1 * i
        img = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
        wire = "png" if i % 2 else "jpeg"  # png = lossless roundtrip
        w.add(f"/cam{i % 2}/image", ImageMsg(
            Header(stamp=stamp, frame_id=f"cam{i % 2}"), img,
            encoding="rgb8", wire_format=wire))
        w.add("/pose", PoseMsg(Header(stamp=stamp + 0.05, frame_id="map"),
                               np.array([float(i), 0.0, 0.0]),
                               np.array([0.0, 0.0, 0.0, 1.0])))
        truth.append((f"/cam{i % 2}/image", stamp))
    w.close()

    def capture(prefetch):
        got = []
        bus = Bus()
        bus.subscribe("/cam0/image", lambda m: got.append(("/cam0/image", m)))
        bus.subscribe("/cam1/image", lambda m: got.append(("/cam1/image", m)))
        bus.subscribe("/pose", lambda m: got.append(("/pose", m)))
        n = BagPlayer(path, streaming=True).play(bus, prefetch=prefetch)
        assert n == 12
        return got

    seq = capture(prefetch=0)       # sequential reference
    pooled = capture(prefetch=8)    # decode pool
    assert [t for t, _ in seq] == [t for t, _ in pooled]
    for (ts, ms), (tp, mp) in zip(seq, pooled):
        if hasattr(ms, "data"):
            np.testing.assert_array_equal(np.asarray(ms.data),
                                          np.asarray(mp.data))
            assert ms.encoding == mp.encoding
        else:
            np.testing.assert_allclose(ms.position, mp.position, atol=0)
