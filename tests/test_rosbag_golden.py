"""Foreign-producer golden .bag fixtures (VERDICT r3 #4).

The checked-in bags were hand-assembled from the rosbag 2.0 / ROS
serialization / LZ4-frame SPECS by tests/make_golden_bags.py — an
implementation deliberately independent of bus/rosbag.py, with layout
choices our writer never makes (scrambled record-header field order,
connection-header extras, non-contiguous conn ids, an LZ4 frame with
content-size/block-checksum/content-checksum flags and stored+compressed
blocks, bz2 from stdlib). A reader that merely mirrors our writer's
habits fails here; a reader of the spec passes. The writer is pinned the
other way: its bytes for a fixed message set are hashed, so a format
regression fails loudly instead of silently de-syncing reader and writer.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np

from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PoseMsg
from trajectory_optimization_tpu.bus.rosbag import bag_info, read_bag, write_bag

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "rosbag_golden")
INDEXED = os.path.join(GOLDEN, "golden_indexed.bag")
TRUNCATED = os.path.join(GOLDEN, "golden_truncated.bag")

# the fixture's ground truth (tests/make_golden_bags.py POSES/CLOUD_PTS)
POSES = [
    (100.5, 1, (1.5, -2.25, 3.0), (0.0, 0.0, 0.7071067811865476,
                                   0.7071067811865476)),
    (102.0, 2, (4.0, 5.0, -6.5), (0.0, 0.0, 0.0, 1.0)),
    (103.75, 3, (-7.125, 8.0, 9.5), (0.5, 0.5, 0.5, 0.5)),
]
CLOUD_PTS = np.array([(0.0, 0.0, 0.0), (1.0, 2.0, 3.0), (-1.0, 0.5, 2.0),
                      (10.0, 20.0, 30.0)], np.float32)


def _check_pose(msg, t, truth):
    t_true, seq, pos, quat = truth
    assert abs(t - t_true) < 1e-9
    assert isinstance(msg, PoseMsg)
    assert msg.header.seq == seq
    np.testing.assert_allclose(np.asarray(msg.position), pos, atol=0)
    np.testing.assert_allclose(np.asarray(msg.orientation_xyzw), quat, atol=0)


def test_golden_indexed_full_scan():
    events = list(read_bag(INDEXED))
    assert [topic for _, topic, _ in events] == [
        "/golden/pose", "/golden/cloud", "/golden/pose", "/golden/pose"]
    _check_pose(events[0][2], events[0][0], POSES[0])
    _check_pose(events[2][2], events[2][0], POSES[1])
    _check_pose(events[3][2], events[3][0], POSES[2])  # the LZ4 chunk
    t, _, cloud = events[1]
    assert abs(t - 101.25) < 1e-9
    assert isinstance(cloud, CloudMsg)
    np.testing.assert_allclose(np.asarray(cloud.points), CLOUD_PTS, atol=0)
    assert cloud.header.frame_id == "odom"


def test_golden_indexed_topic_and_time_filters():
    """The topics/time paths ride the hand-assembled trailing index —
    chunk-info offsets, connection records, non-contiguous conn ids."""
    events = list(read_bag(INDEXED, topics=["/golden/pose"]))
    assert len(events) == 3
    for ev, truth in zip(events, POSES):
        _check_pose(ev[2], ev[0], truth)

    events = list(read_bag(INDEXED, time_range=(101.0, 102.5)))
    assert [topic for _, topic, _ in events] == ["/golden/cloud",
                                                "/golden/pose"]

    events = list(read_bag(INDEXED, topics=["/golden/cloud"],
                           time_range=(103.0, None)))
    assert events == []


def test_golden_indexed_bag_info():
    info = bag_info(INDEXED)
    topics = {t.topic: t for t in info.topics}
    assert topics["/golden/pose"].count == 3
    assert topics["/golden/cloud"].count == 1
    assert topics["/golden/pose"].ros_type == "geometry_msgs/PoseStamped"
    assert info.types["sensor_msgs/PointCloud2"] == (
        "1158d486dd51d683ce2f1be655c3c181")
    assert abs(info.start - 100.5) < 1e-9 and abs(info.end - 103.75) < 1e-9


def test_golden_truncated_recovers_whole_records():
    """Crash-truncated tail (unindexed header, second chunk cut mid-data):
    everything up to the last whole record must decode, nothing raised."""
    events = list(read_bag(TRUNCATED))
    assert len(events) == 1
    _check_pose(events[0][2], events[0][0], POSES[0])
    # filtered reads must also survive (index_pos=0 -> full scan)
    events = list(read_bag(TRUNCATED, topics=["/golden/pose"]))
    assert len(events) == 1


def test_writer_bytes_pinned(tmp_path):
    """Round-trip the golden message set through write_bag and pin the
    exact output bytes: any change to the writer's record layout,
    compression framing or serialization fails THIS test loudly instead
    of only its own reader (which would hide a de-synced format)."""
    msgs = []
    for t, seq, pos, quat in POSES:
        msgs.append(("/golden/pose", PoseMsg(
            Header(stamp=t, frame_id="map", seq=seq),
            np.asarray(pos, np.float64), np.asarray(quat, np.float64))))
    msgs.insert(1, ("/golden/cloud", CloudMsg(
        Header(stamp=101.25, frame_id="odom", seq=7), CLOUD_PTS)))
    for comp, digest in PINNED.items():
        path = tmp_path / f"out_{comp}.bag"
        write_bag(str(path), msgs, compression=comp)
        got = hashlib.sha256(path.read_bytes()).hexdigest()
        assert got == digest, (
            f"write_bag({comp!r}) bytes changed: sha256 {got} != pinned "
            f"{digest}. If the format change is INTENTIONAL, re-pin here "
            f"and state why in the commit message.")
        # and the reread must still agree with the golden ground truth
        events = list(read_bag(str(path)))
        assert len(events) == 4


PINNED = {
    "none": "fe8a2e005c34ea233536a906314058274538d4fcd9103a5c194fc08b65a49668",
    "bz2": "d7684e357eedefb42a9c2c861adb3646989774ba9da0a2c04e1b743f54bb5c69",
    "lz4": "6775016dd0e1a787ce853b073a458752e612c4995a21180465e24041509bf99c",
}
