"""Bag -> reference-npz-dataset extraction (bus/dataset.py + CLI extract).

The reference ships only index 10 of its 0-98 dataset in-repo; the rest is
regenerated here from a session bag (same topics as
`/root/reference/launch/rosbag_info.txt`: /final_cost_cloud, /path,
/viz/camera_*/image/compressed + camera_info).
"""
import os

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.dataset import extract_dataset
from trajectory_optimization_tpu.bus.messages import (
    CameraInfoMsg,
    CloudMsg,
    Header,
    ImageMsg,
    PathMsg,
)
from trajectory_optimization_tpu.bus.rosbag import BagWriter
from trajectory_optimization_tpu.utils.data import load_path, load_point_cloud


def _session_bag(path, n=3, with_images=True):
    """A miniature session: n clouds (with NaN + intensity), n paths,
    n JPEG camera frames + one CameraInfo, plus an unrelated topic."""
    rng = np.random.default_rng(0)
    w = BagWriter(path)
    clouds, paths = [], []
    for i in range(n):
        pts = rng.uniform(-5, 5, size=(50 + i, 4)).astype(np.float32)
        pts[3, 0] = np.nan  # one bad row — the extractor must strip it
        w.add("/final_cost_cloud",
              CloudMsg(Header(stamp=10.0 * i, frame_id="map"), pts))
        clouds.append(pts)
        poses = rng.uniform(-2, 2, size=(7, 3)).astype(np.float64)
        quats = np.tile([0.0, 0.0, 0.0, 1.0], (7, 1))
        w.add("/path", PathMsg(Header(stamp=10.0 * i + 1, frame_id="map"),
                               poses, quats))
        paths.append(poses)
        if with_images:
            img = (rng.uniform(0, 255, size=(24, 32, 3))).astype(np.uint8)
            w.add("/viz/camera_0/image/compressed",
                  ImageMsg(Header(stamp=10.0 * i + 2, frame_id="cam0"),
                           img, encoding="rgb8", wire_format="jpeg"))
        w.add("/other", CloudMsg(Header(stamp=10.0 * i + 3, frame_id="map"),
                                 rng.uniform(size=(4, 3)).astype(np.float32)))
    if with_images:
        K = (758.04, 0.0, 621.47, 0.0, 761.62, 756.86, 0.0, 0.0, 1.0)
        w.add("/viz/camera_0/camera_info",
              CameraInfoMsg(Header(stamp=0.0, frame_id="cam0"),
                            width=32, height=24, K=K))
    w.close()
    return clouds, paths


def test_extract_reference_layout(tmp_path):
    bag = str(tmp_path / "session.bag")
    clouds, paths = _session_bag(bag)
    out = str(tmp_path / "data")
    res = extract_dataset(bag, out)
    assert len(res.clouds) == 3 and len(res.paths) == 3
    for i in range(3):
        # the reference schema exactly: points/point_cloud_{i}.npz key pts
        f = os.path.join(out, "points", f"point_cloud_{i}.npz")
        assert res.clouds[i] == f
        z = np.load(f)
        assert z["pts"].dtype == np.float64 and z["pts"].shape[1] == 3
        want = clouds[i][:, :3].astype(np.float64)
        want = want[np.isfinite(want).all(axis=1)]
        np.testing.assert_allclose(z["pts"], want, rtol=1e-6)
        # and the package's own loaders ingest the files directly
        assert load_point_cloud(f).shape == want.shape
        g = os.path.join(out, "paths", f"path_poses_{i}.npz")
        np.testing.assert_allclose(load_path(g), paths[i], rtol=1e-6)


def test_extract_images_and_intrinsics(tmp_path):
    bag = str(tmp_path / "session.bag")
    _session_bag(bag)
    out = str(tmp_path / "data")
    res = extract_dataset(
        bag, out,
        image_topics=["/viz/camera_0/image/compressed"],
        camera_info_topics=["/viz/camera_0/camera_info"])
    frames = res.images["/viz/camera_0/image/compressed"]
    assert len(frames) == 3 and res.skipped_images == 0
    from trajectory_optimization_tpu.bus.png import decode_png

    with open(frames[0], "rb") as f:
        img = decode_png(f.read())
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8
    ci = np.load(res.camera_infos["/viz/camera_0/camera_info"])
    assert ci["K"].shape == (3, 3) and float(ci["K"][0, 0]) == 758.04
    assert int(ci["width"]) == 32 and int(ci["height"]) == 24


def test_extract_indices_and_start_index(tmp_path):
    bag = str(tmp_path / "session.bag")
    clouds, paths = _session_bag(bag, with_images=False)
    out = str(tmp_path / "data")
    res = extract_dataset(bag, out, indices=[1], start_index=9)
    # one cloud + one path, named with the offset index (the in-repo
    # sample pair is index 10 of the reference session)
    assert [os.path.basename(p) for p in res.clouds] == ["point_cloud_10.npz"]
    assert [os.path.basename(p) for p in res.paths] == ["path_poses_10.npz"]
    want = clouds[1][:, :3].astype(np.float64)
    want = want[np.isfinite(want).all(axis=1)]
    np.testing.assert_allclose(load_point_cloud(res.clouds[0]),
                               want.astype(np.float32), rtol=1e-6)


def test_extract_early_stop_rides_index(tmp_path, monkeypatch):
    """With indices given, the scan must stop at the last wanted index —
    on the reference's 15 GB bag that's the difference between seconds
    and the full-file scan."""
    bag = str(tmp_path / "session.bag")
    _session_bag(bag, n=3, with_images=False)

    from trajectory_optimization_tpu.bus import rosbag as R

    seen_stamps = []
    real_read = R.read_bag

    def spy(*a, **kw):
        for t, topic, msg in real_read(*a, **kw):
            seen_stamps.append(t)
            yield t, topic, msg

    monkeypatch.setattr(R, "read_bag", spy)
    res = extract_dataset(bag, str(tmp_path / "d"), indices=[0])
    assert len(res.clouds) == 1 and len(res.paths) == 1
    # messages from the later groups (stamps >= 10) were never decoded
    assert max(seen_stamps) < 10.0


def test_extract_cli(tmp_path, capsys):
    bag = str(tmp_path / "session.bag")
    _session_bag(bag, with_images=False)
    out = str(tmp_path / "data")
    from trajectory_optimization_tpu.__main__ import main

    rc = main(["extract", bag, out, "--indices", "2"])
    assert rc == 0
    assert "1 clouds, 1 paths" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out, "points", "point_cloud_2.npz"))
    # unknown topics -> nothing extracted -> non-zero exit
    rc = main(["extract", bag, str(tmp_path / "e"),
               "--cloud-topic", "/nope", "--path-topic", "/also_nope"])
    assert rc == 1


def test_extract_bgr_raw_image_lands_rgb(tmp_path):
    """A raw sensor_msgs/Image topic carrying bgr8 (the cv/ROS default)
    must land as a true-colour PNG — red and blue swapped on write
    (regression: bytes went to encode_png unswapped)."""
    bag = str(tmp_path / "session.bag")
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 200  # blue channel in BGR order
    w = BagWriter(bag)
    w.add("/cam/raw", ImageMsg(Header(stamp=0.0, frame_id="c"), img,
                               encoding="bgr8"))
    w.close()
    res = extract_dataset(bag, str(tmp_path / "d"), cloud_topic="",
                          path_topic="", image_topics=["/cam/raw"])
    from trajectory_optimization_tpu.bus.png import decode_png

    with open(res.images["/cam/raw"][0], "rb") as f:
        out = decode_png(f.read())
    assert out[..., 2].min() == 200 and out[..., 0].max() == 0


def test_extract_rejects_empty_config(tmp_path):
    bag = str(tmp_path / "session.bag")
    _session_bag(bag, n=1, with_images=False)
    with pytest.raises(ValueError):
        extract_dataset(bag, str(tmp_path / "d"), cloud_topic="",
                        path_topic="")
    with pytest.raises(ValueError):
        extract_dataset(bag, str(tmp_path / "d"), indices=[])
