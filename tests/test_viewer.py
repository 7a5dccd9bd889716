"""Live HTTP scene viewer (bus.viewer) — the rviz role, headless.

Covers: topic subscription + state tracking, PNG rendering with reward
colors, the HTTP endpoints (page, image, state), render caching per scene
sequence, and the launch preset flag (reference rviz-in-the-launch-file:
`launch/pointcloud_processor.launch:20`, `config/*.rviz`).
"""
from __future__ import annotations

import json
import urllib.request

import numpy as np

from trajectory_optimization_tpu.bus.core import Bus
from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PathMsg
from trajectory_optimization_tpu.bus.viewer import ViewerNode
from trajectory_optimization_tpu.utils.config import ViewerConfig

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _msgs():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    rewards = np.concatenate(
        [pts, rng.uniform(size=(500, 1)).astype(np.float32)], axis=1)
    path = np.stack([np.linspace(0, 3, 5), np.zeros(5), np.zeros(5)], 1)
    quat = np.tile([0.0, 0.0, 0.0, 1.0], (5, 1))
    return (CloudMsg(Header.make("world"), pts),
            CloudMsg(Header.make("world"), rewards),
            PathMsg(Header.make("world"), path, quat))


def test_viewer_render_and_http():
    bus = Bus()
    node = ViewerNode(bus, ViewerConfig(pc_topic="/pts", path_topic="/path",
                                        port=0))
    try:
        assert node.url.startswith("http://127.0.0.1:")
        # empty scene renders a placeholder
        png0 = node.render_png()
        assert png0.startswith(PNG_MAGIC)

        cloud, rewards, path = _msgs()
        bus.publish("/pts", cloud)
        bus.publish("/pts/rewards", rewards)
        bus.publish("/path", path)
        bus.publish("/path/optimized", path)

        with urllib.request.urlopen(node.url, timeout=10) as r:
            page = r.read()
        assert b"<img" in page and b"scene.png" in page

        with urllib.request.urlopen(node.url + "state.json", timeout=10) as r:
            state = json.loads(r.read())
        assert state["seq"] == 4
        assert state["counts"] == {"cloud": 1, "rewards": 1, "path": 1,
                                   "optimized": 1}

        with urllib.request.urlopen(
                node.url + "scene.png?elev=20&azim=45", timeout=30) as r:
            png = r.read()
        assert png.startswith(PNG_MAGIC) and len(png) > 5000

        # cache: same seq + view -> identical bytes without re-render
        assert node.render_png(20, 45) == png
        # new message advances seq -> fresh render
        bus.publish("/pts/rewards", rewards)
        assert node.render_png(20, 45) != b""  # renders, no exception
    finally:
        node.close()


def test_viewer_in_launch_preset():
    from trajectory_optimization_tpu.bus.launch import (
        launch_trajectory_optimization,
    )

    with launch_trajectory_optimization(viewer=True, viewer_port=0) as launch:
        v = launch.nodes["viewer"]
        assert v.url
        cloud, rewards, path = _msgs()
        # preset topics (subt-sim): /X1/local_map + /X1/path
        launch.bus.publish("/X1/local_map", cloud)
        with urllib.request.urlopen(v.url + "state.json", timeout=10) as r:
            assert json.loads(r.read())["counts"]["cloud"] == 1
        png = v.render_png()
        assert png.startswith(PNG_MAGIC)
