"""Serving behavior: sustained streaming, bucket reuse, no per-message
recompilation (the failure mode bench caught: closure-keyed jit caches)."""
import time

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.core import Bus
from trajectory_optimization_tpu.bus.messages import CloudMsg, Header, PathMsg
from trajectory_optimization_tpu.bus.nodes import TrajOptNode
from trajectory_optimization_tpu.utils.config import TrajOptNodeConfig


def test_streaming_reuses_compilation(cloud10, path10):
    bus = Bus(error_policy="raise")
    node = TrajOptNode(
        bus,
        TrajOptNodeConfig(pc_topic="/pc", path_topic="/path", opt_steps=5,
                          lr_pose=0.1, lr_quat=0.02),
    )
    out = []
    bus.subscribe("/path/optimized", out.append)

    def send(i, n_pts):
        stamp = 10.0 * (i + 1)
        bus.publish("/pc", CloudMsg(Header(stamp=stamp, frame_id="m"), cloud10[:n_pts]))
        bus.publish("/path", PathMsg.straight(path10, frame_id="m", stamp=stamp))

    # first message of the bucket compiles
    t0 = time.perf_counter()
    send(0, 9000)
    t_first = time.perf_counter() - t0

    # same bucket (9000 and 9500 both pad to the same bucket) must be fast
    times = []
    for i in range(1, 6):
        t0 = time.perf_counter()
        send(i, 9000 + i * 100)
        times.append(time.perf_counter() - t0)
    assert len(out) == 6
    # steady-state messages must be much faster than the compiling first one
    assert max(times) < t_first, f"recompilation suspected: {times} vs first {t_first}"
    # and reasonably quick in absolute terms on CPU
    assert np.median(times) < max(t_first / 3, 2.0)


def test_streaming_interleaved_buckets(cloud10, path10):
    from trajectory_optimization_tpu.utils.data import bucket_size

    n_small, n_large = 5000, 33000
    assert bucket_size(n_small) != bucket_size(n_large)
    bus = Bus(error_policy="raise")
    TrajOptNode(
        bus,
        TrajOptNodeConfig(pc_topic="/pc", path_topic="/path", opt_steps=3,
                          lr_pose=0.1, lr_quat=0.02),
    )
    out = []
    bus.subscribe("/path/optimized", out.append)
    for i, n in enumerate([n_small, n_large, n_small, n_large, n_small]):
        stamp = 10.0 * (i + 1)
        bus.publish("/pc", CloudMsg(Header(stamp=stamp, frame_id="m"), cloud10[:n]))
        bus.publish("/path", PathMsg.straight(path10, frame_id="m", stamp=stamp))
    assert len(out) == 5
    # alternating buckets must not evict each other (lru size >> 2)
    for msg in out:
        assert np.isfinite(msg.positions).all()
