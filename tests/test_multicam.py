import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops.geometry import frustum_cull, to_camera_frame
from trajectory_optimization_tpu.ops.multicam import (
    combined_coverage,
    multicam_frustum_masks,
    multicam_scores,
)
from trajectory_optimization_tpu.ops.scores import waypoint_scores
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

INTR = default_intrinsics()


def _rig(c=4, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(c, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.uniform(0, 15, size=(c, 3)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(t)


def test_multicam_scores_match_per_camera(cloud10):
    pts = jnp.asarray(cloud10[:5000])
    q, t = _rig()
    batched = np.asarray(
        multicam_scores(pts, q, t, INTR.matrix(), INTR.width, INTR.height)
    )
    for c in range(4):
        single = np.asarray(
            waypoint_scores(pts, q[c : c + 1], t[c : c + 1], INTR.matrix(), INTR.width, INTR.height)
        )[0]
        np.testing.assert_allclose(batched[c], single, atol=1e-6)


def test_multicam_frustum_masks_match_per_camera(cloud10):
    pts = jnp.asarray(cloud10[:5000])
    q, t = _rig(seed=1)
    batched = np.asarray(
        multicam_frustum_masks(pts, q, t, INTR.matrix(), INTR.width, INTR.height,
                               min_dist=1.0, max_dist=15.0)
    )
    for c in range(4):
        cam = to_camera_frame(pts, q[c], t[c])
        m, _, _ = frustum_cull(cam, INTR.matrix(), INTR.width, INTR.height,
                               min_dist=1.0, max_dist=15.0)
        np.testing.assert_array_equal(batched[c], np.asarray(m))


def test_combined_coverage_monotone_in_cameras(cloud10):
    pts = jnp.asarray(cloud10[:5000])
    q, t = _rig(seed=2)
    cov2, _ = combined_coverage(pts, q[:2], t[:2], INTR.matrix(), INTR.width, INTR.height)
    cov4, per_cam = combined_coverage(pts, q, t, INTR.matrix(), INTR.width, INTR.height)
    # adding cameras can only add (log-odds >= 0) evidence
    assert float(jnp.mean(cov4)) >= float(jnp.mean(cov2)) - 1e-6
    assert per_cam.shape == (4,)
    assert np.asarray(cov4).min() >= 0.5 - 1e-6  # clip floor ⇒ coverage >= 0.5


def test_points_processor_batched_rig(cloud10):
    from trajectory_optimization_tpu.bus.core import Bus
    from trajectory_optimization_tpu.bus.messages import CameraInfoMsg, CloudMsg, Header
    from trajectory_optimization_tpu.bus.nodes import PointsProcessorNode
    from trajectory_optimization_tpu.utils.config import PointsProcessorConfig

    bus = Bus(error_policy="raise")
    node = PointsProcessorNode(
        bus,
        PointsProcessorConfig(pc_topic="/cloud", cam_info_topics=(),
                              frustum_max_dist=15.0, hpr_backend="approx", render=False),
    )
    rig = {
        "cam0": ([6.0, 2.0, -3.0], [0, 0, 0, 1]),
        "cam1": ([10.0, 10.0, -3.0], [0, 0, 0, 1]),
    }
    infos = []
    for frame, (t, q) in rig.items():
        node.frames.set_transform("world", frame, t, q)
        infos.append(
            CameraInfoMsg(Header(stamp=0.0, frame_id=frame),
                          int(INTR.width), int(INTR.height),
                          K=tuple(INTR.matrix_np(np.float64).reshape(-1)))
        )
    cloud = CloudMsg(Header(stamp=0.0, frame_id="world"), cloud10)
    out = node.process_all(cloud, infos)
    assert set(out) == {"cam0", "cam1"}
    for frame, visible in out.items():
        assert 0 < len(visible) < len(cloud10)
        # batched culled output matches the serial path's
        serial = node.process(cloud, infos[[i.header.frame_id for i in infos].index(frame)])
        assert abs(len(serial) - len(visible)) <= max(3, 0.01 * len(visible))
