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
