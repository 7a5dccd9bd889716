import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops import geometry
from trajectory_optimization_tpu.ops.trajectory import (
    mean_segment_angle,
    polyline_length,
)
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

import oracles


INTR = default_intrinsics()
K64 = INTR.matrix_np(np.float64)


def _cloud(n=500, seed=0):
    r = np.random.default_rng(seed)
    return r.uniform(-10, 10, size=(n, 3)).astype(np.float32)


def _pose(seed=1):
    r = np.random.default_rng(seed)
    q = r.normal(size=4)
    q = q / np.linalg.norm(q)
    t = r.uniform(-3, 3, size=3)
    return q, t


def test_to_camera_frame_matches_oracle():
    pts = _cloud()
    q, t = _pose()
    got = np.asarray(geometry.to_camera_frame(jnp.asarray(pts), jnp.asarray(q), jnp.asarray(t)))
    want = oracles.world_to_cam(pts, q, t)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_to_camera_frame_batched_matches_single():
    pts = jnp.asarray(_cloud())
    qs, ts = [], []
    for s in range(5):
        q, t = _pose(seed=s)
        qs.append(q)
        ts.append(t)
    qs, ts = jnp.asarray(np.stack(qs), dtype=jnp.float32), jnp.asarray(np.stack(ts), dtype=jnp.float32)
    batched = np.asarray(geometry.to_camera_frame(pts, qs, ts))
    for w in range(5):
        single = np.asarray(geometry.to_camera_frame(pts, qs[w], ts[w]))
        np.testing.assert_allclose(batched[w], single, atol=1e-5)


def test_dist_mask_smooth_matches_oracle():
    pts = _cloud(seed=2)
    got = np.asarray(geometry.dist_mask(jnp.asarray(pts), 1.0, 5.0))
    want = oracles.smooth_dist_mask(pts.astype(np.float64), 1.0, 5.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dist_mask_binary_uses_z_range():
    pts = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, 3.0], [0.0, 0.0, 9.0]])
    got = np.asarray(geometry.dist_mask(pts, 1.0, 5.0, binary=True))
    np.testing.assert_array_equal(got, [False, True, False])


def test_fov_mask_smooth_matches_oracle():
    pts = _cloud(seed=3)
    got = np.asarray(
        geometry.fov_mask(jnp.asarray(pts), INTR.matrix(), INTR.width, INTR.height)
    )
    want = oracles.smooth_fov_mask(pts.astype(np.float64), K64, INTR.width, INTR.height)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fov_mask_binary_matches_oracle():
    pts = _cloud(seed=4) + np.array([0.0, 0.0, 6.0], dtype=np.float32)
    got = np.asarray(
        geometry.fov_mask(
            jnp.asarray(pts), INTR.matrix(), INTR.width, INTR.height, binary=True
        )
    )
    want = oracles.binary_fov_mask(pts.astype(np.float64), K64, INTR.width, INTR.height)
    assert (got == want).mean() > 0.999  # float32 vs float64 border points only


def test_visibility_in_unit_interval_and_peaked_in_front():
    pts = _cloud(seed=5)
    q = np.array([1.0, 0.0, 0.0, 0.0])  # identity: camera looks along +z
    t = np.zeros(3)
    vis = np.asarray(
        geometry.visibility(
            jnp.asarray(pts), jnp.asarray(q), jnp.asarray(t), INTR.matrix(),
            INTR.width, INTR.height,
        )
    )
    assert vis.min() >= 0.0 and vis.max() <= 1.0
    # a point at the sweet spot (on axis, mid-range in all coords ~ center) scores high
    sweet = jnp.array([[3.0, 3.0, 3.0]])  # dist mask center is scalar 3.0 on all coords
    v = np.asarray(
        geometry.visibility(
            sweet, jnp.asarray(q), jnp.asarray(t), INTR.matrix(), INTR.width, INTR.height
        )
    )
    assert v[0] > 0.5


def test_frustum_cull_combines_masks():
    pts = _cloud(seed=6) + np.array([0.0, 0.0, 6.0], dtype=np.float32)
    m, dm, fm = geometry.frustum_cull(
        jnp.asarray(pts), INTR.matrix(), INTR.width, INTR.height, min_dist=1.0, max_dist=10.0
    )
    np.testing.assert_array_equal(np.asarray(m), np.asarray(dm) & np.asarray(fm))
    kept = geometry.compact_masked(pts, m)
    assert kept.shape[1] == 3 and kept.shape[0] == int(np.asarray(m).sum())


def test_polyline_length_matches_oracle(path10):
    got = float(polyline_length(jnp.asarray(path10)))
    np.testing.assert_allclose(got, oracles.traj_length(path10.astype(np.float64)), rtol=1e-5)


def test_mean_segment_angle_matches_oracle(path10):
    got = float(mean_segment_angle(jnp.asarray(path10)))
    want = oracles.traj_mean_angle(path10.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mean_segment_angle_short_paths_are_straight():
    """<3 waypoints have no interior angles: the mean must be pi (straight by
    definition), not the NaN of a 0/0 — a NaN here poisons traj_criterion's
    smoothness loss and every Adam gradient on step 1."""
    for w in (1, 2):
        got = float(mean_segment_angle(jnp.zeros((w, 3)) + jnp.arange(w)[:, None]))
        np.testing.assert_allclose(got, np.pi, rtol=1e-6)


def test_traj_criterion_finite_for_two_waypoints():
    import jax

    from trajectory_optimization_tpu.models.traj import (
        TrajProblem, init_traj_params, traj_forward)
    from trajectory_optimization_tpu.utils.data import identity_quaternions
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    pts = jnp.asarray(_cloud(seed=3))
    poses0 = jnp.array([[0.0, 0.0, 0.2], [1.0, 0.0, 0.2]])
    quats0 = jnp.asarray(identity_quaternions(2))
    prob = TrajProblem(img_width=intr.width, img_height=intr.height)
    params = init_traj_params(poses0, quats0)

    def loss_fn(p):
        return traj_forward(p, pts, intr.matrix(), poses0, quats0, prob)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gradients_flow_through_visibility():
    import jax

    pts = jnp.asarray(_cloud(seed=7))
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    t = jnp.zeros(3)

    def f(t, q):
        return jnp.sum(
            geometry.visibility(pts, q, t, INTR.matrix(), INTR.width, INTR.height)
        )

    gt, gq = jax.grad(f, argnums=(0, 1))(t, q)
    assert np.all(np.isfinite(np.asarray(gt))) and np.all(np.isfinite(np.asarray(gq)))
    assert np.linalg.norm(np.asarray(gt)) > 0
