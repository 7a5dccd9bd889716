"""Property tests (SURVEY.md §4: binary↔smooth mask consistency, invariances)."""
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops import quat
from trajectory_optimization_tpu.ops.geometry import dist_mask, fov_mask, to_camera_frame
from trajectory_optimization_tpu.ops.scores import waypoint_scores
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

INTR = default_intrinsics()


def _cloud(n=4000, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(-8, 8, size=(n, 3)).astype(np.float32))


def test_smooth_fov_upper_bounds_binary():
    """Deep inside the frustum the smooth mask is high; outside it decays —
    thresholding the smooth mask must recover (a superset of) the binary one."""
    pts = _cloud() + jnp.array([0.0, 0.0, 6.0])
    smooth = np.asarray(fov_mask(pts, INTR.matrix(), INTR.width, INTR.height))
    binary = np.asarray(
        fov_mask(pts, INTR.matrix(), INTR.width, INTR.height, binary=True)
    )
    # every binary-visible point has a clearly nonzero smooth score
    assert smooth[binary].min() > 0.3
    # points with near-zero smooth score are never binary-visible
    assert not binary[smooth < 0.01].any()


def test_dist_mask_peaks_at_center_band():
    z = jnp.linspace(0.1, 12.0, 200)
    pts = jnp.stack([jnp.full_like(z, 3.0), jnp.full_like(z, 3.0), z], axis=1)
    m = np.asarray(dist_mask(pts, 1.0, 5.0))
    assert np.argmax(m) == np.argmin(np.abs(np.asarray(z) - 3.0))
    # exp(−½(2.9/2)²) ≈ 0.35 at z=0.1; exp(−½(9/2)²) ≈ 4e-5 at z=12
    assert m[0] < 0.4 and m[-1] < 1e-3


def test_scores_rigid_invariance():
    """Applying the same rigid transform to points and cameras leaves the
    visibility scores unchanged."""
    pts = _cloud(seed=1)
    q_cam = jnp.asarray(np.tile([1.0, 0, 0, 0], (3, 1)).astype(np.float32))
    t_cam = jnp.asarray(np.random.default_rng(2).uniform(-3, 3, (3, 3)).astype(np.float32))
    s0 = waypoint_scores(pts, q_cam, t_cam, INTR.matrix(), INTR.width, INTR.height)

    g = quat.normalize(jnp.array([0.7, 0.2, -0.4, 0.5]))
    shift = jnp.array([2.0, -1.0, 3.0])
    pts2 = quat.apply(g, pts) + shift
    t2 = quat.apply(g, t_cam) + shift
    q2 = quat.multiply(jnp.broadcast_to(g, (3, 4)), q_cam)
    s1 = waypoint_scores(pts2, q2, t2, INTR.matrix(), INTR.width, INTR.height)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-4)


def test_to_camera_frame_inverts():
    pts = _cloud(seed=3)
    q = quat.normalize(jnp.array([0.3, -0.5, 0.2, 0.9]))
    t = jnp.array([1.0, 2.0, -0.5])
    cam = to_camera_frame(pts, q, t)
    back = quat.apply(q, cam) + t
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_visibility_monotone_in_occlusion_gate(cloud10):
    """Gating with an occlusion mask can only reduce pose observations."""
    from trajectory_optimization_tpu.models.pose import PoseProblem, init_pose_params, pose_forward

    pts = jnp.asarray(cloud10[:4000])
    prob = PoseProblem(img_width=INTR.width, img_height=INTR.height)
    params = init_pose_params(
        np.array([[6.0, 2.0, 0.0]], np.float32), np.array([[1.0, 0, 0, 0]], np.float32)
    )
    _, aux_free = pose_forward(params, pts, INTR.matrix(), prob)
    gate = jnp.asarray((np.arange(4000) % 2 == 0).astype(np.float32))
    _, aux_gated = pose_forward(
        params, pts, INTR.matrix(), prob, occlusion_mask=gate
    )
    assert float(aux_gated["observations"].sum()) <= float(aux_free["observations"].sum())
