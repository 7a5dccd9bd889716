import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops.render import (
    denormalize_image,
    normalized_xyz_colors,
    render_point_cloud,
)
from trajectory_optimization_tpu.ops.voxel import (
    occupancy_grid,
    occupancy_grid_jit,
    voxel_downsample,
    voxel_downsample_jit,
)
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

INTR = default_intrinsics()
K_SMALL = jnp.array([[100.0, 0.0, 32.0], [0.0, 100.0, 32.0], [0.0, 0.0, 1.0]])


def test_render_background_is_white():
    pts = jnp.array([[100.0, 100.0, 5.0]])  # projects far outside
    img = render_point_cloud(pts, K_SMALL, 64, 64)
    assert img.shape == (64, 64, 3)
    np.testing.assert_allclose(np.asarray(img), 1.0)


def test_render_nearest_point_wins():
    # two points projecting to the image center, different depths
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 5.0]])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img = np.asarray(
        render_point_cloud(pts, K_SMALL, 64, 64, colors=colors, znear=1.0, zfar=10.0)
    )
    np.testing.assert_allclose(img[32, 32], [1.0, 0.0, 0.0])  # red (near) wins


def test_render_depth_clipping():
    pts = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, 20.0]])  # before znear / past zfar
    img = np.asarray(render_point_cloud(pts, K_SMALL, 64, 64, znear=1.0, zfar=10.0))
    np.testing.assert_allclose(img, 1.0)  # nothing drawn


def test_render_footprint_scales_with_depth():
    colors = jnp.array([[0.0, 0.0, 0.0]])
    near = np.asarray(
        render_point_cloud(jnp.array([[0.0, 0.0, 1.5]]), K_SMALL, 64, 64, colors=colors)
    )
    far = np.asarray(
        render_point_cloud(jnp.array([[0.0, 0.0, 8.0]]), K_SMALL, 64, 64, colors=colors)
    )
    assert (near < 1).sum() > (far < 1).sum() > 0


def test_render_sample_cloud_smoke(cloud10):
    cam = jnp.asarray(cloud10[:5000] - np.array([6.0, 2.0, -3.0], np.float32))
    img = render_point_cloud(
        cam, INTR.matrix(), 404, 308, znear=1.0, zfar=10.0  # quarter res
    )
    img = np.asarray(img)
    assert img.shape == (404, 308, 3)
    assert (img < 1.0).any()  # something was drawn
    d = denormalize_image(img)
    assert d.min() >= 0 and d.max() <= 1


def test_normalized_xyz_colors_range():
    c = np.asarray(normalized_xyz_colors(jnp.asarray(np.random.default_rng(0).normal(size=(100, 3)))))
    assert c.min() >= 0 and c.max() <= 1


def test_voxel_downsample_centroids():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], dtype=np.float32
    )
    out = voxel_downsample(pts, 1.0)
    assert out.shape == (2, 3)
    got = out[np.argsort(out[:, 0])]
    np.testing.assert_allclose(got[0], [0.15, 0.15, 0.15], atol=1e-6)
    np.testing.assert_allclose(got[1], [5.0, 5.0, 5.0], atol=1e-6)


def test_voxel_downsample_z_limits():
    pts = np.array([[0, 0, -5.0], [0, 0, 0.0], [0, 0, 5.0]], dtype=np.float32)
    out = voxel_downsample(pts, 0.5, z_limits=(-1.0, 1.0))
    assert out.shape == (1, 3)


def test_voxel_downsample_jit_matches_host():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(5000, 3)).astype(np.float32)
    host = voxel_downsample(pts, 0.5)
    # bounded-table design merges ~V²/2T voxels on hash collisions; with a
    # 2^20 table and ~3.7k voxels that's ~7 expected
    cent, occ = voxel_downsample_jit(jnp.asarray(pts), 0.5, table_size=1 << 20)
    dev = np.asarray(cent)[np.asarray(occ) > 0]
    expected_collisions = len(host) ** 2 / (2 * (1 << 20))
    assert abs(len(dev) - len(host)) <= 10 * expected_collisions + 5
    # centroids of non-collided voxels must appear exactly
    host_set = {tuple(r) for r in host.round(4).tolist()}
    dev_set = {tuple(r) for r in dev.round(4).tolist()}
    assert len(host_set & dev_set) >= len(host) - 20 * expected_collisions - 5


def test_occupancy_grid_parity_and_jit():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 20, size=(2000, 3)).astype(np.float64) * [4, 1, 0.4] + [0, -10, -4]
    g = occupancy_grid(pts)
    assert g.shape == (600, 666, 67)  # z uses round(): 10/0.15 -> 67
    gj = np.asarray(occupancy_grid_jit(jnp.asarray(pts, jnp.float32)))
    assert (g == gj).mean() > 0.999  # f32 cell-boundary quantization only


def test_occupancy_grid_upper_bound_edge():
    """Points inside the bounds filter but past the truncated grid dims
    (e.g. y=49.95 -> iy == dims[1]) must be dropped like the native twin —
    not raise (host path) or alias into the next x-row (jit flat-index
    path). Review findings 1-2, both reproduced before the fix."""
    # second point sits mid-cell (z=0.0 is exactly a cell edge, where f32
    # and f64 quantization legitimately differ)
    pts = np.array([[0.0, 49.95, 0.0], [10.01, 0.04, 0.07]])
    g = occupancy_grid(pts)  # raised IndexError before the fix
    gj = np.asarray(occupancy_grid_jit(jnp.asarray(pts, jnp.float32)))
    assert g[int(10.01 / 0.15), int(50.04 / 0.15), int(4.57 / 0.15)] == 1
    # the edge point contributes nowhere — especially not to (1, 0, z)
    assert g.sum() == 1 and gj.sum() == 1
    np.testing.assert_array_equal(np.argwhere(g == 1), np.argwhere(gj == 1))


def test_native_voxel_matches_numpy():
    from trajectory_optimization_tpu.native import native_available, voxel_downsample_native

    rng = np.random.default_rng(2)
    pts = rng.uniform(-10, 10, size=(20000, 3)).astype(np.float32)
    a = voxel_downsample_native(pts, 0.5)
    b = voxel_downsample(pts, 0.5)
    assert a.shape == b.shape
    key = lambda x: np.lexsort((x[:, 2].round(4), x[:, 1].round(4), x[:, 0].round(4)))
    np.testing.assert_allclose(a[key(a)], b[key(b)], atol=1e-4)
