"""Sharded fused-Pallas visibility vs the single-device kernel (virtual CPU
mesh, interpret-mode Pallas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops.pallas_vis import LANES, TILE_ROWS_CACHE, fused_lo_sum
from trajectory_optimization_tpu.parallel.mesh import make_mesh
from trajectory_optimization_tpu.parallel.sharded import shard_points
from trajectory_optimization_tpu.parallel.sharded_pallas import sharded_fused_lo_sum
from trajectory_optimization_tpu.utils.data import identity_quaternions
from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

INTR = default_intrinsics()


@pytest.fixture(scope="module")
def setup(cloud10, path10):
    mesh = make_mesh(8)
    n = TILE_ROWS_CACHE * LANES * 8  # one tile per shard
    pts = np.concatenate([cloud10] * 2)[:n].astype(np.float32)
    quats = identity_quaternions(len(path10))
    q = np.asarray(quats).copy()
    q[::3] = [0.9, 0.1, -0.3, 0.2]
    return mesh, jnp.asarray(pts), jnp.asarray(q), jnp.asarray(path10.astype(np.float32))


def test_sharded_forward_matches_single(setup):
    mesh, pts, quats, poses = setup
    P_shard = shard_points(mesh, pts)
    lo_sharded = sharded_fused_lo_sum(
        mesh, P_shard, quats, poses, INTR.matrix(), INTR.width, INTR.height
    )
    lo_single = fused_lo_sum(pts, quats, poses, INTR.matrix(), INTR.width, INTR.height)
    np.testing.assert_allclose(
        np.asarray(lo_sharded), np.asarray(lo_single), rtol=1e-4, atol=2e-4
    )


def test_sharded_gradients_match_single(setup):
    mesh, pts, quats, poses = setup
    g = jnp.asarray(
        np.random.default_rng(0).normal(size=(pts.shape[0],)).astype(np.float32)
    )

    def f_sharded(quats, poses):
        lo = sharded_fused_lo_sum(
            mesh, pts, quats, poses, INTR.matrix(), INTR.width, INTR.height
        )
        return jnp.sum(lo * g)

    def f_single(quats, poses):
        lo = fused_lo_sum(pts, quats, poses, INTR.matrix(), INTR.width, INTR.height)
        return jnp.sum(lo * g)

    gq_s, gt_s = jax.grad(f_sharded, argnums=(0, 1))(quats, poses)
    gq_1, gt_1 = jax.grad(f_single, argnums=(0, 1))(quats, poses)
    np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_1), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gq_s), np.asarray(gq_1), rtol=2e-3, atol=2e-3)


def test_sharded_rejects_undivisible(setup):
    mesh, pts, quats, poses = setup
    with pytest.raises(ValueError):
        sharded_fused_lo_sum(
            mesh, pts[:1000], quats, poses, INTR.matrix(), INTR.width, INTR.height
        )
