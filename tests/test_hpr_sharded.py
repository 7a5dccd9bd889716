"""Point-sharded differentiable HPR vs the single-chip kernel.

Runs on the 8-virtual-device CPU mesh (conftest). The sharded kernel's
candidate merge reproduces the single-chip per-bin top-cap set exactly up
to ties in the quantized distance key, so values agree to f32 noise and
gradients to reassociation noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops.hpr import hpr_mask_soft_binned
from trajectory_optimization_tpu.parallel.hpr_sharded import (
    hpr_mask_soft_binned_sharded,
)
from trajectory_optimization_tpu.parallel.mesh import make_mesh


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, 3)) * 5.0).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_matches_single_chip(mesh):
    pts = jnp.asarray(_cloud(16384))
    ref = np.asarray(hpr_mask_soft_binned(pts, cap=256))
    sh = np.asarray(hpr_mask_soft_binned_sharded(pts, mesh, cap=256))
    d = np.abs(ref - sh)
    # tie-order at the cap boundary can swap equal-key candidates; bulk
    # must match to f32 noise
    assert d.mean() < 1e-4, d.mean()
    assert (d > 0.01).mean() < 1e-3, (d > 0.01).sum()


def test_sharded_valid_mask(mesh):
    pts = _cloud(12000, seed=1)
    from trajectory_optimization_tpu.utils.data import pad_points

    padded, valid = pad_points(pts, 16384)
    ref = np.asarray(hpr_mask_soft_binned(
        jnp.asarray(padded), cap=256, valid=jnp.asarray(valid)))
    sh = np.asarray(hpr_mask_soft_binned_sharded(
        jnp.asarray(padded), mesh, cap=256, valid=jnp.asarray(valid)))
    d = np.abs(ref - sh)
    assert d.mean() < 1e-4, d.mean()
    assert sh[len(pts):].max() == 0.0


def test_sharded_gradients_match(mesh):
    pts = jnp.asarray(_cloud(8192, seed=2))
    w = jnp.asarray(np.random.default_rng(3).normal(size=8192)
                    .astype(np.float32))

    g_ref = np.asarray(jax.grad(
        lambda p: jnp.sum(hpr_mask_soft_binned(p, cap=256) * w))(pts))
    g_sh = np.asarray(jax.grad(
        lambda p: jnp.sum(
            hpr_mask_soft_binned_sharded(p, mesh, cap=256) * w))(pts))
    rel = (np.linalg.norm(g_ref - g_sh)
           / max(np.linalg.norm(g_ref), 1e-30))
    assert np.isfinite(g_sh).all()
    # tie-order at the candidate-cap boundary flips a few near-threshold
    # pairs; bulk agreement is what the optimizer sees
    assert rel < 5e-3, rel


def test_merge_cosort_vjp_matches_sort_autodiff():
    """The batched merge co-sort's scatter-free VJP must reproduce
    autodiff-through-lax.sort exactly, ties included (the gathered
    candidate keys are tie-heavy: quantized distances plus repeated
    0x7FFFFFFF invalid-row sentinels)."""
    from trajectory_optimization_tpu.parallel.hpr_sharded import _cosort_merge

    rng = np.random.default_rng(11)
    b, n = 37, 512
    key = jnp.asarray(rng.integers(0, 9, (b, n)).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 1 << 20, (b, n)).astype(np.int32))
    ok = jnp.asarray(rng.integers(0, 2, (b, n)).astype(np.int32))
    flts = [jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))
            for _ in range(4)]
    cot = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

    def via_custom(u0, u1, u2, rho):
        _, u0s, u1s, u2s, rhos, _, _ = _cosort_merge(
            key, u0, u1, u2, rho, gid, ok)
        return jnp.sum((u0s + u1s - u2s + rhos) * cot)

    def via_autodiff(u0, u1, u2, rho):
        _, u0s, u1s, u2s, rhos, _, _ = jax.lax.sort(
            (key, u0, u1, u2, rho, gid, ok), num_keys=1, dimension=1)
        return jnp.sum((u0s + u1s - u2s + rhos) * cot)

    va, ga = jax.value_and_grad(via_custom, argnums=(0, 1, 2, 3))(*flts)
    vb, gb = jax.value_and_grad(via_autodiff, argnums=(0, 1, 2, 3))(*flts)
    assert float(va) == float(vb)
    for a, b_ in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_sharded_rejects_indivisible(mesh):
    with pytest.raises(ValueError):
        hpr_mask_soft_binned_sharded(jnp.zeros((1001, 3)), mesh)


def test_sharded_cap_exceeds_shard(mesh):
    """cap > n_local keeps the GLOBAL candidate budget: each shard
    contributes its min(cap, n_local) closest per bin, and the merge keeps
    min(cap, N) — matching the single-chip kernel called with the same
    cap, NOT a silently shard-clamped one (review-found)."""
    pts = jnp.asarray(_cloud(2048, seed=4))
    # n_local = 256 < cap = 1024 < N = 2048
    sh = np.asarray(hpr_mask_soft_binned_sharded(pts, mesh, cap=1024))
    ref = np.asarray(hpr_mask_soft_binned(pts, cap=1024))
    d = np.abs(ref - sh)
    assert d.mean() < 5e-4, d.mean()


def test_sharded_fn_cached(mesh):
    """Repeat calls reuse the jitted shard_map (review-found: the
    uncached wrapper retraced every call, ~14x slower)."""
    from trajectory_optimization_tpu.parallel.hpr_sharded import _sharded_fn

    pts = jnp.asarray(_cloud(1024, seed=5))
    before = _sharded_fn.cache_info().hits
    _ = hpr_mask_soft_binned_sharded(pts, mesh, cap=64)
    _ = hpr_mask_soft_binned_sharded(pts, mesh, cap=64)
    assert _sharded_fn.cache_info().hits >= before + 1
