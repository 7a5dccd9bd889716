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
        _, u0s, u1s, u2s, rhos, _, _, _perm = _cosort_merge(
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


def test_sharded_pose_loss_matches_single_chip(mesh):
    """pose_loss_sharded == pose_forward(soft_hpr=True) on the same cloud:
    value to f32 noise, gradients to candidate-tie tolerance."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params, pose_forward,
    )
    from trajectory_optimization_tpu.parallel.pose_sharded import (
        pose_loss_sharded,
    )
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    # soft_hpr routing in pose_forward: >32k uses the binned kernel that
    # _local_mask shards — compare against exactly that tier
    n = 65536
    pts = jnp.asarray(_cloud(n, seed=7) + np.array([0.0, 0.0, 6.0]))
    valid = jnp.ones((n,), jnp.float32)
    prob = PoseProblem(img_width=intr.width, img_height=intr.height,
                       min_dist=1.0, max_dist=12.0, soft_hpr=True)
    params = init_pose_params(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    K = intr.matrix()

    def loss_ref(p):
        return pose_forward(p, pts, K, prob, valid=valid)[0]

    def loss_sh(p):
        return pose_loss_sharded(mesh, p, pts, valid, K, prob)[0]

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_sh, g_sh = jax.value_and_grad(loss_sh)(params)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-4)
    for k in ("trans", "quat"):
        a, b = np.asarray(g_ref[k]), np.asarray(g_sh[k])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 5e-3, (k, rel, a, b)


def test_sharded_pose_loss_plain_matches_single_chip(mesh):
    """pose_loss_sharded honors problem.soft_hpr=False: plain visibility,
    NOT a silently occlusion-gated loss (review-found) — value and grads
    must match single-chip pose_forward's default branch."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params, pose_forward,
    )
    from trajectory_optimization_tpu.parallel.pose_sharded import (
        pose_loss_sharded,
    )
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    n = 4096
    pts = jnp.asarray(_cloud(n, seed=9) + np.array([0.0, 0.0, 6.0]))
    valid = jnp.ones((n,), jnp.float32).at[-64:].set(0.0)  # padding tail
    prob = PoseProblem(img_width=intr.width, img_height=intr.height,
                       min_dist=1.0, max_dist=12.0, soft_hpr=False)
    params = init_pose_params(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    K = intr.matrix()

    (l_ref, aux_ref), g_ref = jax.value_and_grad(
        lambda p: pose_forward(p, pts, K, prob, valid=valid), has_aux=True
    )(params)
    (l_sh, obs_sh), g_sh = jax.value_and_grad(
        lambda p: pose_loss_sharded(mesh, p, pts, valid, K, prob),
        has_aux=True,
    )(params)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(obs_sh), np.asarray(aux_ref["observations"]),
        rtol=1e-5, atol=1e-7)
    for k in ("trans", "quat"):
        a, b = np.asarray(g_ref[k]), np.asarray(g_sh[k])
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
        assert rel < 1e-4, (k, rel)


def test_sharded_pose_loss_occlusion_mask_matches_single_chip(mesh):
    """pose_loss_sharded(occlusion_mask=...) mirrors the single-chip
    semantics in BOTH branches: the gate scales scores only and never feeds
    the soft-HPR coverer set (folding it into valid — the wps_sharded
    shortcut — would change which points occlude under soft_hpr=True)."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params, pose_forward,
    )
    from trajectory_optimization_tpu.parallel.pose_sharded import (
        pose_loss_sharded,
    )
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    n = 4096
    pts = jnp.asarray(_cloud(n, seed=11) + np.array([0.0, 0.0, 6.0]))
    valid = jnp.ones((n,), jnp.float32).at[-64:].set(0.0)
    rng = np.random.default_rng(3)
    occ = jnp.asarray((rng.random(n) > 0.3).astype(np.float32)
                      * rng.random(n).astype(np.float32))  # soft weights too
    params = init_pose_params(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    K = intr.matrix()

    for soft in (False, True):
        # soft_hpr_dense_max=0 forces the binned kernel single-chip — the
        # tier _local_mask shards — so the comparison is kernel-to-kernel
        prob = PoseProblem(img_width=intr.width, img_height=intr.height,
                           min_dist=1.0, max_dist=12.0, soft_hpr=soft,
                           soft_hpr_dense_max=0)
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            lambda p, pb=prob: pose_forward(
                p, pts, K, pb, valid=valid, occlusion_mask=occ),
            has_aux=True)(params)
        (l_sh, obs_sh), g_sh = jax.value_and_grad(
            lambda p, pb=prob: pose_loss_sharded(
                mesh, p, pts, valid, K, pb, hpr_cap=256,
                occlusion_mask=occ),
            has_aux=True)(params)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-4)
        d = np.abs(np.asarray(obs_sh) - np.asarray(aux_ref["observations"]))
        if soft:
            # per-element agreement is up to quantized-key candidate ties
            # (parallel.hpr_sharded docstring) — compare in bulk
            assert d.mean() < 5e-4, d.mean()
        else:
            assert d.max() < 1e-6, d.max()
        for k in ("trans", "quat"):
            a, b = np.asarray(g_ref[k]), np.asarray(g_sh[k])
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
            assert rel < 5e-3, (soft, k, rel)


def test_sharded_pose_step_optimizes(mesh):
    """A few make_sharded_pose_step iterations must increase total
    visibility (decrease the loss) — the full multi-chip occlusion-aware
    training loop, params+Adam replicated, cloud sharded."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig
    from trajectory_optimization_tpu.parallel.pose_sharded import (
        make_sharded_pose_step,
    )
    from trajectory_optimization_tpu.parallel.sharded import shard_points
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    n = 16384
    pts = _cloud(n, seed=8) + np.array([0.0, 0.0, 6.0])
    prob = PoseProblem(img_width=intr.width, img_height=intr.height,
                       min_dist=1.0, max_dist=12.0, soft_hpr=True)
    params = init_pose_params(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    init_fn, step_fn = make_sharded_pose_step(
        mesh, prob, OptimizerConfig(lr_pose=0.05, lr_quat=0.02), hpr_cap=256)
    opt_state = init_fn(params)
    P_sh, v_sh = shard_points(mesh, pts, np.ones(n, np.float32))
    K = intr.matrix()
    losses = []
    for _ in range(8):
        params, opt_state, loss, obs = step_fn(params, opt_state, P_sh, v_sh, K)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(np.asarray(obs)).all()


def test_sharded_fn_cached(mesh):
    """Repeat calls reuse the jitted shard_map (review-found: the
    uncached wrapper retraced every call, ~14x slower)."""
    from trajectory_optimization_tpu.parallel.hpr_sharded import _sharded_fn

    pts = jnp.asarray(_cloud(1024, seed=5))
    before = _sharded_fn.cache_info().hits
    _ = hpr_mask_soft_binned_sharded(pts, mesh, cap=64)
    _ = hpr_mask_soft_binned_sharded(pts, mesh, cap=64)
    assert _sharded_fn.cache_info().hits >= before + 1


def test_sharded_pose_step_occlusion_build(mesh):
    """make_sharded_pose_step(occlusion=True): the 6-arg step variant (its
    own in_shardings tuple — review-found untested wiring) must accept the
    sharded gate, optimize, and zero gated points' observations."""
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig
    from trajectory_optimization_tpu.parallel.pose_sharded import (
        make_sharded_pose_step,
    )
    from trajectory_optimization_tpu.parallel.sharded import shard_points
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    intr = default_intrinsics()
    n = 4096
    pts = jnp.asarray(_cloud(n, seed=13) + np.array([0.0, 0.0, 6.0]))
    valid = np.ones(n, np.float32)
    occ = (np.random.default_rng(5).random(n) > 0.4).astype(np.float32)
    prob = PoseProblem(img_width=intr.width, img_height=intr.height,
                       min_dist=1.0, max_dist=12.0, soft_hpr=True,
                       soft_hpr_dense_max=0, hpr_cap=256)
    init_fn, step_fn = make_sharded_pose_step(
        mesh, prob, OptimizerConfig(lr_pose=0.05, lr_quat=0.02),
        occlusion=True)
    params = init_pose_params(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))
    P_sh, v_sh = shard_points(mesh, pts, valid)
    _, o_sh = shard_points(mesh, pts, occ)
    st = init_fn(params)
    losses = []
    for _ in range(4):
        params, st, loss, obs = step_fn(params, st, P_sh, v_sh, o_sh,
                                        intr.matrix())
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    obs = np.asarray(obs)
    assert np.all(obs[occ == 0.0] == 0.0)
