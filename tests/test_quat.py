import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajectory_optimization_tpu.ops import quat

from oracles import quat_rotmat


def _random_unit_quats(n, seed=0):
    r = np.random.default_rng(seed)
    q = r.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_normalize():
    q = jnp.array([[2.0, 0.0, 0.0, 0.0], [0.0, 3.0, 4.0, 0.0]])
    out = quat.normalize(q)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)
    # zero quat stays finite (torch F.normalize semantics)
    assert np.all(np.isfinite(quat.normalize(jnp.zeros((1, 4)))))


def test_apply_matches_matrix():
    qs = _random_unit_quats(32)
    v = np.random.default_rng(1).normal(size=(32, 3))
    out = np.asarray(quat.apply(jnp.asarray(qs), jnp.asarray(v)))
    for i in range(32):
        np.testing.assert_allclose(out[i], quat_rotmat(qs[i]) @ v[i], atol=1e-5)


def test_to_matrix_matches_oracle():
    qs = _random_unit_quats(16, seed=2)
    R = np.asarray(quat.to_matrix(jnp.asarray(qs)))
    for i in range(16):
        np.testing.assert_allclose(R[i], quat_rotmat(qs[i]), atol=1e-6)


def test_conjugate_inverts_rotation():
    qs = jnp.asarray(_random_unit_quats(8, seed=3))
    v = jnp.asarray(np.random.default_rng(4).normal(size=(8, 3)))
    back = quat.apply(quat.conjugate(qs), quat.apply(qs, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_multiply_composes():
    a = jnp.asarray(_random_unit_quats(8, seed=5))
    b = jnp.asarray(_random_unit_quats(8, seed=6))
    v = jnp.asarray(np.random.default_rng(7).normal(size=(8, 3)))
    lhs = quat.apply(quat.multiply(a, b), v)
    rhs = quat.apply(a, quat.apply(b, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_from_matrix_roundtrip():
    qs = _random_unit_quats(64, seed=8)
    qs = qs * np.where(qs[:, :1] < 0, -1.0, 1.0)  # canonical w >= 0
    R = quat.to_matrix(jnp.asarray(qs))
    back = np.asarray(quat.from_matrix(R))
    np.testing.assert_allclose(back, qs, atol=1e-5)


def test_from_euler_identity_and_quarter_turn():
    np.testing.assert_allclose(
        np.asarray(quat.from_euler(0.0, 0.0, 0.0)), [1, 0, 0, 0], atol=1e-7
    )
    # yaw pi/2 rotates x-axis to y-axis
    q = quat.from_euler(0.0, 0.0, np.pi / 2)
    v = quat.apply(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_wxyz_xyzw_roundtrip():
    q = jnp.asarray(_random_unit_quats(4, seed=9))
    np.testing.assert_allclose(
        np.asarray(quat.xyzw_to_wxyz(quat.wxyz_to_xyzw(q))), np.asarray(q)
    )


def test_random_unit_norm():
    q = quat.random(jax.random.PRNGKey(0), 100)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=1), 1.0, atol=1e-5)
    assert np.all(np.asarray(q)[:, 0] >= 0)
