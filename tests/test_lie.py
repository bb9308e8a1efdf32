"""Unit tests for the Lie-group core (Sim3/SE3/SO3 exp/log/adjoint).

Mirrors the "Sim3 exp/log round-trips" seam called out in SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.math import lie

KEY = jax.random.PRNGKey(0)


def rand_vec(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, dtype=jnp.float64)


def rand_rotvec(key, n, max_angle=3.0):
    """Random rotation vectors with |w| < max_angle (< pi for log-injectivity)."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3), dtype=jnp.float64)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    ang = jax.random.uniform(k2, (n, 1), dtype=jnp.float64, maxval=max_angle)
    return axis * ang


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_rotvec(KEY, 64)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-9)

    def test_log_exp_matrix_roundtrip_beyond_pi(self):
        """exp(log(R)) == R even when generated with |w| > pi."""
        w = rand_vec(KEY, (64, 3), scale=2.5)
        R = lie.so3_exp(w)
        R2 = lie.so3_exp(lie.so3_log(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-11)

    def test_exp_orthonormal(self):
        w = rand_vec(KEY, (32, 3), scale=3.0)
        R = lie.so3_exp(w)
        eye = jnp.eye(3)[None].repeat(32, 0)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), eye, atol=1e-12)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)

    def test_small_angle(self):
        w = jnp.array([[0.0, 0.0, 0.0], [1e-10, -2e-10, 3e-10]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-15)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-15)

    def test_near_pi(self):
        # rotation by pi - 1e-7 about a skew axis
        axis = jnp.array([1.0, 2.0, -0.5])
        axis = axis / jnp.linalg.norm(axis)
        theta = jnp.pi - 1e-7
        w = theta * axis
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)

    def test_exactly_pi(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        w = jnp.pi * axis
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        # log at pi is +-pi*axis; both are valid
        assert min(np.linalg.norm(w2 - w), np.linalg.norm(w2 + w)) < 1e-6

    def test_grad_at_zero(self):
        g = jax.jacfwd(lie.so3_exp)(jnp.zeros(3))
        # d exp / d w at 0 is the generator basis
        expected = np.stack([lie.hat(np.eye(3)[i]) for i in range(3)], axis=-1)
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self):
        k1, k2 = jax.random.split(KEY)
        xi = jnp.concatenate([rand_vec(k1, (64, 3)), rand_rotvec(k2, 64)], axis=-1)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)

    def test_inverse(self):
        xi = rand_vec(KEY, (16, 6))
        T = lie.se3_exp(xi)
        eye = jnp.eye(4)[None].repeat(16, 0)
        np.testing.assert_allclose(np.asarray(T @ lie.se3_inv(T)), eye, atol=1e-12)

    def test_adjoint_identity(self):
        """T exp(xi) T^-1 == exp(Adj_T xi)."""
        k1, k2 = jax.random.split(KEY)
        T = lie.se3_exp(rand_vec(k1, (8, 6)))
        xi = rand_vec(k2, (8, 6), scale=0.3)
        lhs = T @ lie.se3_exp(xi) @ lie.se3_inv(T)
        rhs = lie.se3_exp(jnp.einsum("bij,bj->bi", lie.se3_adj(T), xi))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)


class TestSim3:
    def test_exp_log_roundtrip(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        xi = jnp.concatenate(
            [rand_vec(k1, (64, 3)), rand_rotvec(k2, 64),
             rand_vec(k3, (64, 1), scale=0.5)], axis=-1)
        S = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)

    def test_scale_extraction(self):
        xi = rand_vec(KEY, (16, 7), scale=0.5)
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(
            np.asarray(lie.sim3_scale(S)), np.exp(np.asarray(xi[:, 6])), rtol=1e-10
        )

    def test_identity_scale_matches_se3(self):
        xi6 = rand_vec(KEY, (16, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
        np.testing.assert_allclose(
            np.asarray(lie.sim3_exp(xi7)), np.asarray(lie.se3_exp(xi6)), atol=1e-10
        )

    def test_inverse(self):
        xi = rand_vec(KEY, (16, 7), scale=0.5)
        S = lie.sim3_exp(xi)
        eye = jnp.eye(4)[None].repeat(16, 0)
        np.testing.assert_allclose(np.asarray(S @ lie.sim3_inv(S)), eye, atol=1e-10)

    def test_adjoint_identity(self):
        k1, k2 = jax.random.split(KEY)
        S = lie.sim3_exp(rand_vec(k1, (8, 7), scale=0.4))
        xi = rand_vec(k2, (8, 7), scale=0.2)
        lhs = S @ lie.sim3_exp(xi) @ lie.sim3_inv(S)
        rhs = lie.sim3_exp(jnp.einsum("bij,bj->bi", lie.sim3_adj(S), xi))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)

    def test_pure_scale(self):
        xi = jnp.zeros(7).at[6].set(0.7)
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(S[:3, :3]), np.exp(0.7) * np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.asarray(lie.sim3_log(S)), np.asarray(xi), atol=1e-12)

    def test_small_sigma_large_theta(self):
        xi = jnp.array([0.3, -0.2, 0.5, 1.2, -0.7, 0.4, 1e-12])
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.sim3_log(S)), np.asarray(xi), atol=1e-8)

    def test_large_sigma_small_theta(self):
        xi = jnp.array([0.3, -0.2, 0.5, 1e-12, -1e-12, 0.0, 0.9])
        S = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.sim3_log(S)), np.asarray(xi), atol=1e-8)


class TestQuat:
    def test_roundtrip(self):
        w = rand_vec(KEY, (64, 3), scale=2.5)
        R = lie.so3_exp(w)
        q = lie.rotmat_to_quat(R)
        R2 = lie.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)

    def test_identity(self):
        q = lie.rotmat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-12)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
