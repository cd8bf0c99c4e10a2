import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_e_tpu.ops import lie


def rand_rot(key, n=()):
    w = jax.random.normal(key, n + (3,))
    return lie.so3_exp(w)


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (64, 3))
        # keep angles within the principal branch (< pi) so log is exact inverse
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) \
            * jax.random.uniform(key, (64, 1), minval=0.01, maxval=2.9)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-5)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert not np.any(np.isnan(np.asarray(R)))

    def test_log_near_pi(self):
        axis = np.array([0.3, -0.5, 0.81])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray(axis * 3.1415)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)

    def test_orthonormal(self):
        R = rand_rot(jax.random.PRNGKey(1), (16,))
        RtR = jnp.einsum('nij,nik->njk', R, R)
        np.testing.assert_allclose(np.asarray(RtR),
                                   np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


class TestQuat:
    def test_mat_quat_roundtrip(self):
        R = rand_rot(jax.random.PRNGKey(2), (32,))
        q = lie.quat_from_mat(R)
        R2 = lie.mat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_quat_mul_matches_mat_mul(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        R1, R2 = rand_rot(k1, (8,)), rand_rot(k2, (8,))
        q = lie.quat_mul(lie.quat_from_mat(R1), lie.quat_from_mat(R2))
        np.testing.assert_allclose(np.asarray(lie.mat_from_quat(q)),
                                   np.asarray(R1 @ R2), atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(4), (32, 6)) * 0.7
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=2e-5)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(5), (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply(self):
        xi = jax.random.normal(jax.random.PRNGKey(6), (6,))
        R, t = lie.se3_exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(7), (100, 3))
        out = lie.se3_apply(R, t, p)
        expect = (np.asarray(R) @ np.asarray(p).T).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_pose7_pack_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(8), (16, 6))
        R, t = lie.se3_exp(xi)
        p7 = lie.pose7_pack(R, t)
        assert p7.shape == (16, 7)
        R2, t2 = lie.pose7_unpack(p7)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-6)

    def test_mat4_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(9), (4, 6))
        R, t = lie.se3_exp(xi)
        T = lie.se3_to_mat4(R, t)
        assert T.shape == (4, 4, 4)
        R2, t2 = lie.se3_from_mat4(T)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2))
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2))


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(10), (32, 7)) * 0.8
        R, t, s = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_identity(self):
        R, t, s = lie.sim3_exp(jnp.zeros((7,)))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)
        np.testing.assert_allclose(float(s), 1.0, atol=1e-7)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(11), (8, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)

    def test_apply_matches_composition(self):
        xi = jax.random.normal(jax.random.PRNGKey(12), (7,)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(13), (10, 3))
        out = lie.sim3_apply(R, t, s, p)
        expect = float(s) * (np.asarray(R) @ np.asarray(p).T).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_sim8_pack_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(14), (5, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        p8 = lie.sim8_pack(R, t, s)
        R2, t2, s2 = lie.sim8_unpack(p8)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s2), atol=1e-6)


def test_jit_compatible():
    """All core ops must trace under jit without recompilation hazards."""
    f = jax.jit(lambda xi: lie.se3_log(*lie.se3_exp(xi)))
    xi = jax.random.normal(jax.random.PRNGKey(15), (4, 6))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=2e-5)
