"""Golden tests for rotation conversions: round trips, group properties,
and agreement with scipy-free analytic cases. Semantics must match the
pytorch3d conventions the reference uses (module.py:4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from exavatar_release_tpu.core import rotations as rot


def random_axis_angle(rng, n=64, max_angle=np.pi * 0.95):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_axis_angle_matrix_roundtrip(rng):
    aa = random_axis_angle(rng)
    R = rot.axis_angle_to_matrix(aa)
    aa2 = rot.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_matrix_orthonormal(rng):
    aa = random_axis_angle(rng)
    R = np.asarray(rot.axis_angle_to_matrix(aa))
    eye = np.eye(3)[None].repeat(R.shape[0], 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quaternion_roundtrip(rng):
    aa = random_axis_angle(rng)
    q = rot.axis_angle_to_quaternion(aa)
    R1 = rot.quaternion_to_matrix(q)
    R2 = rot.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    q2 = rot.matrix_to_quaternion(R2)
    # sign canonicalization: w >= 0 both ways
    np.testing.assert_allclose(np.abs(np.asarray(q2)), np.abs(np.asarray(q)), atol=1e-4)


def test_rotation_6d_roundtrip(rng):
    aa = random_axis_angle(rng)
    R = rot.axis_angle_to_matrix(aa)
    d6 = rot.matrix_to_rotation_6d(R)
    R2 = rot.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_known_rotations():
    # 90 degrees about z
    aa = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    R = np.asarray(rot.axis_angle_to_matrix(aa))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)
    q = np.asarray(rot.axis_angle_to_quaternion(aa))
    s = np.sin(np.pi / 4)
    np.testing.assert_allclose(q, [np.cos(np.pi / 4), 0, 0, s], atol=1e-6)


def test_zero_angle_stable():
    aa = jnp.zeros((4, 3), dtype=jnp.float32)
    R = np.asarray(rot.axis_angle_to_matrix(aa))
    np.testing.assert_allclose(R, np.eye(3)[None].repeat(4, 0), atol=1e-7)
    aa2 = np.asarray(rot.matrix_to_axis_angle(rot.axis_angle_to_matrix(aa)))
    np.testing.assert_allclose(aa2, 0.0, atol=1e-6)


def test_quaternion_multiply_matches_matrix(rng):
    a = random_axis_angle(rng, 8)
    b = random_axis_angle(rng, 8)
    qa, qb = rot.axis_angle_to_quaternion(a), rot.axis_angle_to_quaternion(b)
    q_ab = rot.quaternion_multiply(qa, qb)
    R_ab = np.asarray(rot.quaternion_to_matrix(q_ab))
    R_expected = np.asarray(rot.axis_angle_to_matrix(a)) @ np.asarray(
        rot.axis_angle_to_matrix(b)
    )
    np.testing.assert_allclose(R_ab, R_expected, atol=1e-5)


def test_gradients_finite(rng):
    import jax

    aa = jnp.asarray(random_axis_angle(rng, 4))

    def f(x):
        return jnp.sum(rot.axis_angle_to_matrix(x) ** 2)

    g = jax.grad(f)(aa)
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(f)(jnp.zeros((4, 3), dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(g0)))
