import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stillleben_tpu.core import math as m


def test_quat_roundtrip():
    key = jax.random.PRNGKey(0)
    q = m.random_quaternion(key, (32,))
    R = m.quat_to_matrix(q)
    q2 = m.matrix_to_quat(R)
    # q and -q are the same rotation; matrix_to_quat canonicalizes w>=0
    q_canon = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q_canon), atol=1e-5)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = m.random_quaternion(key, (8,))
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    r1 = m.quat_rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", m.quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_quat_multiply_composes():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    qa = m.random_quaternion(k1)
    qb = m.random_quaternion(k2)
    R = m.quat_to_matrix(m.quat_multiply(qa, qb))
    R2 = m.quat_to_matrix(qa) @ m.quat_to_matrix(qb)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_transform_invert():
    key = jax.random.PRNGKey(4)
    q = m.random_quaternion(key)
    T = m.transform_from_quat_pos(q, jnp.array([1.0, -2.0, 3.0]))
    I = m.invert_rigid(T) @ T
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)
    assert bool(m.is_rigid(T))


def test_orthonormalize():
    R = m.quat_to_matrix(m.random_quaternion(jax.random.PRNGKey(5)))
    noisy = R + 0.05 * jax.random.normal(jax.random.PRNGKey(6), (3, 3))
    R2 = m.orthonormalize(noisy)
    np.testing.assert_allclose(
        np.asarray(R2 @ R2.T), np.eye(3), atol=1e-5
    )
    assert abs(float(jnp.linalg.det(R2)) - 1.0) < 1e-5


def test_look_at_points_camera_z_forward():
    pos = jnp.array([0.0, 0.0, 2.0])
    target = jnp.zeros(3)
    up = jnp.array([0.0, 1.0, 0.0])
    T = m.look_at(pos, target, up)
    # camera z axis (3rd column) points from pos toward target
    np.testing.assert_allclose(np.asarray(T[:3, 2]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(pos), atol=1e-6)
    assert bool(m.is_rigid(T))


def test_rotation_constructors():
    a = jnp.float32(0.3)
    for rot, axis in [(m.rotation_x, [1, 0, 0]), (m.rotation_y, [0, 1, 0]), (m.rotation_z, [0, 0, 1])]:
        R = rot(a)
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(m.axis_angle_to_matrix(jnp.array(axis, jnp.float32), a)), atol=1e-6
        )


def test_user_facing_quat_xyzw():
    from stillleben_tpu.core.quat import matrix_to_quat, quat_to_matrix

    R = np.asarray(m.rotation_z(jnp.float32(np.pi / 2)))
    q = matrix_to_quat(R)  # xyzw
    assert q.shape == (4,)
    # rotation about z: x=y=0
    assert abs(q[0]) < 1e-6 and abs(q[1]) < 1e-6
    R2 = quat_to_matrix(q)
    np.testing.assert_allclose(R2, R, atol=1e-6)
