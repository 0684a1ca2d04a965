"""Core 3D math: quaternions, rigid transforms, matrix helpers.

All functions are pure jax.numpy, fully jittable/vmappable, and operate on
float32 by default. Conventions:

- Quaternions are (w, x, y, z) scalar-first, unit norm.
- Homogeneous transforms are 4x4 row-major: ``p_out = T @ [p, 1]``.
- Rotation matrices act on column vectors: ``v_out = R @ v``.

Semantics mirrored from the reference implementation (AIS-Bonn/stillleben):
- random quaternion sampling: 4 iid normals, normalized
  (reference src/scene.cpp:302-312).
- rigid-pose validation: det(R) ~ 1 and orthonormal columns
  (reference src/object.cpp:349-369).
- SVD re-orthonormalization of a noisy rotation
  (reference python/stillleben/diff.py:525-590 ``apply_pose_delta``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_matrix(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix [v]x such that [v]x @ u = v x u.

    Mirrors reference src/pose.cpp:13-22 (which stores the transpose
    column-major, i.e. the same row-major matrix).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Gradient-safe normalize: no NaN cotangents for (near-)zero vectors.

    ``v / max(norm(v), eps)`` still propagates NaN through the norm's
    backward at v = 0; masking the squared norm BEFORE the sqrt keeps the
    whole backward finite (degenerate inputs pass through unscaled).
    """
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    safe = jnp.where(n2 < eps, 1.0, n2)
    return v * jax.lax.rsqrt(safe)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    safe = jnp.where(n2 < eps, 1.0, n2)
    return q * jax.lax.rsqrt(safe)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """3x3 (or upper-left of 4x4) rotation matrix -> unit quaternion (w,x,y,z).

    Branch-free Shepperd's method (jit/vmap safe): compute all four candidate
    quaternions and select the one seeded by the largest diagonal combination.
    """
    m = m[..., :3, :3]
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    # candidate 0: seeded by trace
    q0 = jnp.stack(
        [
            1.0 + trace,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    # candidate 1: seeded by m00
    q1 = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m00 - m11 - m22,
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    # candidate 2: seeded by m11
    q2 = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 + m11 - m00 - m22,
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    # candidate 3: seeded by m22
    q3 = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 + m22 - m00 - m11,
        ],
        axis=-1,
    )

    scores = jnp.stack([trace, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def random_quaternion(key: jax.Array, shape=()) -> jax.Array:
    """4 iid standard normals, normalized (reference src/scene.cpp:302-312)."""
    q = jax.random.normal(key, shape + (4,))
    return quat_normalize(q)


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation (shortest path), jit-safe."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# 4x4 homogeneous transforms (row-major, act on column vectors)
# ---------------------------------------------------------------------------

def make_transform(rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """Build 4x4 from 3x3 rotation and 3-translation. Batched-friendly."""
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_from_quat_pos(q: jax.Array, pos: jax.Array) -> jax.Array:
    return make_transform(quat_to_matrix(q), pos)


def transform_point(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply 4x4 T to 3D point(s): (..., 4, 4) x (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p) + T[..., :3, 3]


def transform_vector(T: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the rotation/scale part of T."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], v)


def invert_rigid(T: jax.Array) -> jax.Array:
    """Invert a rigid 4x4 transform (R^T, -R^T t)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def rotation_x(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rotation_y(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rotation_z(angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def axis_angle_to_matrix(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation."""
    axis = normalize(axis)
    K = cross_matrix(axis)
    eye = jnp.eye(3, dtype=axis.dtype)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return eye + s * K + (1.0 - c) * (K @ K)


def orthonormalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation onto SO(3) via SVD (det +1 enforced).

    Mirrors the reference's pose re-orthonormalization
    (python/stillleben/diff.py apply_pose_delta, src/mesh.cpp:1050-1073).
    """
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt


def is_rigid(T: jax.Array, tol: float = 1e-3) -> jax.Array:
    """Check R orthonormal with det ~ +1 and last row (0,0,0,1)."""
    R = T[..., :3, :3]
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3, dtype=T.dtype)).max(axis=(-1, -2))
    det_err = jnp.abs(jnp.linalg.det(R) - 1.0)
    last = jnp.abs(T[..., 3, :] - jnp.array([0, 0, 0, 1], dtype=T.dtype)).max(axis=-1)
    return (err < tol) & (det_err < tol) & (last < tol)


def look_at(position: jax.Array, target: jax.Array, up: jax.Array) -> jax.Array:
    """Camera pose matrix for a +Z-forward camera (reference src/scene.cpp:205-215).

    Returns camera-to-world 4x4: columns are camera x/y/z axes in world frame.
    z = normalize(target - position); x = normalize(z x up); y = z x x.
    """
    z = normalize(target - position)
    x = normalize(jnp.cross(z, up))
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-1)
    return make_transform(R, position)


def perpendicular_vector(x: jax.Array) -> jax.Array:
    """A unit vector perpendicular to x (reference include/stillleben/pose.h:122-130)."""
    use_y = jnp.abs(x[..., 0]) > 0.8
    alt_y = jnp.cross(x, jnp.array([0.0, 1.0, 0.0], dtype=x.dtype))
    alt_x = jnp.cross(x, jnp.array([1.0, 0.0, 0.0], dtype=x.dtype))
    return normalize(jnp.where(use_y[..., None], alt_y, alt_x))
