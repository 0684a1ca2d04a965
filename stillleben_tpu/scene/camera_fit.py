"""Random camera pose that keeps all objects inside the frustum.

Reproduces Scene::chooseRandomCameraPose (reference src/scene.cpp:472-610):
random azimuth, elevation in [30 deg, 60 deg], then fit the left/right and
top/bottom frustum planes to the objects' bbox corner points and intersect
the plane pairs to get the backmost valid camera position.

Also Scene::chooseRandomLightDirection (src/scene.cpp:453-470).
Fully jittable / vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m

ELEVATION_LIMIT = float(np.deg2rad(30.0))


def _base_cam_rot() -> jax.Array:
    """Rotation into image coordinate system: columns (-y, -z, x)
    (reference src/scene.cpp:488-493)."""
    return jnp.array(
        [
            [0.0, 0.0, 1.0],
            [-1.0, 0.0, 0.0],
            [0.0, -1.0, 0.0],
        ],
        jnp.float32,
    )


def random_camera_rotation(key: jax.Array) -> jax.Array:
    k1, k2 = jax.random.split(key)
    azimuth = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
    elevation = jax.random.uniform(
        k2, (), minval=ELEVATION_LIMIT, maxval=jnp.pi / 2 - ELEVATION_LIMIT
    )
    R = m.rotation_z(azimuth) @ m.rotation_y(elevation) @ _base_cam_rot()
    return R


def fit_camera_position(
    cam_rot: jax.Array,  # (3,3) world rotation of the camera
    P: jax.Array,  # (4,4) projection
    points: jax.Array,  # (N, 3) object bbox corners in WORLD space
    point_valid: jax.Array,  # (N,) bool
) -> jax.Array:
    """Backmost camera position (world) such that all points are inside the
    left/right/top/bottom frustum planes (src/scene.cpp:520-600)."""
    # work in the camera-rotation-aligned system
    pts = points @ cam_rot  # == (cam_rot^T @ p^T)^T

    rows = P  # row-major: row(i) of Magnum == P[i]
    planes = jnp.stack(
        [
            rows[3] + rows[0],  # left
            rows[3] - rows[0],  # right
            rows[3] + rows[1],  # top
            rows[3] - rows[1],  # bottom
        ]
    )  # (4, 4)
    planes = planes / jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)

    # fit each plane: w = -min over points of dot(n, p)
    d = jnp.einsum("fi,ni->fn", planes[:, :3], pts)
    d = jnp.where(point_valid[None, :], d, jnp.inf)
    min_lambda = jnp.min(d, axis=1)
    w = -min_lambda  # (4,)

    def intersect_2d(l0, l1):
        inter = jnp.cross(l0, l1)
        bad = jnp.abs(inter[2]) < 1e-3
        inter = jnp.where(bad, jnp.array([0.0, 0.0, 1.0]), inter)
        return inter[0] / inter[2], inter[1] / inter[2]

    left = jnp.array([planes[0, 0], planes[0, 2], w[0]])
    right = jnp.array([planes[1, 0], planes[1, 2], w[1]])
    lr_x, lr_z = intersect_2d(left, right)

    top = jnp.array([planes[2, 1], planes[2, 2], w[2]])
    bottom = jnp.array([planes[3, 1], planes[3, 2], w[3]])
    tb_y, tb_z = intersect_2d(top, bottom)

    cam_pos_work = jnp.stack([lr_x, tb_y, jnp.minimum(lr_z, tb_z)])
    return cam_rot @ cam_pos_work


def choose_random_camera_pose(
    key: jax.Array,
    P: jax.Array,
    points: jax.Array,
    point_valid: jax.Array,
) -> jax.Array:
    """Full 4x4 camera pose (camera-to-world)."""
    R = random_camera_rotation(key)
    any_points = jnp.any(point_valid)
    pos = jnp.where(
        any_points,
        fit_camera_position(R, P, points, point_valid),
        R @ jnp.array([0.0, 0.0, -1.0]),  # reference fallback translation
    )
    return m.make_transform(R, pos)


def choose_random_light_direction(key: jax.Array, cam_pose: jax.Array) -> jax.Array:
    """Light direction in world: from above and on the camera side
    (reference src/scene.cpp:453-470)."""
    r = jax.random.normal(key, (3,))
    random_direction = m.normalize(
        jnp.stack([r[0], -jnp.abs(r[1]), -jnp.abs(r[2])])
    )
    light_dir_cam = -random_direction
    return cam_pose[:3, :3] @ light_dir_cam
