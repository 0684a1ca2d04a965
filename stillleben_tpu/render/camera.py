"""Camera model: computer-vision-convention perspective projection.

Reproduces the reference's camera semantics (src/scene.cpp:222-253):

- the camera looks along **+Z** in its own frame (CV convention, y down in
  image),
- the projection keeps X and Y but flips Z relative to standard OpenGL, so
  clip-space w equals camera-space z (positive in front of the camera),
- near = 0.1, far = 10 fixed,
- pixel mapping is the classic pinhole: ``u = fx * x/z + cx``,
  ``v = fy * y/z + cy`` with (u, v) in pixels, v down, row 0 = top.

The projection matrix is returned **row-major** (acts on column vectors);
the reference stores the same matrix column-major in Magnum.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

DEFAULT_NEAR = 0.1
DEFAULT_FAR = 10.0
DEFAULT_HFOV_DEG = 58.0  # reference src/scene.cpp:138


def projection_from_intrinsics(
    fx, fy, cx, cy, width, height, near: float = DEFAULT_NEAR, far: float = DEFAULT_FAR
) -> jax.Array:
    """Build the reference's 4x4 projection (src/scene.cpp:222-253), row-major.

    clip = P @ [x, y, z, 1]^T with clip.w = z (camera-space depth);
    NDC x = (2 fx x/z + 2 cx - W)/W, NDC y = (2 fy y/z + 2 cy - H)/H,
    NDC z = ((f+n) z - 2 f n) / ((f-n) z).
    """
    n, f = near, far
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    cx = jnp.asarray(cx, jnp.float32)
    cy = jnp.asarray(cy, jnp.float32)
    W = jnp.asarray(width, jnp.float32)
    H = jnp.asarray(height, jnp.float32)

    L = -cx * n / fx
    R = (W - cx) * n / fx
    T = -cy * n / fy
    B = (H - cy) * n / fy

    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    P = jnp.stack(
        [
            jnp.stack([2 * n / (R - L), zero, (R + L) / (L - R), zero], -1),
            jnp.stack([zero, 2 * n / (B - T), (T + B) / (T - B), zero], -1),
            jnp.stack([zero, zero, (f + n) / (f - n) * one, 2 * f * n / (n - f) * one], -1),
            jnp.stack([zero, zero, one, zero], -1),
        ],
        -2,
    )
    return P


def projection_from_fov(hfov_rad, width, height, near: float = DEFAULT_NEAR, far: float = DEFAULT_FAR) -> jax.Array:
    """Horizontal-FOV camera (reference src/scene.cpp:260-271): principal point
    at the image center, fx = fy = W / (2 tan(fov/2))."""
    W = jnp.asarray(width, jnp.float32)
    H = jnp.asarray(height, jnp.float32)
    fx = W / (2.0 * jnp.tan(jnp.asarray(hfov_rad, jnp.float32) / 2.0))
    return projection_from_intrinsics(fx, fx, W / 2, H / 2, W, H, near, far)


def intrinsics_from_projection(P: jax.Array, width, height):
    """Recover (fx, fy, cx, cy) from a reference-convention projection."""
    W = jnp.asarray(width, jnp.float32)
    H = jnp.asarray(height, jnp.float32)
    fx = P[..., 0, 0] * W / 2.0
    fy = P[..., 1, 1] * H / 2.0
    cx = (P[..., 0, 2] + 1.0) * W / 2.0
    cy = (P[..., 1, 2] + 1.0) * H / 2.0
    return fx, fy, cx, cy


def project_points(P: jax.Array, points_cam: jax.Array, width, height):
    """Camera-space points -> (u, v, z) pixel coordinates + camera depth.

    u is measured right, v down, row 0 = top (CV convention). This matches
    the tensor layout the reference hands to torch (H, W) row 0 = top.
    """
    W = jnp.asarray(width, jnp.float32)
    H = jnp.asarray(height, jnp.float32)
    hom = jnp.concatenate([points_cam, jnp.ones_like(points_cam[..., :1])], axis=-1)
    clip = jnp.einsum("ij,...j->...i", P, hom)
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] / safe_w[..., None]
    u = (ndc[..., 0] + 1.0) * 0.5 * W
    v = (ndc[..., 1] + 1.0) * 0.5 * H
    return u, v, w


def minimum_distance_for_object_diameter(diameter, P: jax.Array) -> jax.Array:
    """Distance at which a sphere of `diameter` exactly fits the frustum
    (reference src/pose.cpp:24-34)."""
    return jnp.maximum(P[..., 0, 0] * diameter / 2.0, P[..., 1, 1] * diameter / 2.0)


def rotation_correction_for_translation(pos: jax.Array) -> jax.Array:
    """Rotation countering apparent rotation of a translated object
    (reference src/pose.cpp:36-59). Returns R^T of the Rodrigues rotation
    mapping normalize(pos) onto +Z."""
    from ..core import math as m

    a = m.normalize(pos)
    z = jnp.array([0.0, 0.0, 1.0], dtype=pos.dtype)
    v = jnp.cross(a, z)
    s = jnp.linalg.norm(v)
    c = jnp.dot(a, z)
    vx = m.cross_matrix(v)
    eye = jnp.eye(3, dtype=pos.dtype)
    safe_s2 = jnp.where(s < 1e-5, 1.0, s * s)
    R = eye + vx + (1.0 - c) / safe_s2 * (vx @ vx)
    R = jnp.where(s < 1e-5, eye, R)
    return R.T


@dataclass(frozen=True)
class CameraParams:
    """Static camera configuration carried by a Scene (host-side)."""

    width: int
    height: int
    near: float = DEFAULT_NEAR
    far: float = DEFAULT_FAR
