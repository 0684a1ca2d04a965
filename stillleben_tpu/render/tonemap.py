"""Tone mapping: Yxy auto-exposure + ACES filmic curve.

Exact port of the reference tone_map_shader.frag semantics:
- auto exposure: average over OBJECT pixels only via the divide-by-alpha
  trick (frag:102-124, incl. the 0.1 fudge factor and 9.6 scaling),
- manual exposure multiplies Y when >= 0,
- ACES filmic (Narkowicz), clamped to [0, 1],
- the final output stays LINEAR: the reference's gamma write is overridden
  by a second assignment (frag:129-130) — mirrored deliberately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RGB_TO_LUM = np.array([0.2125, 0.7154, 0.0721], np.float32)  # numpy: see ssao._KERNEL

_RGB2XYZ = jnp.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    jnp.float32,
)
_XYZ2RGB = jnp.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    jnp.float32,
)


def rgb_to_yxy(rgb: jax.Array) -> jax.Array:
    xyz = jnp.einsum("ij,...j->...i", _RGB2XYZ, rgb)
    s = jnp.maximum(xyz.sum(-1, keepdims=True), 1e-12)
    return jnp.concatenate([xyz[..., 1:2], xyz[..., 0:1] / s, xyz[..., 1:2] / s], -1)


def yxy_to_rgb(yxy: jax.Array) -> jax.Array:
    Y = yxy[..., 0]
    x = yxy[..., 1]
    y = jnp.maximum(yxy[..., 2], 1e-12)
    X = Y * x / y
    Z = Y * (1.0 - x - y) / y
    xyz = jnp.stack([X, Y, Z], axis=-1)
    return jnp.einsum("ij,...j->...i", _XYZ2RGB, xyz)


def aces_film(x: jax.Array) -> jax.Array:
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tone_map(
    hdr: jax.Array,  # (H, W, 4) composed image (objects + background)
    object_hdr: jax.Array,  # (H, W, 4) objects only (alpha = coverage)
    manual_exposure: jax.Array,  # scalar, -1 = auto
) -> jax.Array:
    """Returns (H, W, 4) float in [0, 1] (LINEAR, see module docstring)."""
    yxy = rgb_to_yxy(hdr[..., :3])

    # auto exposure from the top-mip average of the object-only buffer
    avg_rgb = object_hdr[..., :3].mean(axis=(0, 1))
    avg_a = jnp.maximum(object_hdr[..., 3].mean(axis=(0, 1)), 1e-12)
    lum = 0.1 * (RGB_TO_LUM * (avg_rgb / avg_a)).sum()
    auto_y = yxy[..., 0] / (9.6 * lum + 1e-4)
    manual_y = yxy[..., 0] * manual_exposure
    Y = jnp.where(manual_exposure >= 0.0, manual_y, auto_y)

    rgb = yxy_to_rgb(jnp.concatenate([Y[..., None], yxy[..., 1:]], -1))
    rgb = aces_film(rgb)
    return jnp.concatenate([rgb, jnp.clip(hdr[..., 3:4], 0.0, 1.0)], axis=-1)
