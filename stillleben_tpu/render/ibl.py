"""IBL shading term + skybox sampling (reference render_shader.frag:375-394
and background_cube_shader)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from .light_map import (
    LightMapData,
    PREFILTER_MIPS,
    get_brdf_lut,
    quad_pack_cube_flat,
    sample_cubemap,
    sample_cubemap_packed,
    sample_cubemap_packed_quad,
)


def _sample_prefilter(lm: LightMapData, dirs: jax.Array, lod: jax.Array) -> jax.Array:
    """Trilinear between the 5 prefiltered mips (lod in [0, 4]): bilinear-tap
    the TWO adjacent levels of the packed chain and lerp — identical math to
    blending all levels with tent weights, at 8 gathers/px instead of 20.

    SL_IBL_QUAD=1: quad-row gathers (one per tap instead of four; bitwise
    the same values — quad_pack_cube_flat carries the clamp neighbors)."""
    import os

    mips = [lm.prefilter_mip(i) for i in range(PREFILTER_MIPS)]
    sizes = jnp.asarray([p.shape[1] for p in mips], jnp.int32)
    counts = [6 * p.shape[1] * p.shape[1] for p in mips]
    offsets = jnp.asarray(
        [sum(counts[:i]) for i in range(PREFILTER_MIPS)], jnp.int32
    )
    lod = jnp.clip(lod, 0.0, PREFILTER_MIPS - 1.0)
    if os.environ.get("SL_IBL_QUAD", "0") == "1":
        flat_q = quad_pack_cube_flat(mips)  # constant-folded at compile

        def tap(lvl):
            return sample_cubemap_packed_quad(flat_q, offsets, sizes, dirs, lvl)
    else:
        flat = jnp.concatenate([p.reshape(-1, 3) for p in mips], axis=0)

        def tap(lvl):
            return sample_cubemap_packed(flat, offsets, sizes, dirs, lvl)

    if os.environ.get("SL_IBL_PREFILTER", "trilinear") == "nearest":
        # nearest-LEVEL bilinear: 4 gathers/px instead of 8 (1 with quad
        # rows). The prefilter chain is already roughness-blurred, so
        # snapping the level only steps the blur radius between the 5 bands
        # (no spatial aliasing); the visible delta on the bench scene is
        # below the tonemap quantum except on near-mirror surfaces.
        return tap(jnp.round(lod).astype(jnp.int32))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, PREFILTER_MIPS - 1)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    return tap(l0) * (1.0 - frac) + tap(l1) * frac


def _sample_lut(lut: jax.Array, NoV: jax.Array, roughness: jax.Array) -> jax.Array:
    S = lut.shape[0]
    u = jnp.clip((NoV * S - 0.5).astype(jnp.int32), 0, S - 1)
    v = jnp.clip((roughness * S - 0.5).astype(jnp.int32), 0, S - 1)
    return lut[v, u]


def ibl_term(lm: LightMapData, normal, V, NoV, roughness, F0, k_S, c_diff):
    """(reference render_shader.frag:375-394)"""
    import os

    lut = get_brdf_lut()
    f_ab = _sample_lut(lut, NoV, roughness)
    lod = roughness * 4.0
    light_dir = 2.0 * (normal * V).sum(-1, keepdims=True) * normal - V  # reflect(-V, n)
    radiance = _sample_prefilter(lm, light_dir, lod)
    sh = getattr(lm, "irradiance_sh", None)
    if sh is not None and os.environ.get("SL_IBL_SH", "1") != "0":
        # SH-2 reconstruction of the (cosine-smooth) irradiance map: 9
        # planar FMAs instead of 4 cubemap gathers per pixel; clamp the
        # small negative ringing SH-2 can produce
        from .light_map import eval_irradiance_sh

        irradiance = jnp.maximum(eval_irradiance_sh(sh, normal), 0.0)
    else:
        irradiance = sample_cubemap(lm.irradiance, normal)

    FssEss = k_S * f_ab[..., 0:1] + f_ab[..., 1:2]
    Ems = 1.0 - (f_ab[..., 0:1] + f_ab[..., 1:2])
    F_avg = F0 + (1.0 - F0) / 21.0
    FmsEms = Ems * FssEss * F_avg / (1.0 - F_avg * Ems)
    k_D = c_diff * (1.0 - FssEss - FmsEms)
    return FssEss * radiance + (FmsEms + k_D) * irradiance


def sample_skybox(lm: LightMapData, inputs, width: int, height: int) -> jax.Array:
    """Per-pixel camera ray -> cubemap level 0 (background_cube_shader)."""
    P = inputs.projection
    fx = P[0, 0] * width / 2.0
    fy = P[1, 1] * height / 2.0
    cx = (P[0, 2] + 1.0) * width / 2.0
    cy = (P[1, 2] + 1.0) * height / 2.0
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    dir_cam = jnp.stack(
        [(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1
    )
    dir_world = jnp.einsum("ij,hwj->hwi", inputs.cam_pose[:3, :3], dir_cam)
    dir_world = m.normalize(dir_world)
    return sample_cubemap(lm.cubemap, dir_world)
