"""Shadow maps: per-light ortho depth render + 4x4 PCF lookup.

Reference: 3-layer 2048^2 shadow texture array with hardware compare
(render_pass.cpp:271-294), ortho matrix fitted to the casters
(computeShadowMapMatrix, render_pass.cpp:131-211), 4x4 PCF with bias 3e-5
(render_shader.frag:321-338). Here the ortho fit covers all shadow-casting
objects' vertices (the reference intersects with the view frustum as an
optimization of the same idea). Default resolution is reduced until the
Pallas rasterizer lands; quality-only (GT buffers are unaffected).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from .atlas import RenderInputs, SceneAtlas

SHADOW_BIAS = 3e-5  # reference render_shader.frag:335


def _ortho_rasterize_depth(
    xy: jax.Array,  # (V, 2) shadow-map pixel coords
    z: jax.Array,  # (V,) normalized depth in [0, 1]
    faces: jax.Array,  # (F, 3)
    tri_on: jax.Array,  # (F,)
    size: int,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Depth-only ortho rasterization -> (size, size) min-depth map (1 = far).

    Reuses the binned rasterizer core with homogeneous w == 1 (ortho) and the
    light-space depth as the interpolated attribute."""
    from .rasterize_tiled import rasterize_vertices

    p = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], -1)[faces]  # (F,3,3)
    zf = z[faces]  # (F, 3)
    depth_img, _ = rasterize_vertices(
        p, zf, tri_on, size, size,
        near=-1e-3, far=1.0,
        tile_capacity=512, big_capacity=64, fine_chunk=64,
        min_depth=None,
        use_pallas=use_pallas,
    )
    return jnp.minimum(depth_img, 1.0)


def render_shadow_maps(atlas: SceneAtlas, inputs: RenderInputs, geom, cfg):
    """Returns (maps (L, S, S), matrices (L, 4, 4) world->shadow-uv-z)."""
    size = getattr(cfg, "shadow_size", 512)
    n_lights = min(
        inputs.light_directions.shape[0], getattr(cfg, "max_lights", 3)
    )
    caster = inputs.obj_casts_shadows & inputs.obj_visible
    vert_on = caster[atlas.vert_obj]
    tri_on = caster[atlas.face_obj]

    world = geom.world  # (V, 3)
    # bounding box of casters (masked)
    big = 1e9
    w_masked_min = jnp.where(vert_on[:, None], world, big)
    w_masked_max = jnp.where(vert_on[:, None], world, -big)
    lo = w_masked_min.min(axis=0)
    hi = w_masked_max.max(axis=0)
    center = 0.5 * (lo + hi)
    radius = jnp.maximum(0.5 * jnp.linalg.norm(hi - lo), 1e-3)

    maps = []
    mats = []
    for i in range(n_lights):
        light_on = jnp.any(inputs.light_directions[i] != 0) & jnp.any(
            inputs.light_colors[i] != 0
        )
        ldir = m.normalize(inputs.light_directions[i])
        # build light frame (looking along ldir)
        up = jnp.where(
            jnp.abs(ldir[2]) < 0.9,
            jnp.array([0.0, 0.0, 1.0]),
            jnp.array([1.0, 0.0, 0.0]),
        )
        zax = ldir
        xax = m.normalize(jnp.cross(up, zax))
        yax = jnp.cross(zax, xax)
        eye = center - zax * (2.0 * radius)
        R = jnp.stack([xax, yax, zax], axis=1)  # light-to-world
        world_to_light = m.invert_rigid(m.make_transform(R, eye))

        wl = (
            jnp.einsum("ij,vj->vi", world_to_light[:3, :3], world)
            + world_to_light[:3, 3]
        )
        # ortho extents (z spread x5 like the reference's depth headroom)
        ext = radius * 1.05
        zmax = 5.0 * 2.0 * radius
        u = (wl[:, 0] / ext * 0.5 + 0.5) * size
        v = (wl[:, 1] / ext * 0.5 + 0.5) * size
        z = jnp.clip(wl[:, 2] / zmax, 0.0, 1.0)

        # lax.cond so disabled light slots cost nothing at runtime
        # (the reference's shadow pass also only runs for active lights,
        # render_pass.cpp:407-460)
        depth_map = jax.lax.cond(
            light_on,
            lambda: _ortho_rasterize_depth(
                jnp.stack([u, v], -1), z, atlas.faces, tri_on, size,
                use_pallas=getattr(cfg, "use_pallas", None),
            ),
            lambda: jnp.ones((size, size), jnp.float32),
        )
        maps.append(depth_map)

        # world -> (u_pix, v_pix, z_norm) affine matrix for lookup
        A = jnp.zeros((4, 4), jnp.float32)
        A = A.at[0, :3].set(world_to_light[0, :3] / ext * 0.5 * size)
        A = A.at[0, 3].set((world_to_light[0, 3] / ext * 0.5 + 0.5) * size)
        A = A.at[1, :3].set(world_to_light[1, :3] / ext * 0.5 * size)
        A = A.at[1, 3].set((world_to_light[1, 3] / ext * 0.5 + 0.5) * size)
        A = A.at[2, :3].set(world_to_light[2, :3] / zmax)
        A = A.at[2, 3].set(world_to_light[2, 3] / zmax)
        A = A.at[3, 3].set(1.0)
        mats.append(A)

    return jnp.stack(maps), jnp.stack(mats)


def shadow_factor_planar(
    shadow_maps: jax.Array,  # (L, S, S)
    shadow_matrices: jax.Array,  # (L, 4, 4)
    light: int,
    world: jax.Array,  # (3, H, W) channel planes
) -> jax.Array:
    """Planar-layout 4x4 PCF (same semantics as shadow_factor; flat-index
    gathers keep every output a full-lane (H, W) plane)."""
    S = shadow_maps.shape[1]
    A = shadow_matrices[light]
    u = A[0, 0] * world[0] + A[0, 1] * world[1] + A[0, 2] * world[2] + A[0, 3]
    v = A[1, 0] * world[0] + A[1, 1] * world[1] + A[1, 2] * world[2] + A[1, 3]
    z = A[2, 0] * world[0] + A[2, 1] * world[1] + A[2, 2] * world[2] + A[2, 3]
    flat = shadow_maps[light].reshape(-1)

    acc = 0.0
    for dy in (-1.5, -0.5, 0.5, 1.5):
        for dx in (-1.5, -0.5, 0.5, 1.5):
            ui = jnp.clip((u + dx).astype(jnp.int32), 0, S - 1)
            vi = jnp.clip((v + dy).astype(jnp.int32), 0, S - 1)
            acc = acc + (z - SHADOW_BIAS <= flat[vi * S + ui]).astype(jnp.float32)
    return acc / 16.0


def shadow_factor(
    shadow_maps: jax.Array,  # (L, S, S)
    shadow_matrices: jax.Array,  # (L, 4, 4)
    light: int,
    world: jax.Array,  # (H, W, 3)
) -> jax.Array:
    """4x4 PCF average of the compare test (render_shader.frag:321-338).
    Returns (H, W) in [0, 1]: 1 = fully lit."""
    S = shadow_maps.shape[1]
    A = shadow_matrices[light]
    p = jnp.einsum("ij,hwj->hwi", A[:3, :3], world) + A[:3, 3]
    u, v, z = p[..., 0], p[..., 1], p[..., 2]

    acc = 0.0
    for dy in (-1.5, -0.5, 0.5, 1.5):
        for dx in (-1.5, -0.5, 0.5, 1.5):
            ui = jnp.clip((u + dx).astype(jnp.int32), 0, S - 1)
            vi = jnp.clip((v + dy).astype(jnp.int32), 0, S - 1)
            stored = shadow_maps[light, vi, ui]
            acc = acc + (z - SHADOW_BIAS <= stored).astype(jnp.float32)
    return acc / 16.0
