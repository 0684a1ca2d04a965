"""Deferred shading: G-buffer -> PBR color + all ground-truth buffers.

Faithful port of the reference's uber fragment shader semantics
(src/shaders/render_shader.frag) in deferred form: per-pixel gathers from the
geometry stage outputs + dense VPU math. Covered here:

- perspective-correct attribute interpolation via DIFFERENTIABLY recomputed
  barycentrics (gradients flow to vertex positions/poses),
- base color texture (gamma 2.2 -> linear), alpha cutoff, sticker blend
  (frag:248-256), normal mapping (frag:259-270), back-face normal flip
  (frag:272-273; the reference renders without face culling),
- Cook-Torrance GGX direct lighting per directional light (frag:313-370),
  ambient term, IBL with Fdez-Aguera multiple scattering (frag:375-394),
  emissive,
- GT outputs with the exact clear semantics: coordinate buffers invalid=3000,
  class/instance 0 background (render_pass.cpp:316,525-532).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from .atlas import RenderInputs, SceneAtlas
from .rasterize import GBuffer, GeometryBuffers

DIELECTRIC_SPECULAR = 0.04
MIN_ROUGHNESS = 0.045
INVALID = 3000.0  # reference render_pass.cpp:316


class FrameOutputs(NamedTuple):
    hdr: jax.Array  # (H, W, 4) f32 linear HDR (pre-tonemap) + alpha
    object_coordinates: jax.Array  # (H, W, 4) xyz object coords, w depth
    cam_coordinates: jax.Array  # (H, W, 4) xyz cam coords, w 1 (bg invalid)
    class_index: jax.Array  # (H, W) u16
    instance_index: jax.Array  # (H, W) u16
    normals: jax.Array  # (H, W, 4) cam normal + dot(N, V)
    vertex_indices: jax.Array  # (H, W, 3) i32 (1-based, 0 background)
    barycentric_coeffs: jax.Array  # (H, W, 3) f32
    depth: jax.Array  # (H, W) f32 cam z (0 at background)
    valid: jax.Array  # (H, W) bool geometry hit


def sample_texture(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample with repeat wrapping.

    textures: (NT, S, S, 4); tex_id: (...,) i32 (clamped >= 0); uv: (..., 2).
    """
    S = textures.shape[1]
    u = uv[..., 0] * S - 0.5
    v = uv[..., 1] * S - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    ti = jnp.maximum(tex_id, 0)

    def fetch(ui, vi):
        ui = jnp.mod(ui.astype(jnp.int32), S)
        vi = jnp.mod(vi.astype(jnp.int32), S)
        return textures[ti, vi, ui]

    c00 = fetch(u0, v0)
    c10 = fetch(u0 + 1, v0)
    c01 = fetch(u0, v0 + 1)
    c11 = fetch(u0 + 1, v0 + 1)
    top = c00 * (1 - fu) + c10 * fu
    bot = c01 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


def _interp(vertex_attr: jax.Array, f: jax.Array, bary: jax.Array) -> jax.Array:
    """Gather (H,W,3,D) vertex attribute and interpolate with (H,W,3) bary."""
    vals = vertex_attr[f]  # (H, W, 3, D)
    return (vals * bary[..., None]).sum(axis=2)


def _ggx_distribution(NdotH, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = NdotH * NdotH * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def _geometry_smith(NdotV, NdotL, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    g1 = NdotV / jnp.maximum(NdotV * (1.0 - k) + k, 1e-9)
    g2 = NdotL / jnp.maximum(NdotL * (1.0 - k) + k, 1e-9)
    return g1 * g2


def shade(
    atlas: SceneAtlas,
    inputs: RenderInputs,
    geom: GeometryBuffers,
    gbuf: GBuffer,
    shading: str = "pbr",
    light_map=None,
    shadow_maps=None,
    shadow_matrices=None,
    max_lights: int = 3,
    sample_textures: bool = True,
    sample_stickers: bool = True,
) -> FrameOutputs:
    H, W = gbuf.tri_id.shape
    valid = gbuf.tri_id >= 0
    tri = jnp.maximum(gbuf.tri_id, 0)

    # one packed per-face int gather (see the packed vertex gather below)
    face_table = jnp.concatenate(
        [atlas.faces, atlas.face_obj[:, None], atlas.face_mat[:, None]], axis=1
    )  # (F, 5)
    ft = face_table[tri]  # (H, W, 5)
    f = ft[..., :3]
    obj = ft[..., 3]
    mat = ft[..., 4]

    # --- ONE packed per-vertex gather (TPU gathers pay per ROW, not per
    # byte: ~10 separate attribute gathers are ~10x slower than one wide one)
    packed = jnp.concatenate(
        [
            geom.obj_coords,       # 0:3
            geom.world,            # 3:6
            geom.cam,              # 6:9
            atlas.texcoords,       # 9:11
            geom.normal_world,     # 11:14
            geom.tangent_world,    # 14:17
            geom.bitangent_world,  # 17:20
            geom.sticker_uv,       # 20:22
            geom.pix_hom,          # 22:25
        ],
        axis=-1,
    )  # (VI, 25)
    vals = packed[f]  # (H, W, 3, 25) — the one big gather

    # --- differentiable barycentrics: recompute E_k from vertex coords ----
    ph = vals[..., 22:25]  # (H, W, 3, 3)
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    pix = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (H, W)),
            jnp.broadcast_to(ys[:, None], (H, W)),
            jnp.ones((H, W), jnp.float32),
        ],
        axis=-1,
    )
    L0 = jnp.cross(ph[..., 1, :], ph[..., 2, :])
    L1 = jnp.cross(ph[..., 2, :], ph[..., 0, :])
    L2 = jnp.cross(ph[..., 0, :], ph[..., 1, :])
    E = jnp.stack(
        [(L0 * pix).sum(-1), (L1 * pix).sum(-1), (L2 * pix).sum(-1)], axis=-1
    )
    Esum = E.sum(-1, keepdims=True)
    bary = E / jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)  # (H, W, 3)

    # --- interpolate geometry (single fused weighted sum over the packed
    # table, then slice) -----------------------------------------------------
    interp = (vals * bary[..., None]).sum(axis=2)  # (H, W, 25)
    obj_coords = interp[..., 0:3]
    world = interp[..., 3:6]
    cam_coords = interp[..., 6:9]
    uv = interp[..., 9:11]
    n_world = m.normalize(interp[..., 11:14])
    t_world = interp[..., 14:17]
    b_world = interp[..., 17:20]
    sticker_uv = interp[..., 20:22]
    depth = cam_coords[..., 2]

    # --- material resolve (one packed material-table gather) -----------------
    mat_table = jnp.concatenate(
        [
            atlas.mat_base_color,                       # 0:4
            atlas.mat_emissive,                         # 4:7
            atlas.mat_metallic[:, None],                # 7
            atlas.mat_roughness[:, None],               # 8
            atlas.mat_alpha_cutoff[:, None],            # 9
            atlas.mat_base_tex[:, None].astype(jnp.float32),      # 10
            atlas.mat_mr_tex[:, None].astype(jnp.float32),        # 11
            atlas.mat_normal_tex[:, None].astype(jnp.float32),    # 12
            atlas.mat_emissive_tex[:, None].astype(jnp.float32),  # 13
        ],
        axis=1,
    )
    mt = mat_table[mat]  # (H, W, 14)
    base_color = mt[..., 0:4]
    if sample_textures:
        base_tex = mt[..., 10].astype(jnp.int32)
        tex_rgba = sample_texture(atlas.textures, base_tex, uv)
        base_color = jnp.where(
            (base_tex >= 0)[..., None], base_color * tex_rgba, base_color
        )

    # sticker blend (frag:248-256): inside the projected sticker frame,
    # alpha-blend the sticker texture over the base color
    if sample_stickers:
        sticker_tex = atlas.obj_sticker_tex[obj]
        in_sticker = (
            (sticker_tex >= 0)
            & (sticker_uv[..., 0] >= 0)
            & (sticker_uv[..., 1] >= 0)
            & (sticker_uv[..., 0] < 1)
            & (sticker_uv[..., 1] < 1)
        )
        sticker_rgba = sample_texture(atlas.textures, sticker_tex, sticker_uv)
        blend = jnp.where(in_sticker, sticker_rgba[..., 3], 0.0)[..., None]
        base_color = jnp.concatenate(
            [
                base_color[..., :3] * (1 - blend) + sticker_rgba[..., :3] * blend,
                base_color[..., 3:],
            ],
            axis=-1,
        )

    alpha_ok = base_color[..., 3] >= mt[..., 9]

    metallic = mt[..., 7]
    roughness = mt[..., 8]
    if sample_textures:
        mr_tex = mt[..., 11].astype(jnp.int32)
        mr = sample_texture(atlas.textures, mr_tex, uv)
        # glTF: G channel roughness, B channel metallic (frag:283-287 uses .yz)
        roughness = jnp.where(mr_tex >= 0, roughness * mr[..., 1], roughness)
        metallic = jnp.where(mr_tex >= 0, metallic * mr[..., 2], metallic)
    # per-object overrides applied last (render_shader.cpp:373-378)
    o_metallic = inputs.obj_metallic[obj]
    o_roughness = inputs.obj_roughness[obj]
    metallic = jnp.where(o_metallic >= 0, o_metallic, metallic)
    roughness = jnp.where(o_roughness >= 0, o_roughness, roughness)
    roughness = jnp.maximum(roughness, MIN_ROUGHNESS)

    emissive = mt[..., 4:7]
    if sample_textures:
        em_tex = mt[..., 13].astype(jnp.int32)
        em = sample_texture(atlas.textures, em_tex, uv)
        emissive = jnp.where(
            (em_tex >= 0)[..., None], emissive * em[..., :3] ** 2.2, emissive
        )

        # normal mapping (frag:259-270)
        nm_tex = mt[..., 12].astype(jnp.int32)
        nm = sample_texture(atlas.textures, nm_tex, uv)[..., :3] * 2.0 - 1.0
        mapped = m.normalize(
            nm[..., 0:1] * t_world + nm[..., 1:2] * b_world + nm[..., 2:3] * n_world
        )
        normal = jnp.where((nm_tex >= 0)[..., None], mapped, n_world)
    else:
        normal = n_world
    # back-face flip (frag:272-273)
    normal = jnp.where(gbuf.front_facing[..., None], normal, -normal)

    cam_position = inputs.cam_pose[:3, 3]
    V = m.normalize(cam_position - world)
    NoV = jnp.clip((normal * V).sum(-1), 1e-5, 1.0)

    color = jnp.zeros((H, W, 3), jnp.float32)

    if shading != "flat":
        F0 = (
            DIELECTRIC_SPECULAR * (1.0 - metallic[..., None])
            + base_color[..., :3] * metallic[..., None]
        )
        Fr = jnp.maximum(1.0 - roughness[..., None], F0) - F0
        k_S = F0 + Fr * (1.0 - NoV[..., None]) ** 5

        n_lights = min(inputs.light_directions.shape[0], max_lights)
        for i in range(n_lights):
            light_color = inputs.light_colors[i]
            light_dir = inputs.light_directions[i]
            light_on = (jnp.any(light_color != 0)) & (jnp.any(light_dir != 0))

            def _light_contrib(i=i, light_color=light_color, light_dir=light_dir):
                Ldir = m.normalize(-light_dir)
                Hv = m.normalize(V + Ldir)
                NdotL = jnp.maximum((normal * Ldir).sum(-1), 0.0)
                NdotH = jnp.maximum((normal * Hv).sum(-1), 0.0)

                NDF = _ggx_distribution(NdotH, roughness)
                G = _geometry_smith(NoV, NdotL, roughness)
                Fs = k_S
                spec = (NDF * G)[..., None] * Fs / jnp.maximum(
                    4.0 * NoV * NdotL, 1e-3
                )[..., None]
                kD = (1.0 - Fs) * (1.0 - metallic[..., None])

                if shadow_maps is not None and shadow_matrices is not None:
                    from .shadow import shadow_factor

                    inv_shadow = shadow_factor(
                        shadow_maps, shadow_matrices, i, world
                    )[..., None]
                else:
                    inv_shadow = 1.0

                return (
                    inv_shadow
                    * (kD * base_color[..., :3] / jnp.pi + spec)
                    * light_color
                    * NdotL[..., None]
                )

            # lax.cond: disabled light slots cost nothing at runtime
            color = color + jax.lax.cond(
                light_on, _light_contrib, lambda: jnp.zeros((H, W, 3), jnp.float32)
            )

        color = color + inputs.ambient_light * base_color[..., :3]

        if light_map is not None:
            from .ibl import ibl_term

            c_diff = base_color[..., :3] * (1.0 - DIELECTRIC_SPECULAR) * (
                1.0 - metallic[..., None]
            )
            color = color + ibl_term(
                light_map, normal, V, NoV, roughness, F0, k_S, c_diff
            )

        color = color + emissive
    else:
        # Flat: plain base color, no lighting
        color = base_color[..., :3]

    # --- compose with background ----------------------------------------------
    shown = valid & alpha_ok
    hdr_rgb = jnp.where(shown[..., None], color, 0.0)
    hdr_a = jnp.where(shown, base_color[..., 3], 0.0)
    hdr = jnp.concatenate([hdr_rgb, hdr_a[..., None]], axis=-1)

    inval4 = jnp.full((H, W, 4), INVALID, jnp.float32)
    obj_out = jnp.where(
        shown[..., None],
        jnp.concatenate([obj_coords, depth[..., None]], -1),
        inval4,
    )
    cam_out = jnp.where(
        shown[..., None],
        jnp.concatenate([cam_coords, jnp.ones((H, W, 1), jnp.float32)], -1),
        inval4,
    )

    world_to_cam = m.invert_rigid(inputs.cam_pose)
    n_cam = m.normalize(
        jnp.einsum("ij,hwj->hwi", world_to_cam[:3, :3], normal, precision="highest")
    )
    ndv = (normal * V).sum(-1)
    normals_out = jnp.where(
        shown[..., None],
        jnp.concatenate([n_cam, ndv[..., None]], -1),
        0.0,
    )

    class_out = jnp.where(shown, atlas.obj_class[obj], 0).astype(jnp.uint16)
    inst_out = jnp.where(shown, inputs.obj_instance[obj], 0).astype(jnp.uint16)

    vidx = atlas.vertex_index[f]  # (H, W, 3)
    vidx_out = jnp.where(shown[..., None], vidx, 0).astype(jnp.int32)
    bary_out = jnp.where(shown[..., None], bary, 0.0)
    depth_out = jnp.where(shown, depth, 0.0)

    return FrameOutputs(
        hdr=hdr,
        object_coordinates=obj_out,
        cam_coordinates=cam_out,
        class_index=class_out,
        instance_index=inst_out,
        normals=normals_out,
        vertex_indices=vidx_out,
        barycentric_coeffs=bary_out,
        depth=depth_out,
        valid=shown,
    )
