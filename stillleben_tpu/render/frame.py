"""Whole-frame render program: geometry -> rasterize -> shade -> tone map.

One jitted XLA program per (atlas shape, viewport, flags) — the TPU
equivalent of RenderPass::render's GL pipeline (render_pass.cpp:303-796),
minus per-object uniform churn. vmap over RenderInputs batches scenes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .atlas import RenderInputs, SceneAtlas
from .rasterize import GBuffer, geometry_stage, rasterize
from .shading import FrameOutputs, shade
from .tonemap import tone_map


class FrameConfig(NamedTuple):
    width: int
    height: int
    shading: str = "pbr"  # "pbr" | "phong" (same shader in reference) | "flat"
    ssao: bool = True
    ssao_mode: str = "fast"  # "fast" (static ring taps via roll — no
    # data-dependent gathers) | "reference" (exact 64-sample hemisphere,
    # ssao_shader.frag:13-57 semantics; ~20x slower on TPU)
    near: float = 0.1
    far: float = 10.0
    chunk: int = 256  # brute-force path triangle chunk
    tiled: bool = True  # tile-binned rasterizer (fast path)
    tile_capacity: int = 256  # max triangles per 16x16 tile
    big_capacity: int = 64  # max "oversized" triangles per frame
    shadow_size: int = 0  # 0 = auto: the reference's 2048^2 on TPU
    # (render_pass.cpp:271-294), 512^2 on CPU hosts (CI speed)
    max_lights: int = 3  # STATIC cap on shaded/shadowed light slots
    fine_chunk: int = 128  # triangles per fine-raster step; 128 = the TPU
    # lane width (an unaligned chunk pads the gathered line table in HBM)
    sample_textures: bool = True  # STATIC: skip texture fetches when none exist
    sample_stickers: bool = True
    use_pallas: bool | None = None  # None = auto (TPU yes, CPU no);
    # True off-TPU runs the kernel in interpret mode (tests/CI)
    shadow_mode: str = "vsm"  # "vsm" (1 prefiltered tap, TPU-fast) |
    # "pcf" (reference-exact 4x4 compare, render_shader.frag:321-338) |
    # "off" (no shadow maps at all)
    texture_filter: str = "trilinear"  # mip-mapped "trilinear" (reference GL;
    # "aniso" = SL_ANISO_TAPS-tap anisotropic analogue of context.cpp:635)
    # default, context.cpp:617-649) | "bilinear" (single mip tap, cheaper)
    shading_dtype: str = "auto"  # lighting-math precision: "auto" = bf16 on
    # TPU / f32 elsewhere; GT buffers are always f32
    alpha_peel: bool = False  # raster-stage alpha cutoff via re-raster of
    # discarded pixels; enable when atlas.has_cutout_materials(atlas)
    alpha_peel_rounds: int = 1  # overlapping-cutout depth (1 covers one layer)
    pixel_stage: bool | None = None  # exact per-pixel stage for sub-4px
    # triangles: None = auto (on for dense meshes, >20k faces)


class RenderedFrame(NamedTuple):
    rgb: jax.Array  # (H, W, 4) u8 (tone-mapped, LINEAR per reference quirk)
    hdr: jax.Array  # (H, W, 4) f32 pre-tonemap
    object_coordinates: jax.Array  # (H, W, 4) f32
    cam_coordinates: jax.Array  # (H, W, 4) f32
    class_index: jax.Array  # (H, W) u16
    instance_index: jax.Array  # (H, W) u16
    normals: jax.Array  # (H, W, 4) f32
    vertex_indices: jax.Array  # (H, W, 3) i32
    barycentric_coeffs: jax.Array  # (H, W, 3) f32
    depth: jax.Array  # (H, W) f32
    valid: jax.Array  # (H, W) bool


def render_frame_core(
    atlas: SceneAtlas,
    inputs: RenderInputs,
    cfg: FrameConfig,
    background_image: jax.Array | None = None,  # (H, W, 4) f32 linear
    light_map=None,
    depth_peel_depth: jax.Array | None = None,
) -> RenderedFrame:
    H, W = cfg.height, cfg.width
    geom = geometry_stage(atlas, inputs, W, H)

    # shadow maps (one ortho depth render per active light)
    shadow_maps = None
    shadow_matrices = None
    if cfg.shading != "flat" and cfg.shadow_mode != "off":
        from .shadow import render_shadow_maps

        shadow_maps, shadow_matrices = render_shadow_maps(
            atlas, inputs, geom, cfg
        )

    def raster_and_shade(min_depth):
        if cfg.tiled:
            from .rasterize_tiled import rasterize_tiled

            gbuf = rasterize_tiled(
                geom, atlas, inputs, W, H,
                near=cfg.near, far=cfg.far,
                tile_capacity=cfg.tile_capacity, big_capacity=cfg.big_capacity,
                fine_chunk=cfg.fine_chunk,
                min_depth=min_depth,
                use_pallas=cfg.use_pallas,
                pixel_stage=cfg.pixel_stage,
            )
        else:
            gbuf = rasterize(
                geom, atlas, inputs, W, H,
                near=cfg.near, far=cfg.far, chunk=cfg.chunk,
                min_depth=min_depth,
            )
        return shade(
            atlas, inputs, geom, gbuf,
            shading=cfg.shading,
            light_map=light_map,
            shadow_maps=shadow_maps,
            shadow_matrices=shadow_matrices,
            max_lights=cfg.max_lights,
            sample_textures=cfg.sample_textures,
            sample_stickers=cfg.sample_stickers,
            shadow_mode=cfg.shadow_mode,
            texture_filter=cfg.texture_filter,
            shading_dtype=cfg.shading_dtype,
        )

    out = raster_and_shade(depth_peel_depth)
    for _ in range(cfg.alpha_peel_rounds if cfg.alpha_peel else 0):
        # raster-stage alpha cutoff: pixels whose z-winner failed the cutoff
        # re-rasterize with that depth as a floor, so GT/color come from the
        # surface BEHIND the cutout — GL's fragment-discard-before-depth-write
        # (reference render_shader.frag alpha cutoff). Static no-op for
        # opaque scenes (atlas.has_cutout_materials gates alpha_peel).
        base_md = (
            depth_peel_depth
            if depth_peel_depth is not None
            else jnp.zeros((H, W), jnp.float32)
        )
        md2 = jnp.where(out.discarded, out.raster_depth, base_md)
        out2 = raster_and_shade(md2)
        d = out.discarded

        def merge(a, b):
            mask = d.reshape(d.shape + (1,) * (a.ndim - 2))
            return jnp.where(mask, b, a)

        out = jax.tree.map(merge, out, out2)

    # SSAO (multiplies object RGB, reference render_pass.cpp:662-694)
    hdr_obj = out.hdr
    if cfg.ssao and cfg.shading != "flat":
        from .ssao import ssao_apply

        hdr_obj = ssao_apply(
            hdr_obj, out.cam_coordinates, out.normals, out.valid,
            inputs.projection, mode=getattr(cfg, "ssao_mode", "fast"),
        )

    # background: image > skybox > background color (alpha 0; the reference
    # clears to transparent black and only writes color via bg quad/skybox)
    if background_image is not None:
        bg_rgb = background_image[..., :3]
        bg_a = jnp.ones((H, W), jnp.float32)
    elif light_map is not None:
        from .ibl import sample_skybox

        bg_rgb = sample_skybox(light_map, inputs, W, H)
        bg_a = jnp.ones((H, W), jnp.float32)
    else:
        bg_rgb = jnp.broadcast_to(inputs.background_color[:3], (H, W, 3))
        bg_a = jnp.zeros((H, W), jnp.float32)

    composed = jnp.where(
        out.valid[..., None],
        hdr_obj,
        jnp.concatenate([bg_rgb, bg_a[..., None]], -1),
    )

    if cfg.shading != "flat":
        mapped = tone_map(composed, hdr_obj * out.valid[..., None], inputs.manual_exposure)
    else:
        mapped = jnp.clip(composed, 0.0, 1.0)

    rgb_u8 = jnp.round(jnp.clip(mapped, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return RenderedFrame(
        rgb=rgb_u8,
        hdr=composed,
        object_coordinates=out.object_coordinates,
        cam_coordinates=out.cam_coordinates,
        class_index=out.class_index,
        instance_index=out.instance_index,
        normals=out.normals,
        vertex_indices=out.vertex_indices,
        barycentric_coeffs=out.barycentric_coeffs,
        depth=out.depth,
        valid=out.valid,
    )


@partial(jax.jit, static_argnames=("cfg", "has_bg", "has_lm"))
def _render_frame_jit(atlas, inputs, cfg, background_image, light_map, depth_peel, has_bg, has_lm):
    return render_frame_core(
        atlas, inputs, cfg,
        background_image=background_image if has_bg else None,
        light_map=light_map if has_lm else None,
        depth_peel_depth=depth_peel,
    )


def render_frame(
    atlas: SceneAtlas,
    inputs: RenderInputs,
    cfg: FrameConfig,
    background_image=None,
    light_map=None,
    depth_peel_depth=None,
) -> RenderedFrame:
    H, W = cfg.height, cfg.width
    if depth_peel_depth is None:
        depth_peel_depth = jnp.zeros((H, W), jnp.float32)
    return _render_frame_jit(
        atlas, inputs, cfg,
        background_image if background_image is not None else jnp.zeros((1, 1, 4)),
        light_map if light_map is not None else 0,
        depth_peel_depth,
        background_image is not None,
        light_map is not None,
    )
