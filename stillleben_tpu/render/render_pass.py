"""RenderPass / RenderPassResult — the user-facing render API.

Parity with the reference (python/src/py_render_pass.cpp, src/render_pass.cpp):

    pass = RenderPass(shading='pbr')        # 'pbr' | 'phong' | 'flat'
    result = pass.render(scene, depth_peel=prev_result, predicate=fn)
    result.rgb()               # (H, W, 4) uint8
    result.class_index()       # (H, W) uint16
    result.instance_index()    # (H, W) uint16
    result.coordinates()       # (H, W, 3) f32 object coords (3000 = invalid)
    result.depth()             # (H, W) f32 camera-space z (3000 = invalid)
    result.coordDepth()        # (H, W, 4)
    result.normals()           # (H, W, 4) cam-space normal + dot(N, V)
    result.vertex_indices()    # (H, W, 3) int32 (1-based, 0 = background)
    result.barycentric_coeffs()# (H, W, 3) f32
    result.cam_coordinates()   # (H, W, 4)

Outputs are jax.Arrays already resident in device HBM — the reference's
CUDA-GL interop layer (src/cuda_interop.cpp) has no equivalent here by
construction. Convert with np.asarray(...) or feed them straight to training.

In the reference, 'phong' and 'pbr' compile the same shader
(render_pass.cpp:54-65); only 'flat' differs. Same here.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .atlas import build_scene_atlas, render_inputs_from_scene
from .frame import FrameConfig, RenderedFrame, render_frame


class RenderPassResult:
    def __init__(self, frame: RenderedFrame):
        self._f = frame

    def rgb(self):
        return self._f.rgb

    def class_index(self):
        return self._f.class_index

    def instance_index(self):
        return self._f.instance_index

    def coordinates(self):
        return self._f.object_coordinates[..., :3]

    def depth(self):
        return self._f.object_coordinates[..., 3]

    def coordDepth(self):
        return self._f.object_coordinates

    def coord_depth(self):
        return self._f.object_coordinates

    def normals(self):
        return self._f.normals

    def vertex_indices(self):
        return self._f.vertex_indices

    def barycentric_coeffs(self):
        return self._f.barycentric_coeffs

    def cam_coordinates(self):
        return self._f.cam_coordinates

    @property
    def frame(self) -> RenderedFrame:
        return self._f


class RenderPass:
    def __init__(self, shading: str = "pbr", ssao: bool = True,
                 shadow_mode: str = "vsm", ssao_mode: str = "fast",
                 supersample: int = 1, texture_filter: str = "trilinear"):
        if shading not in ("pbr", "phong", "flat"):
            raise ValueError(f"unknown shading type {shading!r}")
        if shadow_mode not in ("vsm", "pcf"):
            raise ValueError(f"unknown shadow mode {shadow_mode!r}")
        if texture_filter not in ("trilinear", "bilinear", "aniso"):
            raise ValueError(f"unknown texture filter {texture_filter!r}")
        if supersample < 1:
            raise ValueError("supersample must be >= 1")
        self._shading = "flat" if shading == "flat" else "pbr"
        self.ssao_enabled = ssao
        self.ssao_mode = ssao_mode
        self.shadow_mode = shadow_mode
        self.texture_filter = texture_filter
        # anti-aliasing beyond the reference (its GL MRT path has no MSAA):
        # render at supersample^2 resolution; rgb/hdr box-downsample, GT
        # buffers take the center sample (indices/classes cannot average)
        self.supersample = int(supersample)
        # atlas cache keyed on the scene's object-set stamp
        self._atlas = None
        self._atlas_key = None

    def _get_atlas(self, scene):
        bg_plane = None
        if np.any(scene.background_plane_size):
            tex = scene.background_plane_texture
            bg_plane = {
                "size": scene.background_plane_size,
                "texture": tex.pixels if tex is not None else None,
            }
        key = (
            id(scene),
            tuple((id(o), o.mesh._dirty, o.mesh.class_index) for o in scene.objects),
            tuple(np.asarray(scene.background_plane_size).tolist()),
            id(scene.background_plane_texture),
        )
        if self._atlas is None or self._atlas_key != key:
            self._atlas = build_scene_atlas(scene.objects, background_plane=bg_plane)
            self._atlas_key = key
        return self._atlas

    def render(
        self,
        scene,
        result=None,
        depth_peel: "RenderPassResult | None" = None,
        predicate=None,
    ) -> RenderPassResult:
        atlas = self._get_atlas(scene)
        inputs = render_inputs_from_scene(scene, atlas)

        if predicate is not None:
            vis = np.ones(atlas.num_objects, bool)
            for i, o in enumerate(scene.objects):
                vis[i] = bool(predicate(o))
            inputs = inputs._replace(obj_visible=jnp.asarray(vis))

        # merge the light map's analytic lights into free light slots
        # (reference render_pass.cpp: shadow pass uses scene lights incl.
        # light-map sun; Scene.light_map lights drive shadows)
        lm = scene.light_map
        light_map_data = None
        if lm is not None and lm.data is not None:
            light_map_data = lm.data
            dirs = np.array(inputs.light_directions)  # writable copies
            cols = np.array(inputs.light_colors)
            li = 0
            for d, c in zip(lm.light_directions, lm.light_colors):
                while li < len(dirs) and (np.any(dirs[li]) or np.any(cols[li])):
                    li += 1
                if li >= len(dirs):
                    break
                dirs[li] = d
                cols[li] = c
                li += 1
            inputs = inputs._replace(
                light_directions=jnp.asarray(dirs), light_colors=jnp.asarray(cols)
            )

        import numpy as _np

        has_tex = bool(
            (_np.asarray(atlas.mat_base_tex) >= 0).any()
            or (_np.asarray(atlas.mat_mr_tex) >= 0).any()
            or (_np.asarray(atlas.mat_normal_tex) >= 0).any()
            or (_np.asarray(atlas.mat_emissive_tex) >= 0).any()
        )
        has_sticker = bool((_np.asarray(atlas.obj_sticker_tex) >= 0).any())
        W, H = scene.viewport
        ss = self.supersample
        W, H = W * ss, H * ss
        # tile capacity scales with triangle density: dense scanned meshes
        # (e.g. the 69k-triangle bunny) have many sub-pixel triangles per
        # 16x16 tile; the binned list must hold several triangles per pixel
        n_faces = int(atlas.faces.shape[0])
        n_tiles = max((W // 16) * (H // 16), 1)
        density = n_faces * 8 // n_tiles
        tile_capacity = int(min(2048, max(256, 1 << (max(density, 1) - 1).bit_length())))
        from .atlas import has_cutout_materials

        # shadow rasters run per light SLOT (no data-dependent branching in
        # the compiled program): cap the slots to the active prefix so a
        # 1-light scene compiles 1 shadow pass, not 3. Uses the POST-merge
        # slots (light-map analytic lights included).
        ld = np.asarray(inputs.light_directions)
        lc = np.asarray(inputs.light_colors)
        active = [
            i for i in range(ld.shape[0]) if np.any(ld[i]) and np.any(lc[i])
        ]
        max_lights = (max(active) + 1) if active else 1

        cfg = FrameConfig(
            width=W,
            height=H,
            shading=self._shading,
            ssao=self.ssao_enabled,
            ssao_mode=self.ssao_mode,
            tile_capacity=tile_capacity,
            sample_textures=has_tex,
            sample_stickers=has_sticker,
            shadow_mode=self.shadow_mode,
            texture_filter=self.texture_filter,
            alpha_peel=has_cutout_materials(atlas),
            max_lights=max_lights,
        )

        bg_image = None
        if scene.background_image is not None:
            tex = scene.background_image
            pix = tex.linear_f32()
            if pix.shape[:2] != (H, W):
                from PIL import Image

                img = Image.fromarray(tex.pixels, "RGBA").resize((W, H), Image.BILINEAR)
                pix = np.asarray(img, np.float32) / 255.0
                pix[..., :3] = pix[..., :3] ** 2.2
            bg_image = jnp.asarray(pix)

        peel = depth_peel.frame.object_coordinates[..., 3] if depth_peel is not None else None
        if peel is not None:
            # background pixels carry 3000 = invalid; treat them as "no peel"
            peel = jnp.where(peel >= 2999.0, 0.0, peel)
            if ss > 1:  # peel buffers live at viewport size
                peel = jnp.repeat(jnp.repeat(peel, ss, axis=0), ss, axis=1)

        frame = render_frame(
            atlas, inputs, cfg,
            background_image=bg_image,
            light_map=light_map_data,
            depth_peel_depth=peel,
        )
        if ss > 1:
            frame = _downsample_frame(frame, ss)
        from ..utils import sanitize

        if sanitize.enabled():  # SL_SANITIZE=1: NaN/Inf audit of every buffer
            sanitize.check_finite(frame, "RenderPass output")
        return RenderPassResult(frame)


def _downsample_frame(frame, ss: int):
    """Supersampled frame -> viewport size: rgb/hdr box-filtered (the AA),
    every GT buffer center-sampled (class/instance/vertex indices, depths and
    barycentrics must stay exact per-pixel values, never blends)."""
    import jax.numpy as jnp

    def down(name, a):
        H, W = a.shape[0] // ss, a.shape[1] // ss
        if name in ("rgb", "hdr"):
            x = a.astype(jnp.float32)
            x = x.reshape((H, ss, W, ss) + a.shape[2:]).mean(axis=(1, 3))
            if a.dtype == jnp.uint8:
                return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
            return x.astype(a.dtype)
        return a[ss // 2 :: ss, ss // 2 :: ss]

    return type(frame)(**{k: down(k, v) for k, v in frame._asdict().items()})
