"""Deferred shading: G-buffer -> PBR color + all ground-truth buffers.

Faithful port of the reference's uber fragment shader semantics
(src/shaders/render_shader.frag) in deferred form, laid out for the TPU:

**Planar (channel-plane) execution.** Every per-pixel quantity lives as an
(H, W) plane (or a (C, H, W) stack of planes), so the VPU's 128 lanes map
onto the image's W axis instead of a 3/4-wide channel axis — the round-1
layout burned 124/128 lanes on every elementwise pass. Vectors are (3, H, W),
dots are sums over the leading axis; XLA fuses the whole planar pipeline into
a handful of full-width kernels.

**One wide gather per pixel.** All per-face data — the 3 vertices' 26
attributes each, plus the material/object constants (baked per frame,
including the per-object metallic/roughness overrides) — is packed into one
(F, ROW) row table, so shading pays a single row-gather per pixel (TPU
gathers cost per row, not per byte) instead of face + vertex + material +
texture-id gathers.

**Combined material textures.** The 4 glTF layers of a material are packed
into one 16-channel texel stack with neutral fills (atlas.tex_combo), so a
bilinear tap is 4 gathers of 16 channels rather than 16 gathers of 4.

Shader semantics covered (reference citations):
- perspective-correct interpolation via DIFFERENTIABLY recomputed
  barycentrics (gradients flow to vertex positions/poses),
- base color texture (sRGB->linear), alpha cutoff, sticker blend
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

from .atlas import RenderInputs, SceneAtlas
from .rasterize import GBuffer, GeometryBuffers

DIELECTRIC_SPECULAR = 0.04
MIN_ROUGHNESS = 0.045
INVALID = 3000.0  # reference render_pass.cpp:316

# ---- face-row table layout --------------------------------------------------
VS = 26  # per-vertex channel stride
# vertex block: 0:3 obj_coords, 3:6 world, 6:9 cam, 9:11 uv, 11:14 normal,
# 14:17 tangent, 17:20 bitangent, 20:22 sticker_uv, 22:25 pix_hom, 25 vid
FACE = 3 * VS  # 78: face-level constants
# 78:82 base_color, 82:85 emissive, 85 metallic, 86 roughness, 87 cutoff,
# 88 combo_tex, 89 sticker_tex, 90 class, 91 instance,
# 92 roughness-tex-multiplier flag, 93 metallic-tex-multiplier flag
# TPU row-gather cost is NON-monotonic in row width (r5 width sweep, 634k
# ids from a 125k-row table on v5e): 8f=10, 16f=13, 26f=16, 32f=27, 52f=41
# ns/row — but >=64-float rows flip to a fast path: 64f=7.3, 94f=6.6,
# 128f=5.9 ns/row. The corners gather therefore reads a 64-padded
# per-vertex table (VS_PAD) behind an optimization_barrier — WITHOUT the
# barrier XLA fuses the pad into the gather and the slow narrow-row path
# comes back (measured 17.2 vs 7.7 ns/row). The (F, 94) per-pixel gather
# is already in the fast regime; no padding needed there.
VS_PAD = 64
ROW = FACE + 16  # 94


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
    discarded: jax.Array  # (H, W) bool: geometry hit but alpha-cutoff failed
    raster_depth: jax.Array  # (H, W) f32 winner depth BEFORE the alpha discard


# ---- planar vector helpers ---------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(a, eps=1e-12):
    """Planar counterpart of core.math.normalize (gradient-safe: degenerate
    vectors pass through unscaled, no NaN cotangents)."""
    n2 = _dot3(a, a)
    safe = jnp.where(n2 < eps, 1.0, n2)
    return a * jax.lax.rsqrt(safe)


def sample_combo_mip_planar(
    stack: jax.Array,
    tex_id: jax.Array,
    u: jax.Array,
    v: jax.Array,
    lod: jax.Array,
    trilinear: bool = True,
):
    """Mip-mapped sample of the packed combo stack -> (C, H, W) planes.

    ``stack``: (NC, MIP_TOTAL, C) flat-packed mip chain (atlas layout);
    tex_id/u/v/lod are (H, W) planes; repeat wrapping. Trilinear = two
    bilinear taps + lerp, the software analogue of the reference's
    GL mip-mapped SamplerFilter::Linear (context.cpp:617-649).

    Three interchangeable evaluation orders (SL_TEX_SAMPLER env):
    - ``packed`` (default): all taps concatenated into one (N, taps*C)
      array; the filter is a weight multiply + tree reduce over tap
      blocks. Every elementwise op runs with a 64/128-wide minor dim.
    - ``quad``: ``stack`` must be the quad-packed atlas.tex_combo_quad
      (each row = the 2x2 wrap-neighbor quad): ONE row gather per mip
      level — 2 gathers/px trilinear instead of 8. Same arithmetic as
      ``packed`` (identical tap values, weights, and reduce tree).
    - ``hwc``: classic per-tap bilinear lerp over (H, W, C) arrays, whose
      16-channel minor dim uses 16/128 VPU lanes per op."""
    import os

    mode = os.environ.get("SL_TEX_SAMPLER", "packed")
    if mode == "quad":
        return _sample_combo_mip_quad(stack, tex_id, u, v, lod, trilinear)
    if mode == "packed":
        return _sample_combo_mip_packed(stack, tex_id, u, v, lod, trilinear)
    from .atlas import MIP_OFFSETS, MIP_SIZES, MIP_TOTAL, N_MIPS

    NC, C = stack.shape[0], stack.shape[-1]
    flat = stack.reshape(NC * MIP_TOTAL, C)
    sizes = jnp.asarray(MIP_SIZES, jnp.int32)
    offs = jnp.asarray(MIP_OFFSETS, jnp.int32)
    lod = jnp.clip(lod, 0.0, N_MIPS - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    base = jnp.maximum(tex_id, 0) * MIP_TOTAL

    def tap(li):
        S = sizes[li]  # (H, W) i32 per-pixel level size
        Sf = S.astype(jnp.float32)
        off = offs[li]
        tu = u * Sf - 0.5
        tv = v * Sf - 0.5
        u0 = jnp.floor(tu)
        v0 = jnp.floor(tv)
        fu = (tu - u0)[..., None]
        fv = (tv - v0)[..., None]
        u0i = jnp.mod(u0.astype(jnp.int32), S)
        u1i = jnp.mod(u0i + 1, S)
        v0i = jnp.mod(v0.astype(jnp.int32), S)
        v1i = jnp.mod(v0i + 1, S)

        def fetch(vi, ui):
            return flat[base + off + vi * S + ui]  # (H, W, C)

        c00 = fetch(v0i, u0i)
        c10 = fetch(v0i, u1i)
        c01 = fetch(v1i, u0i)
        c11 = fetch(v1i, u1i)
        return (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (
            c01 * (1 - fu) + c11 * fu
        ) * fv

    out = tap(l0)
    if trilinear:
        out = out * (1.0 - frac) + tap(jnp.minimum(l0 + 1, N_MIPS - 1)) * frac
    return jnp.moveaxis(out, -1, 0)  # (C, H, W)


def _sample_combo_mip_packed(
    stack: jax.Array,
    tex_id: jax.Array,
    u: jax.Array,
    v: jax.Array,
    lod: jax.Array,
    trilinear: bool = True,
):
    """Packed-tap evaluation: one (N, taps*C) array, weight multiply, tree
    reduce. With C=16 and 8 trilinear taps the working minor dim is 128 —
    every VPU lane active — versus 16/128 for the per-tap (H, W, C) lerps.
    Bitwise semantics match sample_combo_mip_planar (same taps, weights
    algebraically regrouped: w_tap = lvl_weight * bilinear_weight)."""
    from .atlas import MIP_OFFSETS, MIP_SIZES, MIP_TOTAL, N_MIPS

    NC, C = stack.shape[0], stack.shape[-1]
    flat = stack.reshape(NC * MIP_TOTAL, C)
    sizes = jnp.asarray(MIP_SIZES, jnp.int32)
    offs = jnp.asarray(MIP_OFFSETS, jnp.int32)
    lod = jnp.clip(lod, 0.0, N_MIPS - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = lod - l0.astype(jnp.float32)  # (H, W)
    base = jnp.maximum(tex_id, 0) * MIP_TOTAL
    H, W = u.shape
    N = H * W

    rows, wts = [], []

    def level(li, lw):
        S = sizes[li]  # (H, W) i32 per-pixel level size
        Sf = S.astype(jnp.float32)
        off = offs[li]
        tu = u * Sf - 0.5
        tv = v * Sf - 0.5
        u0 = jnp.floor(tu)
        v0 = jnp.floor(tv)
        fu = tu - u0
        fv = tv - v0
        u0i = jnp.mod(u0.astype(jnp.int32), S)
        u1i = jnp.mod(u0i + 1, S)
        v0i = jnp.mod(v0.astype(jnp.int32), S)
        v1i = jnp.mod(v0i + 1, S)
        b = base + off
        rows.extend(
            [b + v0i * S + u0i, b + v0i * S + u1i,
             b + v1i * S + u0i, b + v1i * S + u1i]
        )
        gu, gv = 1.0 - fu, 1.0 - fv
        wts.extend([lw * gu * gv, lw * fu * gv, lw * gu * fv, lw * fu * fv])

    if trilinear:
        level(l0, 1.0 - frac)
        level(jnp.minimum(l0 + 1, N_MIPS - 1), frac)
    else:
        level(l0, jnp.ones_like(frac))

    T = len(rows)  # 4 or 8
    g = jnp.concatenate(
        [flat[r.reshape(N)] for r in rows], axis=-1
    )  # (N, T*C): tap-major blocks of C
    w = jnp.stack([wt.reshape(N) for wt in wts], axis=-1)  # (N, T)
    wfull = jnp.broadcast_to(w[:, :, None], (N, T, C)).reshape(N, T * C)
    acc = g * wfull
    while acc.shape[1] > C:  # pairwise tap-block sums, full-width adds
        half = acc.shape[1] // 2
        acc = acc[:, :half] + acc[:, half:]
    return acc.T.reshape(C, H, W)


def _sample_combo_mip_quad(
    stack_quad: jax.Array,  # (NC, MIP_TOTAL, 4C) quad-packed rows
    tex_id: jax.Array,
    u: jax.Array,
    v: jax.Array,
    lod: jax.Array,
    trilinear: bool = True,
):
    """Quad-row evaluation: a bilinear tap is ONE gather of the texel's
    [c00|c10|c01|c11] wrap-neighbor quad (atlas._quad_pack), so trilinear
    costs 2 row gathers/px instead of 8. The weight/reduce arithmetic is
    identical to _sample_combo_mip_packed (same taps, same tree order) —
    outputs are bitwise equal; only the gather count changes."""
    from .atlas import MIP_OFFSETS, MIP_SIZES, MIP_TOTAL, N_MIPS

    NC, C4 = stack_quad.shape[0], stack_quad.shape[-1]
    C = C4 // 4
    flat = stack_quad.reshape(NC * MIP_TOTAL, C4)
    sizes = jnp.asarray(MIP_SIZES, jnp.int32)
    offs = jnp.asarray(MIP_OFFSETS, jnp.int32)
    lod = jnp.clip(lod, 0.0, N_MIPS - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = lod - l0.astype(jnp.float32)
    base = jnp.maximum(tex_id, 0) * MIP_TOTAL
    H, W = u.shape
    N = H * W

    rows, wts = [], []

    def level(li, lw):
        S = sizes[li]
        Sf = S.astype(jnp.float32)
        off = offs[li]
        tu = u * Sf - 0.5
        tv = v * Sf - 0.5
        u0 = jnp.floor(tu)
        v0 = jnp.floor(tv)
        fu = tu - u0
        fv = tv - v0
        u0i = jnp.mod(u0.astype(jnp.int32), S)
        v0i = jnp.mod(v0.astype(jnp.int32), S)
        rows.append(base + off + v0i * S + u0i)
        gu, gv = 1.0 - fu, 1.0 - fv
        wts.extend([lw * gu * gv, lw * fu * gv, lw * gu * fv, lw * fu * fv])

    if trilinear:
        level(l0, 1.0 - frac)
        level(jnp.minimum(l0 + 1, N_MIPS - 1), frac)
    else:
        level(l0, jnp.ones_like(frac))

    T = len(wts)  # 4 or 8 tap weights; gathers = T // 4
    g = jnp.concatenate(
        [flat[r.reshape(N)] for r in rows], axis=-1
    )  # (N, T*C): tap-major blocks of C (quad order matches weight order)
    w = jnp.stack([wt.reshape(N) for wt in wts], axis=-1)  # (N, T)
    wfull = jnp.broadcast_to(w[:, :, None], (N, T, C)).reshape(N, T * C)
    acc = g * wfull
    while acc.shape[1] > C:  # pairwise tap-block sums, full-width adds
        half = acc.shape[1] // 2
        acc = acc[:, :half] + acc[:, half:]
    return acc.T.reshape(C, H, W)


def sample_sticker_planar(
    stack: jax.Array, sizes: jax.Array, tex_id: jax.Array, u: jax.Array, v: jax.Array
):
    """Native-resolution sticker sample -> (4, H, W), clamp-to-border with a
    transparent border (reference src/object.cpp:494-513 RectangleTexture +
    src/context.cpp:567-597 border color 0).

    ``stack``: (NS, SH, SW, 4) stickers padded to the scene max dims;
    ``sizes``: (NS, 2) native (w, h) of each sticker."""
    NS, SH, SW, C = stack.shape
    flat = stack.reshape(NS * SH * SW, C)
    ti = jnp.maximum(tex_id, 0)
    wh = sizes[ti]  # (H, W, 2)
    w = wh[..., 0]
    h = wh[..., 1]
    wi = w.astype(jnp.int32)
    hi = h.astype(jnp.int32)
    tu = u * w - 0.5
    tv = v * h - 0.5
    u0 = jnp.floor(tu)
    v0 = jnp.floor(tv)
    fu = (tu - u0)[..., None]
    fv = (tv - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    base = ti * (SH * SW)

    def tap(vi, ui):
        inside = (ui >= 0) & (ui < wi) & (vi >= 0) & (vi < hi)
        uc = jnp.clip(ui, 0, SW - 1)
        vc = jnp.clip(vi, 0, SH - 1)
        return flat[base + vc * SW + uc] * inside[..., None]

    c00 = tap(v0i, u0i)
    c10 = tap(v0i, u0i + 1)
    c01 = tap(v0i + 1, u0i)
    c11 = tap(v0i + 1, u0i + 1)
    out = (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv
    return jnp.moveaxis(out, -1, 0)


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


def build_face_rows(atlas: SceneAtlas, inputs: RenderInputs, geom: GeometryBuffers):
    """Bake everything shading needs into one (F, ROW) table (differentiable
    w.r.t. geometry). F-sized gathers here replace per-pixel gathers later."""
    f32 = jnp.float32
    vert_pack = jnp.concatenate(
        [
            geom.obj_coords,
            geom.world,
            geom.cam,
            atlas.texcoords,
            geom.normal_world,
            geom.tangent_world,
            geom.bitangent_world,
            geom.sticker_uv,
            geom.pix_hom,
            atlas.vertex_index[:, None].astype(f32),  # exact to 2^24
        ],
        axis=-1,
    )  # (VI, VS)
    F = atlas.faces.shape[0]
    # gather with a 64-float stride (fast wide-row path — see VS_PAD note),
    # then compact the 3x26 real channels back out with cheap static slices
    vp64 = jnp.pad(vert_pack, ((0, 0), (0, VS_PAD - VS)))
    vp64 = jax.lax.optimization_barrier(vp64)  # keep the pad MATERIALIZED
    g = vp64[atlas.faces.reshape(-1)].reshape(F, 3 * VS_PAD)
    corners = jnp.concatenate(
        [g[:, v * VS_PAD : v * VS_PAD + VS] for v in range(3)], axis=1
    )

    fm = atlas.face_mat
    fo = atlas.face_obj
    # TPU gathers cost per ROW (~5 ns) regardless of row width, so 12
    # separate F-sized gathers from the tiny material/object tables were
    # ~12 ms/scene of the bench frame (r5 cells_bisect: rows = 16.8 ms).
    # Pack each table once (M and O are tens of rows — the concats are
    # free) and gather per face exactly twice.
    mat_pack = jnp.concatenate(
        [
            atlas.mat_base_color,                          # 0:4
            atlas.mat_emissive,                            # 4:7
            atlas.mat_metallic[:, None],                   # 7
            atlas.mat_roughness[:, None],                  # 8
            atlas.mat_alpha_cutoff[:, None],               # 9
            atlas.mat_combo[:, None].astype(f32),          # 10
            (atlas.mat_mr_tex >= 0).astype(f32)[:, None],  # 11
        ],
        axis=1,
    )
    obj_pack = jnp.stack(
        [
            inputs.obj_metallic.astype(f32),
            inputs.obj_roughness.astype(f32),
            atlas.obj_sticker_tex.astype(f32),
            atlas.obj_class.astype(f32),
            inputs.obj_instance.astype(f32),
        ],
        axis=1,
    )
    pm = mat_pack[fm]  # (F, 12)
    po = obj_pack[fo]  # (F, 5)
    o_met = po[:, 0]
    o_rough = po[:, 1]
    has_mr_tex = pm[:, 11]
    # per-object overrides replace the material factor AND suppress the
    # texture multiplier (reference render_shader.cpp:373-378 order)
    met = jnp.where(o_met >= 0, o_met, pm[:, 7])
    rough = jnp.where(o_rough >= 0, o_rough, pm[:, 8])
    rough_flag = jnp.where(o_rough >= 0, 0.0, has_mr_tex)
    met_flag = jnp.where(o_met >= 0, 0.0, has_mr_tex)

    face_extra = jnp.concatenate(
        [
            pm[:, 0:4],                                    # 78:82 base color
            pm[:, 4:7],                                    # 82:85 emissive
            met[:, None],                                  # 85
            rough[:, None],                                # 86
            pm[:, 9:10],                                   # 87 alpha cutoff
            pm[:, 10:11],                                  # 88 combo tex id
            po[:, 2:3],                                    # 89 sticker tex id
            po[:, 3:4],                                    # 90 class
            po[:, 4:5],                                    # 91 instance
            rough_flag[:, None],                           # 92
            met_flag[:, None],                             # 93
        ],
        axis=1,
    )
    return jnp.concatenate([corners, face_extra], axis=1)  # (F, ROW)


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
    shadow_mode: str = "vsm",
    texture_filter: str = "trilinear",  # "trilinear" (reference GL) | "bilinear" | "aniso" (multi-tap grazing-angle mode, context.cpp:635)
    shading_dtype: str = "auto",  # "auto" (bf16 on TPU) | "bf16" | "f32"
    stop_after: str | None = None,  # profiling bisect prefixes ("rows"|
    # "gather"|"bary"|"interp"): return the stage's raw outputs so XLA
    # dead-code-eliminates everything downstream (tools/cells_bisect.py)
) -> FrameOutputs:
    H, W = gbuf.tri_id.shape
    valid = gbuf.tri_id >= 0
    tri = jnp.maximum(gbuf.tri_id, 0).reshape(-1)

    rows = build_face_rows(atlas, inputs, geom)  # (F, ROW)
    if stop_after == "rows":
        return rows
    # THE per-pixel gather, then planarize: (N, ROW) -> (ROW, H, W)
    ch = rows[tri].T.reshape(ROW, H, W)
    if stop_after == "gather":
        return ch

    def vblk(v, a, b):
        off = v * VS
        return ch[off + a : off + b]

    def vch(v, a):
        return ch[v * VS + a]

    # --- differentiable barycentrics from homogeneous edge functions ---------
    ph = [vblk(v, 22, 25) for v in range(3)]  # 3 x (3, H, W)
    X = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5, (H, W))
    Y = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5, (H, W))

    def edge(a, b):  # E(p) = cross(a, b) . (x, y, 1); lx/ly are dE/dx, dE/dy
        lx = a[1] * b[2] - a[2] * b[1]
        ly = a[2] * b[0] - a[0] * b[2]
        lc = a[0] * b[1] - a[1] * b[0]
        return lx * X + ly * Y + lc, lx, ly

    E0, lx0, ly0 = edge(ph[1], ph[2])
    E1, lx1, ly1 = edge(ph[2], ph[0])
    E2, lx2, ly2 = edge(ph[0], ph[1])
    Esum = E0 + E1 + E2
    denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
    b0, b1, b2 = E0 / denom, E1 / denom, E2 / denom
    front = (Esum < 0) & valid
    if stop_after == "bary":
        return b0, b1, b2, front

    def interp(a, b):
        return vblk(0, a, b) * b0 + vblk(1, a, b) * b1 + vblk(2, a, b) * b2

    obj_coords = interp(0, 3)      # (3, H, W)
    world = interp(3, 6)
    cam_coords = interp(6, 9)
    uv = interp(9, 11)             # (2, H, W)
    n_world = _normalize3(interp(11, 14))
    t_world = interp(14, 17)
    bt_world = interp(17, 20)
    sticker_uv = interp(20, 22)
    depth = cam_coords[2]
    if stop_after == "interp":
        return obj_coords, world, cam_coords, uv, n_world, depth

    base_color = ch[FACE + 0 : FACE + 4]  # (4, H, W)
    emissive = ch[FACE + 4 : FACE + 7]
    metallic = ch[FACE + 7]
    roughness = ch[FACE + 8]
    cutoff = ch[FACE + 9]

    if sample_textures:
        import os as _os

        tex_stack = (
            atlas.tex_combo_quad
            if _os.environ.get("SL_TEX_SAMPLER", "packed") == "quad"
            else atlas.tex_combo
        )
        combo = jnp.round(ch[FACE + 10]).astype(jnp.int32)
        # analytic screen-space UV derivatives for mip LOD selection: with
        # b_i = E_i/Esum, db_i/dx = (dE_i/dx - b_i * dEsum/dx) / Esum — exact
        # per-pixel footprints (GL's fragment-quad dFdx without the quads)
        from .atlas import TEXTURE_SIZE

        slx = lx0 + lx1 + lx2
        sly = ly0 + ly1 + ly2
        db_dx = ((lx0 - b0 * slx) / denom, (lx1 - b1 * slx) / denom,
                 (lx2 - b2 * slx) / denom)
        db_dy = ((ly0 - b0 * sly) / denom, (ly1 - b1 * sly) / denom,
                 (ly2 - b2 * sly) / denom)
        uvs = [vblk(i, 9, 11) for i in range(3)]  # 3 x (2, H, W)

        def _deriv(db):
            du = uvs[0][0] * db[0] + uvs[1][0] * db[1] + uvs[2][0] * db[2]
            dv = uvs[0][1] * db[0] + uvs[1][1] * db[1] + uvs[2][1] * db[2]
            return du, dv

        du_dx, dv_dx = _deriv(db_dx)
        du_dy, dv_dy = _deriv(db_dy)
        fx2 = du_dx * du_dx + dv_dx * dv_dx  # screen-x footprint^2 in UV
        fy2 = du_dy * du_dy + dv_dy * dv_dy
        if texture_filter == "aniso":
            # Anisotropic sampling (reference uploads every mipmapped texture
            # with setMaxAnisotropy(maxMaxAnisotropy()), context.cpp:635):
            # the isotropic LOD uses the MAJOR footprint axis, blurring
            # grazing-angle surfaces (the tabletop plane). Instead pick the
            # LOD from the MINOR axis (clamped so the major/minor ratio is
            # <= the tap count) and average SL_ANISO_TAPS trilinear taps
            # spaced along the major-axis UV direction — the software
            # analogue of EXT_texture_filter_anisotropic.
            import os

            n_taps = int(os.environ.get("SL_ANISO_TAPS", "4"))
            major2 = jnp.maximum(fx2, fy2)
            minor2 = jnp.maximum(
                jnp.minimum(fx2, fy2), major2 / float(n_taps * n_taps)
            )
            lod = 0.5 * jnp.log2(
                jnp.maximum(minor2 * (TEXTURE_SIZE * TEXTURE_SIZE), 1.0)
            )
            usex = fx2 >= fy2
            dua = jnp.where(usex, du_dx, du_dy)
            dva = jnp.where(usex, dv_dx, dv_dy)
            tex = None
            for k in range(n_taps):
                t = (k + 0.5) / n_taps - 0.5
                tap = sample_combo_mip_planar(
                    tex_stack, combo, uv[0] + t * dua, uv[1] + t * dva,
                    lod, trilinear=True,
                )
                tex = tap if tex is None else tex + tap
            tex = tex / n_taps  # (16, H, W)
        else:
            foot2 = jnp.maximum(fx2, fy2)  # max axis footprint^2
            lod = 0.5 * jnp.log2(
                jnp.maximum(foot2 * (TEXTURE_SIZE * TEXTURE_SIZE), 1.0)
            )
            tex = sample_combo_mip_planar(
                tex_stack, combo, uv[0], uv[1], lod,
                trilinear=(texture_filter == "trilinear"),
            )  # (16, H, W)
        base_color = jnp.concatenate(
            [base_color[:3] * tex[0:3], (base_color[3] * tex[3])[None]], axis=0
        )
        # neutral fills make these no-ops for texture-less layers; the flags
        # suppress the multiplier when a per-object override replaced the factor
        roughness = roughness * (1.0 + ch[FACE + 14] * (tex[4] - 1.0))
        metallic = metallic * (1.0 + ch[FACE + 15] * (tex[5] - 1.0))
        emissive = emissive * tex[9:12]
        nm = tex[6:9] * 2.0 - 1.0  # tangent-space normal (frag:259-270)
        normal = _normalize3(nm[0] * t_world + nm[1] * bt_world + nm[2] * n_world)
    else:
        normal = n_world

    # sticker blend (frag:248-256)
    if sample_stickers:
        sticker_tex = jnp.round(ch[FACE + 11]).astype(jnp.int32)
        in_sticker = (
            (sticker_tex >= 0)
            & (sticker_uv[0] >= 0)
            & (sticker_uv[1] >= 0)
            & (sticker_uv[0] < 1)
            & (sticker_uv[1] < 1)
        )
        st = sample_sticker_planar(
            atlas.sticker_stack, atlas.sticker_size,
            sticker_tex, sticker_uv[0], sticker_uv[1],
        )  # (4, H, W) native-res, clamp-to-border
        blend = jnp.where(in_sticker, st[3], 0.0)
        base_color = jnp.concatenate(
            [base_color[:3] * (1 - blend) + st[:3] * blend, base_color[3:]], axis=0
        )

    alpha_ok = base_color[3] >= cutoff
    roughness = jnp.maximum(roughness, MIN_ROUGHNESS)

    # back-face flip (frag:272-273)
    normal = jnp.where(front, normal, -normal)

    cam_position = inputs.cam_pose[:3, 3]
    V = _normalize3(cam_position[:, None, None] - world)
    NoV = jnp.clip(_dot3(normal, V), 1e-5, 1.0)

    if shading != "flat":
        # lighting math runs in bf16 on TPU (half the VPU time + HBM traffic;
        # output feeds a u8 image so 8 mantissa bits suffice). GT buffers and
        # everything geometric stay f32.
        if shading_dtype == "bf16" or (
            shading_dtype == "auto" and jax.devices()[0].platform == "tpu"
        ):
            dt = jnp.bfloat16
        else:
            dt = jnp.float32
        normal_l = normal.astype(dt)
        V_l = V.astype(dt)
        NoV_l = NoV.astype(dt)
        metallic_l = metallic.astype(dt)
        roughness_l = roughness.astype(dt)
        base_l = base_color[:3].astype(dt)

        F0 = DIELECTRIC_SPECULAR * (1.0 - metallic_l) + base_l * metallic_l
        Fr = jnp.maximum(1.0 - roughness_l, F0) - F0
        k_S = F0 + Fr * (1.0 - NoV_l) ** 5

        color = jnp.zeros((3, H, W), dt)
        n_lights = min(inputs.light_directions.shape[0], max_lights)
        for i in range(n_lights):
            light_color = inputs.light_colors[i]
            light_dir = inputs.light_directions[i]
            light_on = (jnp.any(light_color != 0)) & (jnp.any(light_dir != 0))

            def _light_contrib(i=i, light_color=light_color, light_dir=light_dir):
                Ld = (
                    -light_dir / jnp.maximum(jnp.linalg.norm(light_dir), 1e-12)
                ).astype(dt)  # (3,) scalars broadcast over planes
                Hv = _normalize3(V_l + Ld[:, None, None])
                NdotL = jnp.maximum(_dot3(normal_l, Ld[:, None, None]), 0.0)
                NdotH = jnp.maximum(_dot3(normal_l, Hv), 0.0)

                NDF = _ggx_distribution(NdotH, roughness_l)
                G = _geometry_smith(NoV_l, NdotL, roughness_l)
                spec = (NDF * G) * k_S / jnp.maximum(
                    dt(4.0) * NoV_l * NdotL, dt(1e-3)
                )
                kD = (1.0 - k_S) * (1.0 - metallic_l)

                if shadow_maps is not None and shadow_matrices is not None:
                    # shadow depth compares stay f32 (bias is 3e-5)
                    if shadow_mode == "vsm":
                        from .shadow import shadow_factor_vsm_planar

                        inv_shadow = shadow_factor_vsm_planar(
                            shadow_maps, shadow_matrices, i, world
                        ).astype(dt)
                    else:
                        from .shadow import shadow_factor_planar

                        inv_shadow = shadow_factor_planar(
                            shadow_maps, shadow_matrices, i, world
                        ).astype(dt)
                else:
                    inv_shadow = dt(1.0)

                return (
                    inv_shadow
                    * (kD * base_l * dt(1.0 / jnp.pi) + spec)
                    * light_color.astype(dt)[:, None, None]
                    * NdotL
                )

            # no lax.cond: under the datagen vmap both branches execute
            # anyway, and the cond boundary breaks XLA fusion (materializes
            # every captured plane to HBM). A multiply by the predicate is
            # fused for free.
            color = color + _light_contrib() * light_on.astype(dt)

        color = color + inputs.ambient_light.astype(dt)[:, None, None] * base_l

        if light_map is not None:
            from .ibl import ibl_term

            # IBL stays channels-last (cubemap gathers dominate there);
            # convert at the boundary
            def tohwc(p):
                return jnp.moveaxis(p, 0, -1)

            c_diff = base_color[:3] * (1.0 - DIELECTRIC_SPECULAR) * (1.0 - metallic)
            ibl = ibl_term(
                light_map,
                tohwc(normal),
                tohwc(V),
                NoV,
                roughness,
                tohwc(F0.astype(jnp.float32)),
                tohwc(k_S.astype(jnp.float32)),
                tohwc(c_diff),
            )
            color = color + jnp.moveaxis(ibl, -1, 0).astype(dt)

        color = color.astype(jnp.float32) + emissive
    else:
        color = base_color[:3]

    # --- assemble outputs (channels-last only at the boundary) ---------------
    shown = valid & alpha_ok
    zero = jnp.zeros((H, W), jnp.float32)
    one = jnp.ones((H, W), jnp.float32)

    def sel(p, off=zero):
        return jnp.where(shown, p, off)

    inval = jnp.full((H, W), INVALID, jnp.float32)
    hdr = jnp.stack(
        [sel(color[0]), sel(color[1]), sel(color[2]), sel(base_color[3])], axis=-1
    )
    obj_out = jnp.stack(
        [sel(obj_coords[0], inval), sel(obj_coords[1], inval),
         sel(obj_coords[2], inval), sel(depth, inval)],
        axis=-1,
    )
    cam_out = jnp.stack(
        [sel(cam_coords[0], inval), sel(cam_coords[1], inval),
         sel(cam_coords[2], inval), sel(one, inval)],
        axis=-1,
    )

    R = inputs.cam_pose[:3, :3].T  # rigid: world->cam rotation
    n_cam = _normalize3(
        jnp.stack(
            [
                R[0, 0] * normal[0] + R[0, 1] * normal[1] + R[0, 2] * normal[2],
                R[1, 0] * normal[0] + R[1, 1] * normal[1] + R[1, 2] * normal[2],
                R[2, 0] * normal[0] + R[2, 1] * normal[1] + R[2, 2] * normal[2],
            ]
        )
    )
    ndv = _dot3(normal, V)
    normals_out = jnp.stack(
        [sel(n_cam[0]), sel(n_cam[1]), sel(n_cam[2]), sel(ndv)], axis=-1
    )

    class_out = sel(jnp.round(ch[FACE + 12]), zero).astype(jnp.uint16)
    inst_out = sel(jnp.round(ch[FACE + 13]), zero).astype(jnp.uint16)

    vidx_out = jnp.stack(
        [sel(jnp.round(vch(v, 25)), zero) for v in range(3)], axis=-1
    ).astype(jnp.int32)
    bary_out = jnp.stack([sel(b0), sel(b1), sel(b2)], axis=-1)

    return FrameOutputs(
        hdr=hdr,
        object_coordinates=obj_out,
        cam_coordinates=cam_out,
        class_index=class_out,
        instance_index=inst_out,
        normals=normals_out,
        vertex_indices=vidx_out,
        barycentric_coeffs=bary_out,
        depth=sel(depth, zero),
        valid=shown,
        discarded=valid & ~alpha_ok,
        raster_depth=depth,
    )
