"""Shadow maps: per-light ortho depth render + 4x4 PCF lookup.

Reference: 3-layer 2048^2 shadow texture array with hardware compare
(render_pass.cpp:271-294), ortho matrix fitted to the casters
(computeShadowMapMatrix, render_pass.cpp:131-211), 4x4 PCF with bias 3e-5
(render_shader.frag:321-338). Here the ortho fit covers all shadow-casting
objects' vertices (the reference intersects with the view frustum as an
optimization of the same idea). Default resolution matches the reference
(2048^2) on TPU; CPU CI runs keep 512^2 for speed (quality-only — GT
buffers are unaffected).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from .atlas import RenderInputs, SceneAtlas

SHADOW_BIAS = 3e-5  # reference render_shader.frag:335


def _splat_tiny_depth(
    p: jax.Array,  # (F, 3, 3) homogeneous (x, y, 1) shadow-pixel verts
    zf: jax.Array,  # (F, 3) light-space depth per vertex
    tiny: jax.Array,  # (F,) bool: tris whose bbox fits the pixel window
    size: int,
    window: int = 2,
) -> jax.Array:
    """Exact z-buffer of sub-window-px triangles as ONE scatter-min -> (S, S).

    Dense scanned meshes project to ~1-2 px triangles even in a 2048^2
    shadow map; routing them through per-tile lists overflows any static
    capacity, and the sort+searchsorted exact stage costs ~630 ms at 4.2M
    pixels on v5e (searchsorted = 20 serial gather rounds). A depth-only
    pass needs no triangle ids, so the winner-per-pixel reduction IS a
    scatter-min (~34 ms measured) over the window^2 candidate pixels per
    triangle — identical coverage/depth semantics, no sort, no search."""
    from .rasterize_tiled import _edge_lines

    F = p.shape[0]
    n_px = size * size
    x0 = jnp.floor(p[..., 0].min(-1)).astype(jnp.int32)
    y0 = jnp.floor(p[..., 1].min(-1)).astype(jnp.int32)

    # (n_win, F) orientation: triangle axis minor (full 128 lanes)
    Lf = _edge_lines(p)  # (F, 3edges, 3coefs)
    win = jnp.arange(window * window, dtype=jnp.int32)
    px = x0[None, :] + (win % window)[:, None]  # (n_win, F)
    py = y0[None, :] + (win // window)[:, None]
    cx = px.astype(jnp.float32) + 0.5
    cy = py.astype(jnp.float32) + 0.5
    E0 = Lf[None, :, 0, 0] * cx + Lf[None, :, 0, 1] * cy + Lf[None, :, 0, 2]
    E1 = Lf[None, :, 1, 0] * cx + Lf[None, :, 1, 1] * cy + Lf[None, :, 1, 2]
    E2 = Lf[None, :, 2, 0] * cx + Lf[None, :, 2, 1] * cy + Lf[None, :, 2, 2]
    inside = ((E0 >= 0) & (E1 >= 0) & (E2 >= 0)) | (
        (E0 <= 0) & (E1 <= 0) & (E2 <= 0)
    )
    Esum = E0 + E1 + E2
    denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
    wp = (
        E0 * zf[None, :, 0] + E1 * zf[None, :, 1] + E2 * zf[None, :, 2]
    ) / denom  # (n_win, F)

    covers = (
        tiny[None, :]
        & inside
        & (jnp.abs(Esum) > 1e-20)
        & (wp > 0.0)
        & (wp <= 1.0)
        & (px >= 0)
        & (px < size)
        & (py >= 0)
        & (py < size)
    )
    pid = jnp.where(covers, py * size + px, n_px)  # OOB id -> dropped
    img = jnp.full((n_px,), 1.0, jnp.float32)
    img = img.at[pid.reshape(-1)].min(
        jnp.where(covers, wp, 1.0).reshape(-1), mode="drop"
    )
    return img.reshape(size, size)


def _ortho_rasterize_depth(
    xy: jax.Array,  # (V, 2) shadow-map pixel coords
    z: jax.Array,  # (V,) normalized depth in [0, 1]
    faces: jax.Array,  # (F, 3)
    tri_on: jax.Array,  # (F,)
    size: int,
    use_pallas: bool | None = None,
    tri_cullable: jax.Array | None = None,  # (F,) closed-mesh faces eligible
    # for the reference's shadow-pass FRONT-face cull
    # (render_pass.cpp:428-429): only light-back faces write depth, which
    # both halves the pair load and moves the stored depth to the caster's
    # far side (the reference's acne-avoidance trick). SL_SHADOW_CULL=0
    # reverts to the two-sided map.
) -> jax.Array:
    """Depth-only ortho rasterization -> (size, size) min-depth map (1 = far).

    With the compact-cell raster (SL_RASTER=cells, the default) ALL shadow
    triangles go through one uniform pair list — sub-pixel splat classes and
    capacity lists are gone (ops/cell_raster.py). The classic path below
    (SL_RASTER=classic or use_pallas=False) splits by projected size:
    sub-2px triangles are splatted exactly via scatter-min
    (_splat_tiny_depth); everything larger goes through the binned tile
    rasterizer with homogeneous w == 1 (ortho) and the light-space depth as
    the interpolated attribute."""
    import os

    from .rasterize_tiled import rasterize_vertices, rasterize_vertices_cells

    p = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], -1)[faces]  # (F,3,3)
    zf = z[faces]  # (F, 3)

    # Default OFF: the reference's front-face cull (render_pass.cpp:428-429)
    # suits its hard PCF compares, but our VSM default prefilters MOMENTS —
    # removing the light-front surfaces leaves silhouette texels mixing
    # caster-back depth with far background, which inflates the Chebyshev
    # variance and eats the penumbra (measured: ground-shadow fraction
    # 0.0096 -> 0.0034 on the proxy-agreement scene). The raster win is
    # negligible anyway: shadow passes already draw the decimated proxy.
    cull = os.environ.get("SL_SHADOW_CULL", "0") == "1"
    cull_sign = 1 if (cull and tri_cullable is not None) else 0

    if (
        os.environ.get("SL_RASTER", "cells") == "cells"
        and use_pallas is not False
    ):
        # Cell shape for the depth-only pass: the caster proxy is ~8k faces
        # over a 2048^2 map, so tiles hold ~16 triangles — far below the
        # main raster's 128-triangle cells. Kernel work is cells*C*tile^2;
        # a sparse pass wants SMALLER cells (C) and tiles than the dense
        # 640x480 main pass (measured: tile=64/C=128 made the shadow pass
        # 27 ms/scene of the tuned frame).
        on_tpu = jax.devices()[0].platform == "tpu"
        tile = int(os.environ.get("SL_SHADOW_TILE", "32" if size >= 1024 else "16"))
        # CPU/interpret keeps C=128: smaller cells mean 4x the interpreted
        # grid steps for zero benefit off-hardware
        chunk = int(os.environ.get("SL_SHADOW_CHUNK", "32" if on_tpu else "128"))
        depth_img, _ = rasterize_vertices_cells(
            p, zf, tri_on, size, size,
            near=-1e-3, far=1.0,
            big_capacity=16,
            min_depth=None,
            use_pallas=use_pallas,
            tile=tile,
            chunk=chunk,
            cull_sign=cull_sign,
            cull_mask=tri_cullable,
        )
        return jnp.minimum(depth_img, 1.0)

    if cull_sign:
        # classic path: the tiny splat classes bypass rasterize_vertices, so
        # the cull applies to tri_on up front (ortho: det = 2x signed area)
        det = jnp.einsum(
            "fi,fi->f", p[:, 0, :], jnp.cross(p[:, 1, :], p[:, 2, :])
        )
        tri_on = tri_on & (~tri_cullable | (det > 0))

    xmin = p[..., 0].min(-1)
    xmax = p[..., 0].max(-1)
    ymin = p[..., 1].min(-1)
    ymax = p[..., 1].max(-1)
    on_map = (xmax >= 0) & (xmin < size) & (ymax >= 0) & (ymin < size)
    spx = jnp.ceil(xmax) - jnp.floor(xmin)
    spy = jnp.ceil(ymax) - jnp.floor(ymin)
    tiny2 = tri_on & on_map & (spx <= 2) & (spy <= 2)
    # 2-4 px class: at 2048^2 the BULK of a dense scanned mesh lands here
    # (camera-subpixel tris are ~3-6 shadow px) — splat it too (compacted,
    # 16-slot window) so the binned lists only hold sparse >4px triangles
    tiny4 = tri_on & on_map & ~tiny2 & (spx <= 4) & (spy <= 4)
    F = p.shape[0]
    cap4 = int(min(F, max(8192, F // 2)))
    rank = jnp.cumsum(tiny4.astype(jnp.int32)) - 1
    src = jnp.where(tiny4 & (rank < cap4), rank, cap4)
    ar = jnp.arange(F, dtype=jnp.int32)
    ids4 = jnp.zeros((cap4 + 1,), jnp.int32).at[src].set(ar, mode="drop")[:cap4]
    ok4 = jnp.zeros((cap4 + 1,), bool).at[src].set(tiny4, mode="drop")[:cap4]
    # overflow beyond cap4 stays in the binned path
    in_splat4 = jnp.zeros((F,), bool).at[ids4].set(ok4)

    # High-res maps use BIGGER bins: at 2048^2 with 16 px tiles, ordinary
    # object faces (~200 px) overflow the global big-triangle list and the
    # fine grid balloons to 16k cells. 64 px tiles keep the same content in
    # per-tile lists (span class covers <= 256 px) over ~1k cells; with the
    # tiny classes routed to the splats, the lists only hold sparse >4px tris.
    tile = 64 if size >= 1024 else 16
    depth_img, _ = rasterize_vertices(
        p, zf, tri_on & ~tiny2 & ~in_splat4, size, size,
        near=-1e-3, far=1.0,
        tile_capacity=128, big_capacity=16, fine_chunk=128,
        min_depth=None,
        use_pallas=use_pallas,
        tile=tile,
        pixel_stage=False,
    )
    depth_img = jnp.minimum(depth_img, _splat_tiny_depth(p, zf, tiny2, size))
    depth_img = jnp.minimum(
        depth_img,
        _splat_tiny_depth(p[ids4], zf[ids4], ok4, size, window=4),
    )
    return jnp.minimum(depth_img, 1.0)


def render_shadow_maps(atlas: SceneAtlas, inputs: RenderInputs, geom, cfg):
    """Returns (maps, matrices (L, 4, 4) world->shadow-uv-z).

    maps is (L, S, S) raw depth for PCF mode, or (L, S, S, 2) prefiltered
    moments for VSM mode (cfg.shadow_mode)."""
    size = getattr(cfg, "shadow_size", 0) or (
        2048 if jax.devices()[0].platform == "tpu" else 512
    )  # reference default: 3 x 2048^2 layers (render_pass.cpp:271-294)
    mode = getattr(cfg, "shadow_mode", "vsm")
    n_lights = min(
        inputs.light_directions.shape[0], getattr(cfg, "max_lights", 3)
    )
    caster = inputs.obj_casts_shadows & inputs.obj_visible
    vert_on = caster[atlas.shadow_vert_obj]
    tri_on = caster[atlas.shadow_face_obj]
    faces = atlas.shadow_faces

    # world positions of the shadow-caster proxy verts (same transform chain
    # as geometry_stage; identical values when the proxy is the identity)
    o = atlas.shadow_vert_obj
    M_mo = inputs.mesh_to_obj[o]
    M_ow = inputs.obj_to_world[o]
    pos = atlas.shadow_positions
    obj_coords = (
        jnp.einsum("vij,vj->vi", M_mo[:, :3, :3], pos, precision="highest")
        + M_mo[:, :3, 3]
    )
    world = (
        jnp.einsum("vij,vj->vi", M_ow[:, :3, :3], obj_coords, precision="highest")
        + M_ow[:, :3, 3]
    )  # (VS, 3)
    # bounding box of casters (masked)
    big = 1e9
    w_masked_min = jnp.where(vert_on[:, None], world, big)
    w_masked_max = jnp.where(vert_on[:, None], world, -big)
    lo = w_masked_min.min(axis=0)
    hi = w_masked_max.max(axis=0)
    center = 0.5 * (lo + hi)
    radius = jnp.maximum(0.5 * jnp.linalg.norm(hi - lo), 1e-3)

    # ONE program vmapped over the light axis (not a Python loop): the ortho
    # raster is by far the biggest subprogram in the frame — unrolling it
    # 3x tripled compile time and serialized three half-occupancy launches.
    def _one_light(light_dir, light_color):
        light_on = jnp.any(light_dir != 0) & jnp.any(light_color != 0)
        ldir = m.normalize(light_dir)
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

        # no lax.cond: under the datagen vmap both branches would run
        # anyway (batched predicates select, not branch) and the cond
        # boundary breaks fusion. Inactive slots select the empty map.
        d = _ortho_rasterize_depth(
            jnp.stack([u, v], -1), z, faces, tri_on, size,
            use_pallas=getattr(cfg, "use_pallas", None),
            tri_cullable=atlas.shadow_face_cullable,
        )
        m_on = build_vsm(d) if mode == "vsm" else d
        map_i = jnp.where(light_on, m_on, jnp.ones_like(m_on))

        # world -> (u_pix, v_pix, z_norm) affine matrix for lookup
        A = jnp.zeros((4, 4), jnp.float32)
        A = A.at[0, :3].set(world_to_light[0, :3] / ext * 0.5 * size)
        A = A.at[0, 3].set((world_to_light[0, 3] / ext * 0.5 + 0.5) * size)
        A = A.at[1, :3].set(world_to_light[1, :3] / ext * 0.5 * size)
        A = A.at[1, 3].set((world_to_light[1, 3] / ext * 0.5 + 0.5) * size)
        A = A.at[2, :3].set(world_to_light[2, :3] / zmax)
        A = A.at[2, 3].set(world_to_light[2, 3] / zmax)
        A = A.at[3, 3].set(1.0)
        return map_i, A

    return jax.vmap(_one_light)(
        inputs.light_directions[:n_lights], inputs.light_colors[:n_lights]
    )


def build_vsm(depth_map: jax.Array, taps: int = 4) -> jax.Array:
    """Variance shadow map: 4x4 box-prefiltered (E[d], E[d^2]) moments.

    TPU-first replacement for per-pixel 4x4 PCF: the 16-tap filter moves to
    the (small, dense) shadow map where it is a separable shift-add, and the
    per-pixel lookup becomes ONE bilinear tap + a Chebyshev bound — 4 gathers
    instead of 16 (TPU gathers cost per row). Donnelly & Lauritzen 2006."""
    S = depth_map.shape[0]

    def box1d(x, axis):
        acc = x
        for k in range(1, taps):
            acc = acc + jnp.roll(x, -k, axis=axis)
        return acc / taps

    # centered-ish 4-tap box (offset by taps//2 to recentre the window)
    d = jnp.roll(depth_map, taps // 2, axis=0)
    d = jnp.roll(d, taps // 2, axis=1)
    mu = box1d(box1d(d, 0), 1)
    m2 = box1d(box1d(d * d, 0), 1)
    return jnp.stack([mu, m2], axis=-1)  # (S, S, 2)


VSM_MIN_VARIANCE = 1e-6
VSM_BLEED = 0.3  # light-bleed reduction cutoff


def shadow_factor_vsm_planar(
    vsm_maps: jax.Array,  # (L, S, S, 2) prefiltered moments
    shadow_matrices: jax.Array,  # (L, 4, 4)
    light: int,
    world: jax.Array,  # (3, H, W) channel planes
) -> jax.Array:
    """Chebyshev upper-bound soft shadow from one bilinear VSM tap.

    SL_VSM_TAPS=1 point-samples the moments instead (1 gather/px instead of
    4 — TPU gathers cost per row). The moments are already 4x4
    box-prefiltered, so the point tap only loses the sub-texel lerp; at
    2048^2 the visible delta is a <=1-texel edge quantization."""
    import os

    S = vsm_maps.shape[1]
    A = shadow_matrices[light]
    u = A[0, 0] * world[0] + A[0, 1] * world[1] + A[0, 2] * world[2] + A[0, 3]
    v = A[1, 0] * world[0] + A[1, 1] * world[1] + A[1, 2] * world[2] + A[1, 3]
    z = A[2, 0] * world[0] + A[2, 1] * world[1] + A[2, 2] * world[2] + A[2, 3]

    flat = vsm_maps[light].reshape(S * S, 2)
    tu = u - 0.5
    tv = v - 0.5

    if os.environ.get("SL_VSM_TAPS", "4") == "1":
        ui = jnp.clip(jnp.round(tu).astype(jnp.int32), 0, S - 1)
        vi = jnp.clip(jnp.round(tv).astype(jnp.int32), 0, S - 1)
        mom = flat[vi * S + ui]  # (H, W, 2)
    else:
        u0 = jnp.floor(tu)
        v0 = jnp.floor(tv)
        fu = (tu - u0)[..., None]
        fv = (tv - v0)[..., None]
        u0i = jnp.clip(u0.astype(jnp.int32), 0, S - 1)
        u1i = jnp.clip(u0i + 1, 0, S - 1)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, S - 1)
        v1i = jnp.clip(v0i + 1, 0, S - 1)

        def fetch(vi, ui):
            return flat[vi * S + ui]  # (H, W, 2)

        mom = (fetch(v0i, u0i) * (1 - fu) + fetch(v0i, u1i) * fu) * (1 - fv) + (
            fetch(v1i, u0i) * (1 - fu) + fetch(v1i, u1i) * fu
        ) * fv
    mu = mom[..., 0]
    sigma2 = jnp.maximum(mom[..., 1] - mu * mu, VSM_MIN_VARIANCE)
    dz = jnp.maximum(z - SHADOW_BIAS - mu, 0.0)
    p_max = sigma2 / (sigma2 + dz * dz)
    p = jnp.clip((p_max - VSM_BLEED) / (1.0 - VSM_BLEED), 0.0, 1.0)
    return jnp.where(dz <= 0.0, 1.0, p)


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
