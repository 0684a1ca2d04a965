"""Tile-binned rasterizer: sort triangles into screen tiles, then rasterize
each tile against only its own triangle list.

This is the TPU-native answer to the hardware rasterizer's binning: instead
of testing every pixel against every triangle (O(W*H*F), see rasterize.py),
triangles are binned by size class with a single argsort of (bin, depth)
keys — XLA-friendly, static shapes:

- "tiny" triangles (pixel bbox within a 4x4-pixel window — the bulk of dense
  scanned meshes) are z-buffered EXACTLY per pixel: the center-coverage test
  for all F x window^2 (tri, pixel) pairs is evaluated up front and the
  winner per pixel is resolved with two scatter-min passes (depth, then id).
- "medium" triangles (<= 4x4 tile span) go through per-tile lists with a
  depth-sorted capacity (overflow drops the FARTHEST triangles — the right
  failure mode for a z-buffer; their >= window-size area bounds the count).
- "big" triangles (incl. any with a vertex behind the camera, e.g. the 30x30
  tabletop plane) go to a small global list appended to every tile.

The fine stage is laid out for the MXU/VPU: edge functions are computed as
batched (C*3, 3) x (3, TILE^2) matmuls with the pixel axis last and
128-aligned; barycentrics are recomputed only for the winning triangle per
pixel. Output and semantics are identical to rasterize.rasterize (same
homogeneous edge functions / perspective-correct barycentrics / facing rule);
tests assert pixel agreement between the two paths.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .atlas import RenderInputs, SceneAtlas
from .rasterize import GBuffer, GeometryBuffers

TILE = 16
PIX = TILE * TILE  # 256: last-axis size, 2x128 lanes
SPAN_TILES = 4
MAX_SPAN = SPAN_TILES * SPAN_TILES
PIXEL_WINDOW = 4  # tiny-class bbox limit in pixels
MAX_TILES_PER_PASS = 4096  # slab size for the Pallas fine stage (caps the
# gathered line-table transient at high tile counts, e.g. 2048^2 shadows)


def _edge_lines(v):
    """(..., 3verts, 3coords) -> (..., 3edges, 3coefs)."""
    L0 = jnp.cross(v[..., 1, :], v[..., 2, :])
    L1 = jnp.cross(v[..., 2, :], v[..., 0, :])
    L2 = jnp.cross(v[..., 0, :], v[..., 1, :])
    return jnp.stack([L0, L1, L2], axis=-2)


def rasterize_vertices_cells(
    v: jax.Array,  # (F, 3, 3) homogeneous vertex coords (u*w, v*w, w)
    depth_attr: jax.Array,  # (F, 3) per-vertex depth to interpolate & test
    tri_active: jax.Array,  # (F,) bool
    width: int,
    height: int,
    near: float,
    far: float,
    big_capacity: int,
    min_depth: jax.Array | None,
    use_pallas: bool | None = None,
    tile: int = TILE,
    chunk: int = 128,  # triangles per cell (= the 128-lane width)
    tile_cap: int = 8192,  # per-tile pair SAFETY cap. Dropping beyond it
    # loses the farthest triangles of the tile — safe only as a rare
    # pathological-tile guard: at 4x overflow the drops punch HOLES in
    # sloped surfaces (pixels whose nearest cover is far in tile-zmin order)
    max_cells: int | None = None,  # static cell budget (None = auto: scales
    # with F — a whole dense mesh can land in a handful of tiles at small
    # viewports, so the budget must cover ~2 pair entries per triangle)
    stop_after: str | None = None,  # profiling bisect: return the stage's
    # raw outputs early ("classify"|"clsort"|"windows"|"pairs"|"sort"|
    # "cells"|"gather"|"kernel") so XLA dead-code-eliminates everything
    # downstream; prefix deltas = stage cost
    cull_sign: int = 0,  # facing cull: keep faces with det*sign > 0 (det =
    # projected-winding determinant; for CCW-front meshes under the CV
    # projection det<0 faces the camera). 0 = two-sided (reference main-pass
    # semantics, render_pass.cpp:326); -1 = backface cull (output-invariant
    # for closed meshes); +1 = keep back faces (the reference's SHADOW pass
    # front-face cull, render_pass.cpp:428-429). Behind-camera faces are
    # never culled (projected winding undefined).
    cull_mask: jax.Array | None = None,  # (F,) bool: faces eligible for the
    # cull (atlas.face_cullable); None = all
):
    """Compact-cell binned z-buffer (see ops/cell_raster.py): ONE uniform
    (tile, depth)-sorted pair list for every size class — tiny triangles
    included, so there is no per-pixel scatter stage at all — cut into
    128-triangle cells that a Pallas kernel z-buffers in VMEM. The old
    span-class machinery (rasterize_vertices below) remains as the XLA
    fallback and A/B reference."""
    F = v.shape[0]
    pix = tile * tile
    tw = -(-width // tile)
    th = -(-height // tile)
    n_tiles = tw * th

    w = v[..., 2]
    all_front = jnp.all(w > 1e-6, axis=-1)
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    u_px = v[..., 0] / safe_w
    v_px = v[..., 1] / safe_w

    x0 = jnp.clip(jnp.floor(u_px.min(-1)), 0, width - 1)
    x1 = jnp.clip(jnp.ceil(u_px.max(-1)), 0, width - 1)
    y0 = jnp.clip(jnp.floor(v_px.min(-1)), 0, height - 1)
    y1 = jnp.clip(jnp.ceil(v_px.max(-1)), 0, height - 1)
    on_screen = (
        (u_px.max(-1) >= 0)
        & (u_px.min(-1) < width)
        & (v_px.max(-1) >= 0)
        & (v_px.min(-1) < height)
    )
    zmin = depth_attr.min(-1)
    zmax = depth_attr.max(-1)
    in_range = (zmax > near) & (zmin <= far)

    active = tri_active & (zmax > near)
    degenerate = all_front & (~on_screen | ~in_range)
    active = active & ~degenerate

    if cull_sign:
        det = jnp.einsum(
            "fi,fi->f", v[..., 0, :], jnp.cross(v[..., 1, :], v[..., 2, :])
        )
        keep = ~all_front | (det * jnp.float32(cull_sign) > 0)
        if cull_mask is not None:
            keep = keep | ~cull_mask
        active = active & keep

    tx0 = (x0 / tile).astype(jnp.int32)
    tx1 = (x1 / tile).astype(jnp.int32)
    ty0 = (y0 / tile).astype(jnp.int32)
    ty1 = (y1 / tile).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1

    fits = active & all_front
    one_tile = fits & (span_x == 1) & (span_y == 1)
    class2 = fits & ~one_tile & (span_x <= 2) & (span_y <= 2)
    class4 = (
        fits & ~one_tile & ~class2
        & (span_x <= SPAN_TILES) & (span_y <= SPAN_TILES)
    )
    big = active & ~one_tile & ~class2 & ~class4  # incl. behind-camera verts

    arangeF = jnp.arange(F, dtype=jnp.int32)
    znorm = jnp.clip(zmin / far, 0.0, 1.0) * 0.999
    sentinel = jnp.float32(n_tiles + 2)

    # Pair building is overhead-bound, not bytes-bound. TPU scatters cost
    # ~27 ns per UPDATE, so the old cumsum + .at[].set compaction (3 F-sized
    # scatters) was ~10 ms/scene of the bench frame. Compaction is ONE
    # stable face sort by class + static-size dynamic-slice windows:
    #
    #   sorted ids = [big... | one_tile... | class2... | class4... | rest]
    #
    # Each class reads a fixed-cap window at its (traced) start offset.
    # Big faces sort FIRST so nothing can evict them from the big_capacity
    # slots (a dropped big face — e.g. the background plane — is the worst
    # failure mode). Overflow cascades out of window adjacency: each
    # narrower class is followed by a WIDER-emission window whose per-slot
    # (sx < span_x) & (sy < span_y) masks keep exactly the covered tiles —
    # one-tile overflow lands in the class2 window (emitted exactly: only
    # slot (0,0) passes the span mask), class2 overflow in the class4
    # window. Drops: big beyond big_capacity, and class4 beyond cap4 (both
    # rare pathological-scene guards).
    #
    # The one-tile bulk is windowed too (not one direct slot per face): the
    # bitonic pair sort's cost scales with the STATIC list length, so under
    # a facing cull (cull_sign) the compaction is what converts "half the
    # faces are inactive" into an actually smaller sort.
    tilef = ty0.astype(jnp.float32) * tw + tx0.astype(jnp.float32)
    if stop_after == "classify":
        return tilef + znorm, one_tile, class2, class4, big

    # Caps are sized to measured populations (bench scene: class2 ~38k of
    # 211k F, class4 <50); the cascade makes tight caps cost pathological
    # scenes bandwidth, not correctness. Under a facing cull the active set
    # is ~(uncullable + 0.55 * cullable); caps shrink to match when the
    # cull mask is a compile-time constant (atlas arrays are).
    cap1 = F
    cap2 = int(min(F, max(32768, F // 3)))
    cap4 = int(min(F, max(2048, F // 64)))
    if cull_sign:
        try:
            import numpy as _np

            cm = (
                _np.ones(F, bool) if cull_mask is None
                else _np.asarray(cull_mask)
            )
            n_cullable = int(cm.sum())
            cap1 = int(min(F, F - n_cullable + int(n_cullable * 0.62) + 1024))
            cap2 = int(min(cap2, max(16384, cap2 * 2 // 3)))
            cap4 = int(min(cap4, max(2048, cap4 * 2 // 3)))
        except Exception:  # traced mask: keep full-size caps
            pass
    class_key = jnp.where(
        big, 0,
        jnp.where(one_tile, 1, jnp.where(class2, 2, jnp.where(class4, 3, 4))),
    )
    _, sorted_ids = jax.lax.sort(
        (class_key.astype(jnp.int32), arangeF), num_keys=1
    )
    # pad so no window's dynamic_slice can CLAMP at the array end (a clamped
    # slice would shift backwards and pull in faces of the wrong class —
    # including inactive ones, which the maskless big emission would raster)
    sorted_ids = jnp.pad(
        sorted_ids, (0, cap1 + cap2 + cap4 + big_capacity), constant_values=-1
    )
    count1 = jnp.sum(one_tile.astype(jnp.int32))
    count2 = jnp.sum(class2.astype(jnp.int32))
    count4 = jnp.sum(class4.astype(jnp.int32))
    countb = jnp.sum(big.astype(jnp.int32))
    if stop_after == "clsort":
        return sorted_ids, count1, count2, count4, countb

    packed = jnp.stack(
        [
            tx0.astype(jnp.float32),
            ty0.astype(jnp.float32),
            span_x.astype(jnp.float32),
            span_y.astype(jnp.float32),
            znorm,
        ],
        axis=1,
    )  # (F, 5) row-major: one row gather per windowed id

    startb = jnp.int32(0)
    start1 = countb  # one-tile window after ALL bigs (clamped bigs drop)
    start2 = start1 + jnp.minimum(count1, cap1)
    n_in2 = countb + count1 + count2 - start2  # class2 + one-tile overflow
    start4 = start2 + jnp.minimum(n_in2, cap2)

    def _window(start, cap, n_in):
        ids = jax.lax.dynamic_slice(sorted_ids, (start,), (cap,))
        ok = jnp.arange(cap, dtype=jnp.int32) < n_in
        return ids, ok

    def _span_keys(ids, ok, span_budget):
        f = packed[ids]  # (cap, 5)
        n_slots = span_budget * span_budget
        s = jnp.arange(n_slots, dtype=jnp.float32)
        sx = s % span_budget
        sy = jnp.floor(s / span_budget)
        ptx = f[None, :, 0] + sx[:, None]
        pty = f[None, :, 1] + sy[:, None]
        pok = ok[None, :] & (sx[:, None] < f[None, :, 2]) & (sy[:, None] < f[None, :, 3])
        key = jnp.where(pok, pty * tw + ptx + f[None, :, 4], sentinel).reshape(-1)
        tri = jnp.broadcast_to(ids[None, :], (n_slots, ids.shape[0])).reshape(-1)
        return key, tri

    ids1, ok1 = _window(start1, cap1, count1)
    ids2, ok2 = _window(start2, cap2, n_in2)
    ids4, ok4 = _window(start4, cap4, countb + count1 + count2 + count4 - start4)
    key1, tri1 = _span_keys(ids1, ok1, 1)
    key2, tri2 = _span_keys(ids2, ok2, 2)
    key4, tri4 = _span_keys(ids4, ok4, SPAN_TILES)
    if stop_after == "windows":
        return key1, tri1, key2, tri2, key4, tri4

    # big window: FIRST countb sorted faces x EVERY tile (the conservative
    # cover for spans > 4x4 and behind-camera-vertex triangles)
    big_ids, big_okv = _window(startb, big_capacity, countb)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    keyb = jnp.where(
        big_okv[None, :],
        tile_ids[:, None].astype(jnp.float32) + znorm[big_ids][None, :],
        sentinel,
    ).reshape(-1)
    trib = jnp.broadcast_to(big_ids[None, :], (n_tiles, big_capacity)).reshape(-1)

    key = jnp.concatenate([key1, key2, key4, keyb])
    pair_tri = jnp.concatenate([tri1, tri2, tri4, trib])
    if stop_after == "pairs":
        return key, pair_tri

    # co-sort (key, tri) in one lax.sort — no argsort + post-gathers
    sorted_key, sorted_tri = jax.lax.sort((key, pair_tri), num_keys=1)
    n_pairs = sorted_tri.shape[0]
    if stop_after == "sort":
        return sorted_key, sorted_tri

    # per-tile pair ranges -> compact cell list
    bounds = jnp.searchsorted(
        sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.float32)
    )
    starts = bounds[:-1]
    counts = jnp.minimum(bounds[1:] - starts, tile_cap)
    C = chunk
    ncells = -(-counts // C)  # ceil
    cum = jnp.cumsum(ncells)
    total = cum[-1]
    if max_cells is None:
        # F-scaled term assumes ~2 pair emissions per active face; a facing
        # cull leaves ~55-60% of faces active, so the whole static cell
        # budget (which gates the gather + kernel grid cost, measured
        # ~5ns/row regardless of validity) shrinks with it.
        per_face = (F * 2) if not cull_sign else (F * 5) // 4
        max_cells = int(min(
            n_pairs // C + n_tiles, n_tiles + max(512, per_face // C)
        ))
    j = jnp.arange(max_cells, dtype=jnp.int32)
    t_of = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    t_cl = jnp.minimum(t_of, n_tiles - 1)
    base = cum[t_cl] - ncells[t_cl]
    j_in = j - base
    cell_valid = j < total
    cell_tile = jnp.where(cell_valid, t_cl, n_tiles)
    pair0 = starts[t_cl] + j_in * C
    offs = jnp.arange(C, dtype=jnp.int32)
    gi = pair0[:, None] + offs[None, :]
    in_count = (j_in[:, None] * C + offs[None, :]) < counts[t_cl][:, None]
    ids = jnp.where(
        cell_valid[:, None] & in_count,
        sorted_tri[jnp.clip(gi, 0, n_pairs - 1)],
        -1,
    )  # (MAXC, C)
    if stop_after == "cells":
        return ids, cell_tile

    # packed line table (same fields as the classic path), natural layout
    Lf = _edge_lines(v)
    Lsum = Lf.sum(axis=1)
    Lz = (Lf * depth_attr[:, :, None]).sum(axis=1)
    from ..ops.cell_raster import FIELDS as CFIELDS, cell_raster_pallas

    Lcat = jnp.concatenate([Lf.reshape(-1, 9), Lsum, Lz], axis=1)
    LT = jnp.pad(Lcat, ((0, 0), (0, CFIELDS - 15)))
    LT = jax.lax.stop_gradient(LT)
    G = LT[jnp.maximum(ids, 0).reshape(-1)].reshape(max_cells, C, CFIELDS)

    if min_depth is None:
        mdc = jnp.zeros((max_cells, pix), jnp.float32)
    else:
        pad_w = tw * tile
        pad_h = th * tile
        md = jnp.pad(min_depth, ((0, pad_h - height), (0, pad_w - width)))
        md_tiles = (
            md.reshape(th, tile, tw, tile).transpose(0, 2, 1, 3).reshape(n_tiles, pix)
        )
        md_pad = jnp.concatenate(
            [md_tiles, jnp.zeros((1, pix), jnp.float32)], axis=0
        )
        mdc = jax.lax.stop_gradient(md_pad[cell_tile])
    if stop_after == "gather":
        return G, mdc

    interpret = jax.devices()[0].platform != "tpu"
    w_c, t_c = cell_raster_pallas(
        G, ids, cell_tile, mdc, float(near), float(far), tw, tile, n_tiles,
        interpret=interpret,
    )
    if stop_after == "kernel":
        return w_c, t_c

    # cells -> tiles: scatter-min over MAXC rows (vs ~1M pairs in the old
    # pixel stage). Pass 1 min-depth per tile; pass 2 lowest id among cells
    # matching that depth (deterministic tie break).
    inf = jnp.float32(jnp.inf)
    wt = (
        jnp.full((n_tiles + 1, pix), inf, jnp.float32)
        .at[cell_tile].min(w_c, mode="drop")
    )
    BIGID = jnp.int32(2**31 - 1)
    cand = jnp.where(
        (w_c <= wt[cell_tile]) & (w_c < inf) & (t_c >= 0), t_c, BIGID
    )
    tt = (
        jnp.full((n_tiles + 1, pix), BIGID, jnp.int32)
        .at[cell_tile].min(cand, mode="drop")
    )
    depth_t = wt[:n_tiles]
    tri_t = jnp.where(depth_t < inf, tt[:n_tiles], -1)

    pad_w = tw * tile
    pad_h = th * tile
    depth_img = untile_img(depth_t, tw, th, pad_h, pad_w, height, width, tile)
    tri_img = untile_img(tri_t, tw, th, pad_h, pad_w, height, width, tile)
    return depth_img, tri_img


def rasterize_vertices(
    v: jax.Array,  # (F, 3, 3) homogeneous vertex coords (u*w, v*w, w)
    depth_attr: jax.Array,  # (F, 3) per-vertex depth to interpolate & test
    tri_active: jax.Array,  # (F,) bool
    width: int,
    height: int,
    near: float,
    far: float,
    tile_capacity: int,
    big_capacity: int,
    fine_chunk: int,
    min_depth: jax.Array | None,
    pixel_stage: bool = True,
    use_pallas: bool | None = None,
    tile: int = TILE,
    cull_sign: int = 0,
    cull_mask: jax.Array | None = None,
):
    """Core binned z-buffer. Returns (depth, tri_id, front) images; callers
    recompute barycentrics for the winners (differentiably, in shading).

    For perspective rendering depth_attr = w (camera z). For ortho passes
    (shadow maps) pass w == 1 per vertex and the light-space z as depth_attr.

    ``tile`` is the bin edge in pixels. The span classes scale with it:
    "medium" covers up to SPAN_TILES*tile pixels — high-resolution shadow
    passes use bigger tiles so ordinary triangles stay in per-tile lists
    instead of overflowing the global big list (and so the fine grid stays
    ~1k cells instead of 16k).
    """
    import os

    # round-4 default: the compact-cell raster (one uniform pair list, no
    # per-pixel scatter stage — see rasterize_vertices_cells). The classic
    # span-class path stays as the XLA fallback (use_pallas=False) and via
    # SL_RASTER=classic for A/B.
    if os.environ.get("SL_RASTER", "cells") == "cells" and use_pallas is not False:
        return rasterize_vertices_cells(
            v, depth_attr, tri_active, width, height, near, far,
            big_capacity, min_depth, use_pallas, tile,
            cull_sign=cull_sign, cull_mask=cull_mask,
        )
    F = v.shape[0]
    pix = tile * tile
    tw = -(-width // tile)
    th = -(-height // tile)
    n_tiles = tw * th

    w = v[..., 2]
    all_front = jnp.all(w > 1e-6, axis=-1)
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    u_px = v[..., 0] / safe_w
    v_px = v[..., 1] / safe_w

    x0 = jnp.clip(jnp.floor(u_px.min(-1)), 0, width - 1)
    x1 = jnp.clip(jnp.ceil(u_px.max(-1)), 0, width - 1)
    y0 = jnp.clip(jnp.floor(v_px.min(-1)), 0, height - 1)
    y1 = jnp.clip(jnp.ceil(v_px.max(-1)), 0, height - 1)
    on_screen = (
        (u_px.max(-1) >= 0)
        & (u_px.min(-1) < width)
        & (v_px.max(-1) >= 0)
        & (v_px.min(-1) < height)
    )
    zmin = depth_attr.min(-1)
    zmax = depth_attr.max(-1)
    in_range = (zmax > near) & (zmin <= far)

    active = tri_active & (zmax > near)
    degenerate = all_front & (~on_screen | ~in_range)
    active = active & ~degenerate

    if cull_sign:
        det = jnp.einsum(
            "fi,fi->f", v[..., 0, :], jnp.cross(v[..., 1, :], v[..., 2, :])
        )
        keep = ~all_front | (det * jnp.float32(cull_sign) > 0)
        if cull_mask is not None:
            keep = keep | ~cull_mask
        active = active & keep

    px_span_x = (x1.astype(jnp.int32) - x0.astype(jnp.int32)) + 1
    px_span_y = (y1.astype(jnp.int32) - y0.astype(jnp.int32)) + 1
    if pixel_stage:
        tiny = (
            active
            & all_front
            & (px_span_x <= PIXEL_WINDOW)
            & (px_span_y <= PIXEL_WINDOW)
        )
    else:
        # low-poly scenes: per-pixel sorting costs more than it saves;
        # everything goes through the tile lists
        tiny = jnp.zeros_like(active)

    tx0 = (x0 / tile).astype(jnp.int32)
    tx1 = (x1 / tile).astype(jnp.int32)
    ty0 = (y0 / tile).astype(jnp.int32)
    ty1 = (y1 / tile).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    small = active & all_front & ~tiny & (span_x <= SPAN_TILES) & (span_y <= SPAN_TILES)
    big = active & ~small & ~tiny

    # ---- tile pair list for medium triangles --------------------------------
    # XLA's TPU sort is a bitonic network — O(n log^2 n) HBM passes — so the
    # frame cost for dense meshes is DOMINATED by how many pair keys get
    # sorted. Two reductions: (1) compact the medium class to a bounded id
    # list first (cumsum + collision-free scatter, no sort), (2) split it by
    # tile SPAN — a <= 2x2-span triangle needs only 4 pair slots, not
    # MAX_SPAN=16, and in dense scenes nearly all mediums are <= 2x2 — so
    # the sort runs over ~cap2*4 keys instead of med_cap*16.
    arangeF = jnp.arange(F, dtype=jnp.int32)
    znorm = jnp.clip(zmin / far, 0.0, 1.0) * 0.999

    def _span_class_pairs(mask, span_budget, cap):
        """(key, tri) pair arrays for a compacted span class."""
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        src = jnp.where(mask & (rank < cap), rank, cap)
        ids = (
            jnp.zeros((cap + 1,), jnp.int32).at[src].set(arangeF, mode="drop")[:cap]
        )
        ok = jnp.zeros((cap + 1,), bool).at[src].set(mask, mode="drop")[:cap]
        # (n_slots, cap) orientation: triangle axis minor (full 128 lanes)
        n_slots = span_budget * span_budget
        s = jnp.arange(n_slots, dtype=jnp.int32)
        sx = s % span_budget
        sy = s // span_budget
        ptx = tx0[ids][None, :] + sx[:, None]
        pty = ty0[ids][None, :] + sy[:, None]
        pok = (
            ok[None, :]
            & (sx[:, None] < span_x[ids][None, :])
            & (sy[:, None] < span_y[ids][None, :])
        )
        ptile = pty * tw + ptx
        key = jnp.where(
            pok,
            ptile.astype(jnp.float32) + znorm[ids][None, :],
            jnp.float32(n_tiles + 2),
        ).reshape(-1)
        tri = jnp.broadcast_to(ids[None, :], (n_slots, cap)).reshape(-1)
        return key, tri

    small2 = small & (span_x <= 2) & (span_y <= 2)
    small4 = small & ~small2
    cap2 = int(min(F, max(16384, F // 8)))
    cap4 = int(min(F, max(4096, F // 32)))
    key2, tri2 = _span_class_pairs(small2, 2, cap2)
    key4, tri4 = _span_class_pairs(small4, SPAN_TILES, cap4)
    key = jnp.concatenate([key2, key4])
    pair_tri = jnp.concatenate([tri2, tri4])

    order = jnp.argsort(key)
    sorted_key = key[order]
    sorted_tri = pair_tri[order]
    sorted_tile = jnp.floor(sorted_key).astype(jnp.int32)

    starts = jnp.searchsorted(sorted_key, jnp.arange(n_tiles, dtype=jnp.float32))
    offs = jnp.arange(tile_capacity, dtype=jnp.int32)
    gi = jnp.clip(starts[:, None] + offs[None, :], 0, sorted_tri.shape[0] - 1)
    tile_tris = sorted_tri[gi]
    tile_ok = sorted_tile[gi] == jnp.arange(n_tiles, dtype=jnp.int32)[:, None]

    # ---- big-triangle global list --------------------------------------------
    big_rank = jnp.cumsum(big.astype(jnp.int32)) - 1
    big_src = jnp.where(big & (big_rank < big_capacity), big_rank, big_capacity)
    big_ids = (
        jnp.zeros((big_capacity + 1,), jnp.int32)
        .at[big_src]
        .set(jnp.arange(F, dtype=jnp.int32), mode="drop")[:big_capacity]
    )
    big_ok = (
        jnp.zeros((big_capacity + 1,), bool).at[big_src].set(big, mode="drop")[
            :big_capacity
        ]
    )

    tile_tris = jnp.concatenate(
        [tile_tris, jnp.broadcast_to(big_ids[None], (n_tiles, big_capacity))], axis=1
    )
    tile_ok = jnp.concatenate(
        [tile_ok, jnp.broadcast_to(big_ok[None], (n_tiles, big_capacity))], axis=1
    )
    K = tile_tris.shape[1]

    # ---- fine stage -----------------------------------------------------------
    pad_w = tw * tile
    pad_h = th * tile
    if min_depth is None:
        md = jnp.zeros((pad_h, pad_w), jnp.float32)
    else:
        md = jnp.pad(min_depth, ((0, pad_h - height), (0, pad_w - width)))
    md_tiles = (
        md.reshape(th, tile, tw, tile).transpose(0, 2, 1, 3).reshape(n_tiles, pix)
    )

    # precompute per-triangle edge lines and the depth-weighted line:
    # wp(p) = (sum_k E_k(p) * z_k) / (sum_k E_k(p)). Packed into ONE table so
    # the fine stage pays a single gather per chunk (TPU gathers cost per row).
    Lf = _edge_lines(v)  # (F, 3, 3)
    Lsum = Lf.sum(axis=1)  # (F, 3): coefficients of sum_k E_k
    Lz = (Lf * depth_attr[:, :, None]).sum(axis=1)  # (F, 3)
    Lcat = jnp.concatenate([Lf.reshape(-1, 9), Lsum, Lz], axis=1)  # (F, 15)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    n_chunks = -(-K // fine_chunk)
    pad_k = n_chunks * fine_chunk - K

    if use_pallas:
        from ..ops.fine_raster import FIELDS, fine_raster_pallas

        ids_masked = jnp.where(tile_ok, tile_tris, -1)
        ids_c = jnp.pad(ids_masked, ((0, 0), (0, pad_k)), constant_values=-1)
        ids_c = ids_c.reshape(n_tiles, n_chunks, fine_chunk)
        # Line table gathered ROW-major — a column gather from (FIELDS, F)
        # costs ~60ns/id on v5e vs ~5ns for row gathers (tools/raster_bisect)
        # — then transposed per block to the kernel's triangle-minor layout
        # (a (..., 15) layout into the KERNEL pads 15 -> 128 in HBM (8.5x),
        # and the v1 (..., 5C, 3) matmul operand pads 3 -> 128 — 42x, which
        # OOM'd the 2048^2 shadow pass).
        LT = jnp.pad(Lcat, ((0, 0), (0, FIELDS - 15)))  # (F, FIELDS)
        # Hard-raster visibility is non-differentiable by design (the
        # reference's trick too: gradients flow only through the
        # barycentrics recomputed in shading). Stop tangents BEFORE the
        # pallas_call — JVP tracing of a pallas_call is unsupported, and
        # with all-zero tangents JAX skips the JVP rule entirely.
        LT = jax.lax.stop_gradient(LT)
        mdt = jax.lax.stop_gradient(md_tiles)
        # off-TPU (tests, CPU CI) the kernel runs in interpret mode so the
        # Pallas path is exercised without hardware
        interpret = jax.devices()[0].platform != "tpu"

        import os

        # fat-cell grid layout (fine_raster docstring): per-cell DMA/sync
        # overhead dominates at 1-tile cells on dense tile grids
        tpg = int(os.environ.get("SL_FINE_TPG", "1"))

        def run_slab(ids_slab, md_slab, offset):
            """Gather + kernel for one slab of tiles (the gathered G table is
            the peak-memory tensor; slabbing bounds it at high tile counts)."""
            nts = ids_slab.shape[0]
            g = LT[jnp.maximum(ids_slab, 0).reshape(-1)]  # row gather
            g = g.reshape(nts, n_chunks, fine_chunk, FIELDS).transpose(0, 1, 3, 2)
            return fine_raster_pallas(
                g, ids_slab, md_slab, float(near), float(far), fine_chunk, tw,
                interpret=interpret, tile_offset=offset.reshape(1), tile=tile,
                tiles_per_cell=tpg,
            )

        if n_tiles <= MAX_TILES_PER_PASS:
            depth_t, tri_t = run_slab(ids_c, mdt, jnp.zeros((1,), jnp.int32))
        else:
            slab = MAX_TILES_PER_PASS
            pad_t = (-n_tiles) % slab
            ids_p = jnp.pad(
                ids_c, ((0, pad_t), (0, 0), (0, 0)), constant_values=-1
            )
            md_p = jnp.pad(mdt, ((0, pad_t), (0, 0)))
            ns = ids_p.shape[0] // slab
            offs = (jnp.arange(ns, dtype=jnp.int32) * slab)[:, None]
            depth_s, tri_s = jax.lax.map(
                lambda args: run_slab(*args),
                (
                    ids_p.reshape(ns, slab, n_chunks, fine_chunk),
                    md_p.reshape(ns, slab, pix),
                    offs,
                ),
            )
            depth_t = depth_s.reshape(ns * slab, pix)[:n_tiles]
            tri_t = tri_s.reshape(ns * slab, pix)[:n_tiles]
        depth_img = untile_img(depth_t, tw, th, pad_h, pad_w, height, width, tile)
        tri_img = untile_img(tri_t, tw, th, pad_h, pad_w, height, width, tile)
        if pixel_stage:
            depth_img, tri_img = _run_pixel_stages(
                v, Lf, depth_attr, tiny, px_span_x, px_span_y, x0, y0,
                width, height, near, far, min_depth,
                depth_img, tri_img,
            )
        return depth_img, tri_img

    # per-tile pixel matrix P: (n_tiles, 3, PIX) rows = (x, y, 1) — only the
    # XLA fallback path needs it (the Pallas kernel recomputes pixel coords)
    txy = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_ox = (txy % tw * tile).astype(jnp.float32)
    tile_oy = (txy // tw * tile).astype(jnp.float32)
    l = jnp.arange(tile, dtype=jnp.float32) + 0.5
    pxx = tile_ox[:, None] + jnp.tile(l, tile)[None, :]  # (n_tiles, pix)
    pyy = tile_oy[:, None] + jnp.repeat(l, tile)[None, :]
    Pmat = jnp.stack([pxx, pyy, jnp.ones_like(pxx)], axis=1)  # (n_tiles, 3, PIX)

    tile_tris_c = (
        jnp.pad(tile_tris, ((0, 0), (0, pad_k)))
        .reshape(n_tiles, n_chunks, fine_chunk)
        .transpose(1, 0, 2)
    )
    tile_ok_c = (
        jnp.pad(tile_ok, ((0, 0), (0, pad_k)))
        .reshape(n_tiles, n_chunks, fine_chunk)
        .transpose(1, 0, 2)
    )

    inf = jnp.float32(jnp.inf)
    init = (
        jnp.full((n_tiles, pix), inf, jnp.float32),
        jnp.full((n_tiles, pix), -1, jnp.int32),
    )

    def chunk_step(carry, data):
        best_w, best_tri = carry
        tri_ids, ok = data  # (n_tiles, C)
        C = tri_ids.shape[1]
        # ONE gather of the packed line table, then reshape into the matmul A
        Lc = Lcat[tri_ids]  # (n_tiles, C, 15)
        A = jnp.concatenate(
            [
                Lc[..., :9].reshape(n_tiles, C * 3, 3),
                Lc[..., 9:12],
                Lc[..., 12:15],
            ],
            axis=1,
        )  # (n_tiles, C*3 + 2C, 3)
        R = jnp.einsum(
            "nkj,njp->nkp", A, Pmat, preferred_element_type=jnp.float32
        )  # (n_tiles, C*5, PIX)
        E = R[:, : C * 3].reshape(n_tiles, C, 3, pix)
        Esum = R[:, C * 3 : C * 4]  # (n_tiles, C, PIX)
        Ez = R[:, C * 4 :]

        inside = jnp.all(E >= 0, axis=2) | jnp.all(E <= 0, axis=2)
        denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
        wp = Ez / denom  # (n_tiles, C, PIX)

        okc = (
            inside
            & ok[..., None]
            & (jnp.abs(Esum) > 1e-20)
            & (wp > near)
            & (wp <= far)
            & (wp > md_tiles[:, None] + 1e-5)
        )
        score = jnp.where(okc, wp, inf)
        ci = jnp.argmin(score, axis=1)  # (n_tiles, PIX)
        cw = jnp.take_along_axis(score, ci[:, None], axis=1)[:, 0]
        ctri = jnp.take_along_axis(tri_ids, ci, axis=1)

        better = cw < best_w
        best_tri = jnp.where(better, ctri, best_tri)
        best_w = jnp.where(better, cw, best_w)
        return (best_w, best_tri), None

    (depth_t, tri_t), _ = jax.lax.scan(chunk_step, init, (tile_tris_c, tile_ok_c))

    depth_img = untile_img(depth_t, tw, th, pad_h, pad_w, height, width, tile)
    tri_img = untile_img(tri_t, tw, th, pad_h, pad_w, height, width, tile)

    # ---- exact per-pixel stage for tiny triangles -----------------------------
    if pixel_stage:
        depth_img, tri_img = _run_pixel_stages(
            v, Lf, depth_attr, tiny, px_span_x, px_span_y, x0, y0,
            width, height, near, far, min_depth,
            depth_img, tri_img,
        )
    return depth_img, tri_img


def untile_img(x, tw, th, pad_h, pad_w, height, width, tile=TILE):
    """(n_tiles, tile^2) tile-major -> (H, W) image."""
    return (
        x.reshape(th, tw, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )


def _run_pixel_stages(
    v, Lf, depth_attr, tiny, px_span_x, px_span_y, x0, y0,
    width, height, near, far, min_depth, depth_img, tri_img,
):
    """Split the tiny class by bbox size: sub-2px triangles (the bulk of
    dense scanned meshes) pay a 4-pair window, and the 2-4px remainder is
    COMPACTED (cumsum scatter, no sort) before its 16-pair window. Both
    classes' (pixel, depth, id) pair lists feed ONE shared scatter-min
    resolve — a single 3-op chain instead of two."""
    F = v.shape[0]
    tiny2 = tiny & (px_span_x <= 2) & (px_span_y <= 2)
    pid2, w2, tid2 = _pixel_pairs(
        Lf, depth_attr, tiny2, x0, y0, width, height, near, far,
        min_depth, window=2,
    )
    tiny4 = tiny & ~tiny2
    cap4 = int(min(F, max(4096, F // 16)))
    rank = jnp.cumsum(tiny4.astype(jnp.int32)) - 1
    src = jnp.where(tiny4 & (rank < cap4), rank, cap4)
    ar = jnp.arange(F, dtype=jnp.int32)
    ids4 = jnp.zeros((cap4 + 1,), jnp.int32).at[src].set(ar, mode="drop")[:cap4]
    ok4 = jnp.zeros((cap4 + 1,), bool).at[src].set(tiny4, mode="drop")[:cap4]
    pid4, w4, tid4 = _pixel_pairs(
        Lf[ids4], depth_attr[ids4], ok4, x0[ids4], y0[ids4],
        width, height, near, far, min_depth, window=4, tri_ids=ids4,
    )
    return _resolve_pixel_pairs(
        jnp.concatenate([pid2, pid4]),
        jnp.concatenate([w2, w4]),
        jnp.concatenate([tid2, tid4]),
        width, height, depth_img, tri_img,
    )


def _pixel_pairs(
    Lf, depth_attr, tiny, x0, y0, width, height, near, far, min_depth,
    window=PIXEL_WINDOW, tri_ids=None,
):
    """(pixel-id, depth, tri-id) covering pairs for one tiny span class:
    center coverage evaluated for all F x window^2 (tri, pixel) pairs.

    ``tri_ids``: original triangle ids when the inputs are a compacted
    subset (None = identity)."""
    F = Lf.shape[0]
    n_px = width * height
    n_win = window * window

    # (n_win, F) orientation: the TRIANGLE axis rides the 128-lane minor
    # dim — an (F, n_win) layout leaves only n_win (4 or 16) of 128 lanes
    # active for every elementwise op over the pair grid
    win = jnp.arange(n_win, dtype=jnp.int32)
    dx = win % window
    dy = win // window
    px = x0.astype(jnp.int32)[None, :] + dx[:, None]  # (n_win, F)
    py = y0.astype(jnp.int32)[None, :] + dy[:, None]
    in_image = (px < width) & (py < height)
    pix_id = py * width + px  # (n_win, F)

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
        E0 * depth_attr[None, :, 0]
        + E1 * depth_attr[None, :, 1]
        + E2 * depth_attr[None, :, 2]
    ) / denom  # (n_win, F)

    covers = (
        tiny[None, :]
        & in_image
        & inside
        & (jnp.abs(Esum) > 1e-20)
        & (wp > near)
        & (wp <= far)
    )
    if min_depth is not None:
        # depth-peel passes only: the per-pair gather costs ~11 ms/scene at
        # F=210k (tools/raster_bisect), so first-layer renders skip it
        md = min_depth.reshape(-1)
        md_pair = md[jnp.clip(pix_id, 0, n_px - 1)]
        covers = covers & (wp > md_pair + 1e-5)

    pid = jnp.where(covers, pix_id, n_px).reshape(-1)  # n_px = dump slot
    wflat = jnp.where(covers, wp, jnp.inf).reshape(-1)
    tids = jnp.arange(F, dtype=jnp.int32) if tri_ids is None else tri_ids
    tid_pairs = jnp.broadcast_to(tids[None, :], (n_win, F)).reshape(-1)
    return pid, wflat, tid_pairs


def _resolve_pixel_pairs(pid, wflat, tid_pairs, width, height, depth_img, tri_img):
    """Winner-per-pixel from covering pairs with TWO scatter-min passes —
    pass 1 scatter-mins the depth per pixel, pass 2 gathers the winning
    depth back to the pairs and scatter-mins the triangle id among
    exact-depth matches (deterministic lowest-id tie break). The earlier
    sort+searchsorted resolve cost ~3x more on v5e (a bitonic argsort of
    all pair keys + a 20-round searchsorted) and its packed f32
    (pixel + depth) key quantized depth to ~n_px ULPs — only ~5 bits of z
    at 640x480."""
    n_px = width * height
    dmin = jnp.full((n_px + 1,), jnp.inf, jnp.float32).at[pid].min(wflat)

    BIGID = jnp.int32(2**31 - 1)
    # exact f32 equality is safe: the winning pair's wflat is the very value
    # pass 1 scattered
    cand = jnp.where(
        (wflat <= dmin[pid]) & jnp.isfinite(wflat), tid_pairs, BIGID
    )
    twin = jnp.full((n_px + 1,), BIGID, jnp.int32).at[pid].min(cand)

    cw = dmin[:n_px].reshape(height, width)
    ctri = twin[:n_px].reshape(height, width)

    better = cw < depth_img
    return (
        jnp.where(better, cw, depth_img),
        jnp.where(better, ctri, tri_img),
    )


def rasterize_tiled(
    geom: GeometryBuffers,
    atlas: SceneAtlas,
    inputs: RenderInputs,
    width: int,
    height: int,
    near: float = 0.1,
    far: float = 10.0,
    tile_capacity: int = 256,
    big_capacity: int = 64,
    fine_chunk: int = 64,
    min_depth: jax.Array | None = None,
    pixel_stage: bool | None = None,
    use_pallas: bool | None = None,
) -> GBuffer:
    faces = atlas.faces
    v = geom.pix_hom[faces]  # (F, 3, 3)
    visible = inputs.obj_visible[atlas.face_obj]

    if pixel_stage is None:
        # worth its sorting cost only for dense meshes (many sub-pixel tris)
        pixel_stage = faces.shape[0] > 20_000
    # SL_BACKFACE_CULL=1: drop camera-back faces of closed meshes before
    # pair building (output-invariant for watertight geometry; the
    # near-watertight tail is bounded by tests/test_quality_knobs.py).
    # Halves the pair/sort/cell load of dense scanned meshes.
    backcull = os.environ.get("SL_BACKFACE_CULL", "0") != "0"
    depth_img, tri_img = rasterize_vertices(
        v, v[..., 2], visible, width, height, near, far,
        tile_capacity, big_capacity, fine_chunk, min_depth, pixel_stage,
        use_pallas,
        cull_sign=-1 if backcull else 0,
        cull_mask=atlas.face_cullable if backcull else None,
    )
    # bary/front are recomputed differentiably (and planar) in shading from
    # the winning triangle's vertices — don't pay the (H, W, 3, 3) gather here
    placeholder = jnp.zeros((height, width, 3), jnp.float32)
    return jax.lax.stop_gradient(
        GBuffer(
            tri_id=tri_img,
            depth=depth_img,
            bary=placeholder,
            front_facing=jnp.zeros((height, width), bool),
        )
    )
