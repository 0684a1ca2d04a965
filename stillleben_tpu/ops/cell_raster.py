"""Compact-cell fine rasterizer: the round-4 redesign of the binned z-buffer.

The round-1..3 design split triangles into size classes (per-pixel scatter
windows for tiny, per-tile capacity lists for medium, a global list for big)
and resolved the tiny class with two scatter-min passes over ~1M (pixel,
depth, id) pairs — 34.5 ms/scene of the bench frame, measured r4. This module
replaces ALL of it with one uniform structure:

- every triangle emits one (tile, depth)-keyed pair per covered tile
  (1/4/16-slot span classes; conservatively all tiles for "big" triangles,
  including any with a vertex behind the camera),
- one argsort orders pairs by (tile, depth-near-first),
- pairs are cut into CELLS of C=128 consecutive triangles of one tile. Cell
  count adapts to the scene (dense tiles get many cells, empty tiles none),
  bounded by a static budget MAXC — the only padding in the design,
- a Pallas kernel z-buffers each cell in VMEM (full 128-lane edge/depth
  evaluation, the same math as ops/fine_raster._eval_chunk),
- per-cell winners merge into per-tile images with a scatter-min over MAXC
  rows (~4k, vs ~1M pairs in the old pixel stage).

Layouts: the line table is gathered in its NATURAL row-major layout
(cell, C, FIELDS) — the old path transposed it to triangle-minor in HBM
(a measured-slow relayout); here the kernel slices single-lane columns
(C, 1) and lane-broadcasts them against the (1, PIX) pixel rows instead.

Semantics match rasterize_tiled.rasterize_vertices: center coverage on
homogeneous edge functions, wp = Ez/Esum depth, near/far/min_depth tests,
deterministic lowest-id tie break at equal depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FIELDS = 16  # 15 line coefficients [L0|L1|L2|Lsum|Lz] x (x,y,c) + 1 pad


def _kernel(tiles_ref, g_ref, ids_ref, md_ref, w_ref, t_ref, *, near, far,
            tw, tile, cpg, n_tiles):
    """Grid step = CPG cells; each cell z-buffers C triangles over one tile's
    PIX pixels. Outputs are PER CELL (identity index maps — no revisiting,
    no data-dependent blocks; the cells -> tiles merge happens in XLA)."""
    pix_n = tile * tile
    step = pl.program_id(0)
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, pix_n), 1)
    px_i = jax.lax.rem(pix, tile)
    py_i = jax.lax.div(pix, tile)

    for k in range(cpg):  # static unroll: CPG cells per DMA'd slab
        w_ref[k] = jnp.full((pix_n,), jnp.inf, jnp.float32)
        t_ref[k] = jnp.full((pix_n,), -1, jnp.int32)
        ti = tiles_ref[0, step * cpg + k]

        @pl.when(ti < n_tiles)
        def _work(k=k, ti=ti):
            tile_ox = jnp.float32(tile) * jnp.float32(jax.lax.rem(ti, tw))
            tile_oy = jnp.float32(tile) * jnp.float32(jax.lax.div(ti, tw))
            X = tile_ox + px_i.astype(jnp.float32) + 0.5  # (1, pix_n)
            Y = tile_oy + py_i.astype(jnp.float32) + 0.5
            g = g_ref[k]  # (C, FIELDS) natural gather layout

            def col(j):  # (C, 1) single-lane slice, lane-broadcast in ops
                return g[:, j : j + 1]

            def edge(e):  # (C, PIX) = lx (x) X + ly (x) Y + lc
                return col(3 * e) * X + col(3 * e + 1) * Y + col(3 * e + 2)

            E0, E1, E2, Esum, Ez = edge(0), edge(1), edge(2), edge(3), edge(4)
            inside = ((E0 >= 0) & (E1 >= 0) & (E2 >= 0)) | (
                (E0 <= 0) & (E1 <= 0) & (E2 <= 0)
            )
            denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
            wp = Ez / denom  # (C, PIX)
            ids_col = ids_ref[k][:, None]  # (C, 1)
            ok = (
                inside
                & (jnp.abs(Esum) > 1e-20)
                & (wp > near)
                & (wp <= far)
                & (wp > md_ref[k][None, :] + 1e-5)
                & (ids_col >= 0)
            )
            inf = jnp.float32(jnp.inf)
            score = jnp.where(ok, wp, inf)
            bw = jnp.min(score, axis=0)  # (PIX,)
            big_id = jnp.int32(2**30)
            bt = jnp.min(
                jnp.where((score == bw[None, :]) & ok, ids_col, big_id), axis=0
            )
            w_ref[k] = bw
            t_ref[k] = jnp.where(bw < inf, bt, -1)


@functools.partial(
    jax.jit,
    static_argnames=("near", "far", "tw", "tile", "cpg", "n_tiles",
                     "interpret"),
)
def cell_raster_pallas(
    G: jax.Array,  # (MAXC, C, FIELDS) f32 line fields, natural layout
    ids: jax.Array,  # (MAXC, C) i32 triangle ids, -1 = masked
    cell_tile: jax.Array,  # (MAXC,) i32 tile of each cell; n_tiles = invalid
    md_cells: jax.Array,  # (MAXC, tile^2) per-cell depth-peel floor
    near: float,
    far: float,
    tw: int,
    tile: int,
    n_tiles: int,
    cpg: int = 8,
    interpret: bool = False,
):
    """Returns (w, t): per-CELL best depth (inf = none) and winner id (-1)."""
    PIX = tile * tile
    MAXC, C = ids.shape
    pad = (-MAXC) % cpg
    if pad:
        G = jnp.pad(G, ((0, pad), (0, 0), (0, 0)))
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=-1)
        cell_tile = jnp.pad(cell_tile, ((0, pad),), constant_values=n_tiles)
        md_cells = jnp.pad(md_cells, ((0, pad), (0, 0)))
    mc = MAXC + pad
    kernel = functools.partial(
        _kernel, near=near, far=far, tw=tw, tile=tile, cpg=cpg,
        n_tiles=n_tiles,
    )
    w, t = pl.pallas_call(
        kernel,
        grid=(mc // cpg,),
        in_specs=[
            # (1, mc) leading-unit-row scalar layout: vmap-safe in SMEM (the
            # same trick as ops/fine_raster's occupancy flags)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((cpg, C, FIELDS), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpg, C), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpg, PIX), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((cpg, PIX), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpg, PIX), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mc, PIX), jnp.float32),
            jax.ShapeDtypeStruct((mc, PIX), jnp.int32),
        ),
        interpret=interpret,
    )(cell_tile.reshape(1, -1), G, ids, md_cells)
    return w[:MAXC], t[:MAXC]
