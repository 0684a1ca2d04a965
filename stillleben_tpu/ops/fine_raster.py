"""Pallas TPU kernel for the binned rasterizer's fine stage.

Fuses, per (tile, triangle-chunk) grid cell, the edge-function evaluation,
the inside/depth tests, and the z-buffer reduction — entirely in VMEM. The
XLA fallback in rasterize_tiled materializes the (n_tiles, 5C, 256) edge
tensor in HBM per chunk; this kernel never does.

Layout is chosen for the TPU's (8, 128) tiling: the packed line table G keeps
the TRIANGLE axis minor — G[tile, chunk, field, tri] with 16 fields
(15 line coefficients + 1 pad row). A layout with the 3 coefficients minor
(the v1 kernel's (5C, 3) matmul operand) pads 3 -> 128 in HBM, a 42x blowup
that OOMs the 2048^2 shadow pass; it also ran the MXU at a contraction depth
of 3 (2% utilization). Edge values are instead computed as rank-1 broadcasts
on the VPU (lx (x) X + ly (x) Y + lc), and the per-tile pixel coordinates are
recomputed from the grid index — no pixel-matrix input at all.

Two grid layouts:

- ``tiles_per_cell=1`` (default): grid (n_tiles, n_chunks); the minor grid
  dim walks one tile's chunks sequentially so the output blocks act as
  accumulators (the standard revisiting-output pattern).
- ``tiles_per_cell=TPG>1``: grid (n_tiles/TPG, n_chunks); each cell DMAs a
  TPG-tile slab and loops the tiles in-kernel. Per-scene cell counts drop
  TPG-fold — at 640x480 the 1200-tile grid makes per-cell DMA/sync overhead
  (not the 44M pair evaluations) the stage's wall-clock, so fewer, fatter
  cells are the lever.

Both layouts skip fully-masked (tile, chunk) cells via a prefetched
occupancy flag (sparse regions; the splat classes empty nearly every
shadow-pass tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16  # default tile edge; PIX = TILE^2 lanes per tile row
PIX = TILE * TILE
FIELDS = 16  # 15 line coefficients [L0|L1|L2|Lsum|Lz] x (x,y,c) + 1 pad row


def _eval_chunk(G, ids, md, i, *, near, far, tw, tile):
    """One (tile, chunk) z-buffer evaluation.

    G (FIELDS, C) line table, ids (C,) triangle ids (-1 masked), md (PIX,)
    depth-peel floor, i traced global tile id. Returns (bw, bt): per-pixel
    best depth (inf = none) and winner id (-1)."""
    pix_n = tile * tile
    # per-tile pixel centers from the grid index (no Pmat input); Mosaic only
    # has integer iota, so index math stays i32 until the final convert
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, pix_n), 1)
    tile_ox = jnp.float32(tile) * jnp.float32(jax.lax.rem(i, tw))
    tile_oy = jnp.float32(tile) * jnp.float32(jax.lax.div(i, tw))
    X = tile_ox + jax.lax.rem(pix, tile).astype(jnp.float32) + 0.5  # (1, pix_n)
    Y = tile_oy + jax.lax.div(pix, tile).astype(jnp.float32) + 0.5

    def edge(g):  # E_g(p) = lx*x + ly*y + lc as a rank-1 broadcast (C, PIX)
        lx = G[3 * g + 0][:, None]
        ly = G[3 * g + 1][:, None]
        lc = G[3 * g + 2][:, None]
        return lx * X + ly * Y + lc

    E0, E1, E2, Esum, Ez = edge(0), edge(1), edge(2), edge(3), edge(4)

    inside = ((E0 >= 0) & (E1 >= 0) & (E2 >= 0)) | (
        (E0 <= 0) & (E1 <= 0) & (E2 <= 0)
    )
    denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
    wp = Ez / denom  # (C, PIX)

    ids_col = ids[:, None]  # broadcast the 32-bit value FIRST (Mosaic can't
    # insert a minor dim on 1-bit types), then compare
    ok = (
        inside
        & (jnp.abs(Esum) > 1e-20)
        & (wp > near)
        & (wp <= far)
        & (wp > md[None, :] + 1e-5)
        & (ids_col >= 0)
    )
    inf = jnp.float32(jnp.inf)
    score = jnp.where(ok, wp, inf)  # (C, PIX)
    bw = jnp.min(score, axis=0)  # (PIX,)
    # winner id without a gather: min id among score == bw
    big_id = jnp.int32(2**30)
    bt = jnp.min(
        jnp.where((score == bw[None, :]) & ok, ids_col, big_id), axis=0
    )
    bt = jnp.where(bw < inf, bt, -1)
    return bw, bt


def _kernel(off_ref, occ_ref, g_ref, ids_ref, md_ref, w_ref, t_ref, *, near,
            far, tw, tile):
    pix_n = tile * tile
    i_loc = pl.program_id(0)
    i = i_loc + off_ref[0]  # global tile id (slab offset in SMEM)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        w_ref[0, 0] = jnp.full((pix_n,), jnp.inf, jnp.float32)
        t_ref[0, 0] = jnp.full((pix_n,), -1, jnp.int32)

    # Occupancy skip: most (tile, chunk) cells in sparse regions carry only
    # masked (-1) slots — the whole edge/z-buffer evaluation is predicated
    # off for them (the splat classes empty nearly every shadow-pass tile).
    # The flags live as ONE (1, n_cells) i32 array in SMEM indexed by
    # (tile, chunk) arithmetically. The leading unit row keeps the operand
    # legal under vmap: batching turns a flat (n_cells,) array into a
    # (Squeezed, Blocked(n_cells)) block whose second-minor dim (1 vs B) is
    # neither 8-divisible nor equal to the array dim — Mosaic rejects it —
    # while (B, 1, n_cells) blocks to the array's own trailing (1, n_cells).
    @pl.when(occ_ref[0, i_loc * pl.num_programs(1) + j] > 0)
    def _work():
        bw, bt = _eval_chunk(
            g_ref[0, 0], ids_ref[0, 0, 0], md_ref[0, 0], i,
            near=near, far=far, tw=tw, tile=tile,
        )
        better = bw < w_ref[0, 0]
        t_ref[0, 0] = jnp.where(better, bt, t_ref[0, 0])
        w_ref[0, 0] = jnp.where(better, bw, w_ref[0, 0])


def _kernel_grouped(off_ref, occ_ref, g_ref, ids_ref, md_ref, w_ref, t_ref,
                    *, near, far, tw, tile, tpg):
    pix_n = tile * tile
    i_loc = pl.program_id(0)
    base = (i_loc * tpg) + off_ref[0]
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    for t in range(tpg):  # static unroll: one DMA'd slab, TPG tile evals

        @pl.when(j == 0)
        def _init(t=t):
            w_ref[0, t] = jnp.full((pix_n,), jnp.inf, jnp.float32)
            t_ref[0, t] = jnp.full((pix_n,), -1, jnp.int32)

        @pl.when(occ_ref[0, (i_loc * tpg + t) * n_chunks + j] > 0)
        def _work(t=t):
            bw, bt = _eval_chunk(
                g_ref[0, t, 0], ids_ref[0, t, 0, 0], md_ref[0, t], base + t,
                near=near, far=far, tw=tw, tile=tile,
            )
            better = bw < w_ref[0, t]
            t_ref[0, t] = jnp.where(better, bt, t_ref[0, t])
            w_ref[0, t] = jnp.where(better, bw, w_ref[0, t])


@functools.partial(
    jax.jit,
    static_argnames=(
        "near", "far", "chunk", "tw", "interpret", "tile", "tiles_per_cell"
    ),
)
def fine_raster_pallas(
    G: jax.Array,  # (n_tiles, n_chunks, FIELDS, C) line fields, tri-minor
    ids: jax.Array,  # (n_tiles, n_chunks, C) i32, -1 = masked
    md_tiles: jax.Array,  # (n_tiles, tile^2) depth-peel minimum depth
    near: float,
    far: float,
    chunk: int,
    tw: int,  # tiles per image row (pixel coords recomputed in-kernel)
    interpret: bool = False,
    tile_offset: jax.Array | None = None,  # global id of tile row 0 (slabs)
    tile: int = TILE,  # tile edge in pixels (shadow passes use bigger tiles)
    tiles_per_cell: int = 1,  # >1: loop TPG tiles per grid cell (fat DMAs)
):
    PIX = tile * tile
    n_tiles, n_chunks = G.shape[0], G.shape[1]
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    # per-cell occupancy for the kernel's predication (any unmasked slot?);
    # kept as ONE (1, n_cells) row in SMEM — see the kernel comment for why
    # the leading unit row is required for vmap (render_sub_batch) safety
    occ = (ids >= 0).any(-1).astype(jnp.int32)  # (n_tiles, n_chunks)
    # TPU block constraints: the LAST TWO dims of each block must be
    # (divisible by 8, divisible by 128) or equal to the array dims — give
    # every operand a trailing singleton "row" dim where needed.
    ids4 = ids[:, :, None, :]  # (n_tiles, n_chunks, 1, C)
    md3 = md_tiles[:, None, :]  # (n_tiles, 1, PIX)

    tpg = tiles_per_cell
    if tpg <= 1:
        kernel = functools.partial(_kernel, near=near, far=far, tw=tw,
                                   tile=tile)
        w, t = pl.pallas_call(
            kernel,
            grid=(n_tiles, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_offset scalar
                pl.BlockSpec(memory_space=pltpu.SMEM),  # flat occupancy flags
                pl.BlockSpec((1, 1, FIELDS, chunk), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, chunk), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.int32),
            ),
            interpret=interpret,
        )(tile_offset, occ.reshape(1, -1), G, ids4, md3)
        return w[:, 0], t[:, 0]

    # grouped layout: pad the tile axis to a TPG multiple, add a group axis
    pad_t = (-n_tiles) % tpg
    if pad_t:
        Gp = jnp.pad(G, ((0, pad_t), (0, 0), (0, 0), (0, 0)))
        ids4 = jnp.pad(ids4, ((0, pad_t), (0, 0), (0, 0), (0, 0)),
                       constant_values=-1)
        md3 = jnp.pad(md3, ((0, pad_t), (0, 0), (0, 0)))
        occ = jnp.pad(occ, ((0, pad_t), (0, 0)))
    else:
        Gp = G
    ng = (n_tiles + pad_t) // tpg
    Gg = Gp.reshape(ng, tpg, n_chunks, FIELDS, Gp.shape[-1])
    idsg = ids4.reshape(ng, tpg, n_chunks, 1, ids4.shape[-1])
    mdg = md3.reshape(ng, tpg, PIX)
    occg = occ.reshape(ng, tpg, n_chunks)

    kernel = functools.partial(_kernel_grouped, near=near, far=far, tw=tw,
                               tile=tile, tpg=tpg)
    w, t = pl.pallas_call(
        kernel,
        grid=(ng, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flat occupancy flags
            pl.BlockSpec((1, tpg, 1, FIELDS, chunk),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpg, 1, 1, chunk), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpg, PIX), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tpg, PIX), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpg, PIX), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ng, tpg, PIX), jnp.float32),
            jax.ShapeDtypeStruct((ng, tpg, PIX), jnp.int32),
        ),
        interpret=interpret,
    )(tile_offset, occg.reshape(1, -1), Gg, idsg, mdg)
    w = w.reshape(ng * tpg, PIX)[:n_tiles]
    t = t.reshape(ng * tpg, PIX)[:n_tiles]
    return w, t
