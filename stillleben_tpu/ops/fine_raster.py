"""Pallas TPU kernel for the binned rasterizer's fine stage.

Fuses, per (tile, triangle-chunk) grid cell, the edge-function matmul
(MXU: (5C,3) x (3,256)), the inside/depth tests, and the z-buffer reduction
— entirely in VMEM. The XLA fallback in rasterize_tiled materializes the
(n_tiles, 5C, 256) edge tensor in HBM per chunk; this kernel never does,
cutting the fine stage's HBM traffic to the triangle tables + the final
(n_tiles, 256) depth/id images.

The grid's minor dimension walks the chunks of one tile sequentially, so the
output blocks act as accumulators (the standard revisiting-output pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIX = 256  # 16x16 tile pixels, flattened (2 x 128 lanes)


def _kernel(a_ref, p_ref, ids_ref, md_ref, w_ref, t_ref, *, near, far, chunk):
    j = pl.program_id(1)
    C = chunk

    A = a_ref[0, 0]  # (5C, 3) rows: [L0 | L1 | L2 | Lsum | Lz]
    P = p_ref[0]  # (3, PIX)
    R = jnp.dot(A, P, preferred_element_type=jnp.float32)  # (5C, PIX)

    E0 = R[:C]
    E1 = R[C : 2 * C]
    E2 = R[2 * C : 3 * C]
    Esum = R[3 * C : 4 * C]
    Ez = R[4 * C : 5 * C]

    inside = ((E0 >= 0) & (E1 >= 0) & (E2 >= 0)) | (
        (E0 <= 0) & (E1 <= 0) & (E2 <= 0)
    )
    denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
    wp = Ez / denom  # (C, PIX)

    ids = ids_ref[0, 0, 0]  # (C,) i32; negative = masked slot
    md = md_ref[0, 0]  # (PIX,)
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

    @pl.when(j == 0)
    def _init():
        w_ref[0, 0] = bw
        t_ref[0, 0] = bt

    @pl.when(j > 0)
    def _merge():
        better = bw < w_ref[0, 0]
        t_ref[0, 0] = jnp.where(better, bt, t_ref[0, 0])
        w_ref[0, 0] = jnp.where(better, bw, w_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("near", "far", "chunk", "interpret"))
def fine_raster_pallas(
    A: jax.Array,  # (n_tiles, n_chunks, 5C, 3) packed line coefficients
    Pmat: jax.Array,  # (n_tiles, 3, PIX) pixel matrix
    ids: jax.Array,  # (n_tiles, n_chunks, C) i32, -1 = masked
    md_tiles: jax.Array,  # (n_tiles, PIX) depth-peel minimum depth
    near: float,
    far: float,
    chunk: int,
    interpret: bool = False,
):
    n_tiles, n_chunks = A.shape[0], A.shape[1]
    kernel = functools.partial(_kernel, near=near, far=far, chunk=chunk)
    # TPU block constraints: the LAST TWO dims of each block must be
    # (divisible by 8, divisible by 128) or equal to the array dims — give
    # every operand a trailing singleton "row" dim where needed.
    ids4 = ids[:, :, None, :]  # (n_tiles, n_chunks, 1, C)
    md3 = md_tiles[:, None, :]  # (n_tiles, 1, PIX)
    w, t = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 5 * chunk, 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, PIX), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.int32),
        ),
        interpret=interpret,
    )(A, Pmat, ids4, md3)
    return w[:, 0], t[:, 0]
