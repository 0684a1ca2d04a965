#!/usr/bin/env python
"""Micro-bisect of the rasterizer's cost structure on the real TPU (run SOLO).

Times the shadow-pass raster at 2048^2 on bench-shaped geometry, its
pixel_stage=False ablation, and the individual primitives the pipeline leans
on (argsort, searchsorted, gather, scatter) at representative sizes — so
optimization targets the measured hot spot instead of the suspected one.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

F = int(os.environ.get("BIS_F", "210000"))  # bench textured workload: ~208k tris
S = int(os.environ.get("BIS_S", "2048"))


def timeit(label, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best * 1000:9.2f} ms   (compile+warm {warm:.1f}s)",
          flush=True)
    return best


def main():
    print(f"devices: {jax.devices()}  F={F} S={S}", flush=True)
    key = jax.random.PRNGKey(0)

    # bench-shaped ortho shadow geometry: tris ~1.6 px in the 2048^2 map
    k1, k2, k3 = jax.random.split(key, 3)
    centers = jax.random.uniform(k1, (F, 1, 2), minval=100.0, maxval=S - 100.0)
    offs = jax.random.normal(k2, (F, 3, 2)) * 0.8
    xy = (centers + offs).reshape(F * 3, 2)
    z = jax.random.uniform(k3, (F * 3,), minval=0.2, maxval=0.8)
    faces = jnp.arange(F * 3, dtype=jnp.int32).reshape(F, 3)
    tri_on = jnp.ones((F,), bool)

    from stillleben_tpu.render.shadow import _ortho_rasterize_depth

    def shadow_full(xy, z):
        return _ortho_rasterize_depth(xy, z, faces, tri_on, S)

    timeit("shadow raster 2048 FULL", jax.jit(shadow_full), xy, z)

    from stillleben_tpu.render.rasterize_tiled import rasterize_vertices

    def shadow_nopix(xy, z):
        p = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], -1)[faces]
        zf = z[faces]
        d, _ = rasterize_vertices(
            p, zf, tri_on, S, S, near=-1e-3, far=1.0,
            tile_capacity=256, big_capacity=16, fine_chunk=128,
            min_depth=None, tile=64, pixel_stage=False,
        )
        return d

    timeit("shadow raster 2048 pixel_stage=False", jax.jit(shadow_nopix), xy, z)

    def shadow_t16(xy, z):
        p = jnp.concatenate([xy, jnp.ones_like(xy[:, :1])], -1)[faces]
        zf = z[faces]
        d, _ = rasterize_vertices(
            p, zf, tri_on, S, S, near=-1e-3, far=1.0,
            tile_capacity=256, big_capacity=16, fine_chunk=128,
            min_depth=None, tile=16, pixel_stage=False,
        )
        return d

    timeit("shadow raster 2048 tile=16 nopix", jax.jit(shadow_t16), xy, z)

    # ---- primitive costs ----------------------------------------------------
    n_px = S * S
    npairs = 4 * F

    kk = jax.random.split(key, 8)
    pairs_key = jax.random.uniform(kk[0], (npairs,), maxval=float(n_px))
    timeit(f"argsort {npairs} f32", jax.jit(jnp.argsort), pairs_key)

    sorted_keys = jnp.sort(pairs_key)
    queries = jnp.arange(n_px, dtype=jnp.float32)

    def ss(sk):
        return jnp.searchsorted(sk, queries)

    timeit(f"searchsorted {npairs} keys x {n_px} queries", jax.jit(ss), sorted_keys)

    idx = jax.random.randint(kk[1], (npairs,), 0, n_px)
    vals = jax.random.uniform(kk[2], (npairs,))

    def scat(i, v):
        return jnp.zeros((n_px,), jnp.float32).at[i].min(v, mode="drop")

    timeit(f"scatter-min {npairs} -> {n_px}", jax.jit(scat), idx, vals)

    gsrc = jax.random.uniform(kk[3], (16, F))
    gidx = jax.random.randint(kk[4], (400_000,), 0, F)

    def gat(s, i):
        return jnp.take(s, i, axis=1)

    timeit("gather (16, F) x 400k ids", jax.jit(gat), gsrc, gidx)

    img = jax.random.uniform(kk[5], (n_px,))
    gidx2 = jax.random.randint(kk[6], (n_px,), 0, npairs)

    def gat2(s, i):
        return s[i]

    timeit(f"gather {n_px} from {npairs}", jax.jit(gat2), pairs_key, gidx2)

    # one-hot matmul alternative for per-pixel reduction at tile granularity:
    # (T, C) x (C, P) min-plus is emulated via where+min reductions in the
    # Pallas kernel; here measure a plain f32 matmul of the same shape
    a = jax.random.normal(kk[7], (1024, 272))
    b = jax.random.normal(kk[0], (272, 4096))
    timeit("matmul 1024x272x4096 f32 (x16 tiles)", jax.jit(
        lambda a, b: a @ b), a, b)


if __name__ == "__main__":
    main()
