#!/usr/bin/env python
"""Micro-timings of the raster building blocks at bench-realistic sizes
(F=210k faces, 640x480 camera, 2048^2 shadow). Run SOLO on the TPU.

The binned raster's cost is dominated by data-movement primitives whose TPU
costs are not obvious from FLOPs: bitonic argsort, scatter-min with
duplicate indices, row gathers, cumsum compaction. This prints each at the
sizes the pipeline actually uses so layout decisions are data-driven.
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

F = int(os.environ.get("BIS_F", "210000"))
N_PX = 640 * 480
B = int(os.environ.get("BIS_B", "8"))


def timeit(label, fn, *args, n=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best * 1000 / B:8.2f} ms/scene  (warm {warm:.1f}s)",
          flush=True)
    return best


def main():
    print(f"devices: {jax.devices()}  F={F} B={B}", flush=True)
    k = jax.random.PRNGKey(0)
    npairs2 = F * 4
    pid = jax.random.randint(k, (B, npairs2), 0, N_PX + 1)
    w = jax.random.uniform(k, (B, npairs2), jnp.float32)
    tid = jax.random.randint(k, (B, npairs2), 0, F)

    @jax.jit
    def scatter_min_f32(pid, w):
        return jax.vmap(
            lambda p, x: jnp.full((N_PX + 1,), jnp.inf, jnp.float32)
            .at[p]
            .min(x)
        )(pid, w)

    @jax.jit
    def scatter_min_i32(pid, t):
        return jax.vmap(
            lambda p, x: jnp.full((N_PX + 1,), 2**31 - 1, jnp.int32).at[p].min(x)
        )(pid, tid)

    @jax.jit
    def gather_back(pid, img):
        return jax.vmap(lambda p, i: i[p])(pid, img)

    @jax.jit
    def full_resolve(pid, w, tid):
        def one(p, x, t):
            dmin = jnp.full((N_PX + 1,), jnp.inf, jnp.float32).at[p].min(x)
            cand = jnp.where(x <= dmin[p], t, 2**31 - 1)
            return jnp.full((N_PX + 1,), 2**31 - 1, jnp.int32).at[p].min(cand)

        return jax.vmap(one)(pid, w, tid)

    img = scatter_min_f32(pid, w)
    timeit(f"scatter-min f32 {npairs2} -> {N_PX}", scatter_min_f32, pid, w)
    timeit(f"scatter-min i32 {npairs2} -> {N_PX}", scatter_min_i32, pid, tid)
    timeit(f"gather {npairs2} from {N_PX}", gather_back, pid, img)
    timeit(f"two-pass resolve {npairs2}", full_resolve, pid, w, tid)

    for n in (F * 2, F, F // 2):
        pidn, wn, tidn = pid[:, :n], w[:, :n], tid[:, :n]
        timeit(f"two-pass resolve {n}", full_resolve, pidn, wn, tidn)

    @jax.jit
    def asort(x):
        return jax.vmap(jnp.argsort)(x)

    keys = jax.random.uniform(k, (B, npairs2), jnp.float32)
    timeit(f"argsort {npairs2} f32", asort, keys)
    timeit(f"argsort {npairs2 // 4} f32", asort, keys[:, : npairs2 // 4])

    @jax.jit
    def compact(mask):
        def one(mk):
            rank = jnp.cumsum(mk.astype(jnp.int32)) - 1
            cap = npairs2 // 4
            src = jnp.where(mk & (rank < cap), rank, cap)
            ar = jnp.arange(npairs2, dtype=jnp.int32)
            return (
                jnp.zeros((cap + 1,), jnp.int32).at[src].set(ar, mode="drop")[:cap]
            )

        return jax.vmap(one)(mask)

    mask = w < 0.25
    timeit(f"cumsum-compact {npairs2} -> {npairs2 // 4}", compact, mask)

    # row gather at texture-tap sizes: 8 taps x (H, W) rows of 16 channels
    stack = jax.random.uniform(k, (2 * 87381, 16), jnp.float32)
    ids_px = jax.random.randint(k, (B, 8, N_PX), 0, stack.shape[0])

    @jax.jit
    def tex_taps(ids):
        return jax.vmap(lambda i: stack[i])(ids.reshape(B, -1)).sum(axis=1)

    timeit("texture taps 8 x 307k rows of 16f32", tex_taps, ids_px)

    stack_u32 = (stack[:, :4] * 255).astype(jnp.uint32)
    packed = (
        stack_u32[:, 0]
        | (stack_u32[:, 1] << 8)
        | (stack_u32[:, 2] << 16)
        | (stack_u32[:, 3] << 24)
    )  # (N,) one u32 word per texel

    @jax.jit
    def tex_taps_packed(ids):
        return jax.vmap(lambda i: packed[i])(ids.reshape(B, -1)).sum(axis=1)

    timeit("texture taps 8 x 307k words of 1u32", tex_taps_packed, ids_px)


if __name__ == "__main__":
    main()
