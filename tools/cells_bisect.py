#!/usr/bin/env python
"""Stage bisect of the compact-cell rasterizer at bench shapes (run SOLO on
the TPU). profile_stages.py showed "render flat" (raster + minimal shade)
costs ~142 ms/scene while the micro-op model predicts ~20 — this pins which
sub-stage eats the difference.

Uses rasterize_vertices_cells(stop_after=...) prefixes: XLA dead-code
eliminates everything past the returned stage, so the DELTA between
consecutive rows is that stage's cost. Also times the full raster wrapper
and flat shading so raster-vs-shade is separated.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

WIDTH, HEIGHT = 640, 480
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
    print(f"{label:46s} {best * 1000 / B:8.2f} ms/scene  (compile+warm {warm:.1f}s)",
          flush=True)
    return best


def main():
    import bench as benchmod
    from stillleben_tpu.parallel.batch import settle_scene
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.rasterize import geometry_stage
    from stillleben_tpu.render.rasterize_tiled import (
        rasterize_tiled,
        rasterize_vertices_cells,
    )

    print(f"devices: {jax.devices()} B={B}", flush=True)
    tpl = benchmod.build_template("textured")
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    @jax.jit
    def settle_all(keys):
        return jax.vmap(lambda k: settle_scene(k, tpl, default_config(), 100))(keys)

    poses, cams, lights = jax.block_until_ready(settle_all(keys))

    atlas = tpl.render_atlas

    @jax.jit
    def geoms(poses, cams):
        def one(p, c):
            nb = tpl.base_inputs.obj_to_world.shape[0]
            otw = tpl.base_inputs.obj_to_world.at[: p.shape[0]].set(p[:nb])
            inputs = tpl.base_inputs._replace(obj_to_world=otw, cam_pose=c)
            return geometry_stage(atlas, inputs, WIDTH, HEIGHT), inputs

        return jax.vmap(one)(poses, cams)

    geom, inputs = jax.block_until_ready(geoms(poses, cams))
    faces = atlas.faces
    print(f"faces: {faces.shape[0]}", flush=True)

    # BIS_CULL=1: backface-cull closed meshes before pair building
    cull = os.environ.get("BIS_CULL", "0") == "1"
    cull_kw = dict(
        cull_sign=-1 if cull else 0,
        cull_mask=atlas.face_cullable if cull else None,
    )
    if cull:
        print(f"backface cull ON (cullable: "
              f"{float(jnp.mean(atlas.face_cullable.astype(jnp.float32))):.2f})",
              flush=True)

    def raster_prefix(stop):
        @jax.jit
        def fn(geom, inputs):
            def one(g, i):
                v = g.pix_hom[faces]
                visible = i.obj_visible[atlas.face_obj]
                return rasterize_vertices_cells(
                    v, v[..., 2], visible, WIDTH, HEIGHT, 0.1, 10.0,
                    64, None, stop_after=stop, **cull_kw,
                )

            return jax.vmap(one)(geom, inputs)

        return fn

    stages = ["classify", "clsort", "windows", "pairs", "sort", "cells",
              "gather", "kernel", None]
    sel = os.environ.get("BIS_STAGES")
    if sel is not None:
        want = sel.split(",")
        stages = [s for s in stages if (s or "FULL") in want]
    if os.environ.get("BIS_SHADE", "0") == "1":  # shade stages only
        stages = []
    for stop in stages:
        timeit(f"cells raster through: {stop or 'FULL'}",
               raster_prefix(stop), geom, inputs)

    @jax.jit
    def raster_full(geom, inputs):
        def one(g, i):
            return rasterize_tiled(g, atlas, i, WIDTH, HEIGHT,
                                   big_capacity=64)

        return jax.vmap(one)(geom, inputs)

    timeit("rasterize_tiled (wrapper, gbuffer out)", raster_full, geom, inputs)

    # flat shade on top of the raster = "render flat" minus geometry+raster
    from stillleben_tpu.render.shading import shade

    def raster_and_shade(stop):
        @jax.jit
        def fn(geom, inputs):
            def one(g, i):
                gbuf = rasterize_tiled(g, atlas, i, WIDTH, HEIGHT,
                                       big_capacity=64)
                return shade(atlas, i, g, gbuf, shading="flat",
                             light_map=None, shadow_maps=None,
                             shadow_matrices=None, max_lights=1,
                             sample_textures=False, sample_stickers=False,
                             stop_after=stop)

            return jax.vmap(one)(geom, inputs)

        return fn

    for stop in ["rows", "gather", "bary", "interp", None]:
        timeit(f"raster + flat shade through: {stop or 'FULL'}",
               raster_and_shade(stop), geom, inputs)


if __name__ == "__main__":
    main()
