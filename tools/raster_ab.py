#!/usr/bin/env python
"""Raster-only A/B: cells vs classic, camera pass and shadow pass separately,
on the bench workload's real geometry (run SOLO on the TPU).

The end-to-end sweep showed cells ~= classic; this isolates WHERE the cell
design wins/loses so the fix targets the right stage.
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

B = int(os.environ.get("AB_BATCH", "4"))
W, H = 640, 480


def timeit(label, fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1000:9.2f} ms total {best*1000/B:8.2f} ms/frame"
          f"  (compile {warm:.0f}s)", flush=True)
    return best


def main():
    import bench as benchmod
    from stillleben_tpu.parallel.batch import settle_scene
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.rasterize import geometry_stage
    from stillleben_tpu.render import rasterize_tiled as rt

    tpl = benchmod.build_template(os.environ.get("AB_WORKLOAD", "textured"))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    poses, cams, lights = jax.jit(jax.vmap(
        lambda k: settle_scene(k, tpl, default_config(), 100)
    ))(keys)
    jax.block_until_ready(poses)
    atlas = tpl.render_atlas
    faces = atlas.faces
    print(f"F={faces.shape[0]} VI={atlas.positions.shape[0]}", flush=True)

    def geom_of(p, c):
        nb = tpl.base_inputs.obj_to_world.shape[0]
        otw = tpl.base_inputs.obj_to_world.at[: p.shape[0]].set(p[:nb])
        inputs = tpl.base_inputs._replace(obj_to_world=otw, cam_pose=c)
        return geometry_stage(atlas, inputs, W, H), inputs

    def cam_raster(mode):
        def one(p, c):
            geom, inputs = geom_of(p, c)
            v = geom.pix_hom[faces]
            visible = inputs.obj_visible[atlas.face_obj]
            if mode == "cells":
                return rt.rasterize_vertices_cells(
                    v, v[..., 2], visible, W, H, 0.1, 10.0, 64, None
                )
            return rt.rasterize_vertices(
                v, v[..., 2], visible, W, H, 0.1, 10.0,
                128, 64, 128, None, pixel_stage=True, use_pallas=True,
            )

        return lambda ps, cs: jax.vmap(one)(ps, cs)

    def shadow_pass(mode):
        from stillleben_tpu.render.frame import FrameConfig
        from stillleben_tpu.render.shadow import render_shadow_maps

        cfg = FrameConfig(width=W, height=H, max_lights=1, shadow_size=2048)

        def one(p, c, l):
            nb = tpl.base_inputs.obj_to_world.shape[0]
            otw = tpl.base_inputs.obj_to_world.at[: p.shape[0]].set(p[:nb])
            inputs = tpl.base_inputs._replace(
                obj_to_world=otw, cam_pose=c,
                light_directions=tpl.base_inputs.light_directions.at[0].set(l),
            )
            geom, _ = geom_of(p, c)
            return render_shadow_maps(atlas, inputs, geom, cfg)

        return lambda ps, cs, ls: jax.vmap(one)(ps, cs, ls)

    sel = os.environ.get("AB_STAGES", "cam_cells,cam_classic,sh_cells,sh_classic").split(",")
    if "cam_cells" in sel:
        os.environ["SL_RASTER"] = "cells"
        timeit("camera raster CELLS", cam_raster("cells"), poses, cams)
    if "cam_classic" in sel:
        os.environ["SL_RASTER"] = "classic"
        jax.clear_caches()
        timeit("camera raster CLASSIC (pallas+pixel)", cam_raster("classic"), poses, cams)
    if "sh_cells" in sel:
        os.environ["SL_RASTER"] = "cells"
        jax.clear_caches()
        timeit("shadow 2048 CELLS", shadow_pass("cells"), poses, cams, lights)
    if "sh_classic" in sel:
        os.environ["SL_RASTER"] = "classic"
        jax.clear_caches()
        timeit("shadow 2048 CLASSIC (splat+binned)", shadow_pass("classic"), poses, cams, lights)


if __name__ == "__main__":
    main()
