#!/usr/bin/env python
"""In-pipeline stage ablation profiler (run on the real TPU).

Times the bench workload end-to-end and with stages toggled, reporting
amortized ms/scene per stage. Ablation (not xprof) because the device
profiler is unavailable through the relay.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 640, 480
BATCH = int(os.environ.get("PROF_BATCH", "32"))
SUB = int(os.environ.get("PROF_SUB", "8"))


def build():
    import stillleben_tpu as sl
    from stillleben_tpu.parallel.batch import template_from_scene

    sl.init()
    scene = sl.Scene((WIDTH, HEIGHT))
    scene.seed(0)
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    sphere = sl.Mesh("primitive://sphere")
    sphere.scale_to_bbox_diagonal(0.15)
    for i in range(10):
        m = [cube, sphere][i % 2]
        m.class_index = (i % 2) + 1
        scene.add_object(sl.Object(m))
    return template_from_scene(scene)


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    ms_scene = best / BATCH * 1000
    print(f"{label:42s} {best*1000:9.1f} ms total  {ms_scene:8.2f} ms/scene")
    return best


def main():
    from functools import partial

    from stillleben_tpu.parallel.batch import (
        render_with_poses,
        settle_scene,
    )
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    tpl = build()
    solver_cfg = default_config()
    base = dict(
        width=WIDTH, height=HEIGHT, ssao=False, chunk=64, max_lights=1,
        shadow_size=256, tile_capacity=128, fine_chunk=32,
        sample_textures=False, sample_stickers=False,
    )

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    @jax.jit
    def settle_all(keys):
        return jax.vmap(lambda k: settle_scene(k, tpl, solver_cfg, 100))(keys)

    poses, cams, lights = settle_all(keys)
    jax.block_until_ready(poses)
    timeit("settle (100x4) B=%d" % BATCH, settle_all, keys)

    def make_render(cfg):
        @jax.jit
        def rfn(poses, cams, lights):
            def chunklet(pcl):
                p, c, l = pcl
                return jax.vmap(
                    lambda pi, ci, li: render_with_poses(tpl, pi, ci, cfg, li)
                )(p, c, l)

            n_groups = poses.shape[0] // SUB
            grouped = jax.tree.map(
                lambda x: x.reshape((n_groups, SUB) + x.shape[1:]),
                (poses, cams, lights),
            )
            frames = jax.lax.map(chunklet, grouped)
            return frames.rgb, frames.depth

        return rfn

    variants = [
        ("render pbr (bench config)", FrameConfig(shading="pbr", **base)),
        ("render pbr shadow_size=16", FrameConfig(shading="pbr", **{**base, "shadow_size": 16})),
        ("render flat (raster+minimal shade)", FrameConfig(shading="flat", **base)),
        ("render pbr textures on", FrameConfig(shading="pbr", **{**base, "sample_textures": True})),
    ]
    for label, cfg in variants:
        timeit(label, make_render(cfg), poses, cams, lights)


if __name__ == "__main__":
    main()
