#!/usr/bin/env python
"""Benchmark: YCB-style tabletop datagen throughput (settle + render + GT).

Measures scenes/sec/chip for the BASELINE.json north-star config: multi-object
tabletop arrange+settle (100 iterations x 4 substeps, the reference's fixed
budget, src/scene.cpp:612-759) plus a full 640x480 render with all GT buffers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 500 scenes/sec/chip target from
BASELINE.json (the reference repo publishes no numbers of its own).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

TARGET_SCENES_PER_SEC = 500.0  # BASELINE.json north-star target
WIDTH, HEIGHT = 640, 480
N_OBJECTS = 10
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def build_template():
    import stillleben_tpu as sl
    from stillleben_tpu.parallel.batch import template_from_scene

    sl.init()
    scene = sl.Scene((WIDTH, HEIGHT))
    scene.seed(0)

    # 10-object tabletop. Mesh complexity is selectable: the YCB-style
    # default uses primitive cubes+spheres (~6k triangles total); set
    # BENCH_BUNNY=1 to add the 69k-triangle Stanford bunny per instance.
    bunny = "/root/reference/tests/stanford_bunny/scene.gltf"
    meshes = []
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    meshes.append(cube)
    sphere = sl.Mesh("primitive://sphere")
    sphere.scale_to_bbox_diagonal(0.15)
    meshes.append(sphere)
    if os.environ.get("BENCH_BUNNY") and os.path.exists(bunny):
        b = sl.Mesh(bunny)
        b.center_bbox()
        b.scale_to_bbox_diagonal(0.25)
        meshes.append(b)

    for i in range(N_OBJECTS):
        m = meshes[i % len(meshes)]
        o = sl.Object(m)
        m.class_index = (i % len(meshes)) + 1
        scene.add_object(o)

    return template_from_scene(scene)


def main():
    from stillleben_tpu.parallel.batch import generate_batch
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    tpl = build_template()
    import numpy as np

    has_tex = bool((np.asarray(tpl.render_atlas.mat_base_tex) >= 0).any())
    # chunk sized so the rasterizer's per-chunk edge tensor stays ~1 GB
    # across the vmapped batch: B x C x 3 x H x W x 4B
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    # the datagen pipeline drives exactly one directional light (slot 0)
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT, shading="pbr", ssao=False, chunk=chunk,
        max_lights=1,
        shadow_size=int(os.environ.get("BENCH_SHADOW", "256")),
        tile_capacity=int(os.environ.get("BENCH_TILE_CAP", "128")),
        fine_chunk=int(os.environ.get("BENCH_FINE_CHUNK", "32")),
        sample_textures=has_tex,
        sample_stickers=False,
    )
    solver_cfg = default_config()

    keys = jax.random.split(jax.random.PRNGKey(42), BATCH)
    sub = int(os.environ.get("BENCH_RENDER_SUB", "8"))

    # compile + warmup
    out = generate_batch(keys, tpl, cfg, solver_cfg, render_sub_batch=sub)
    jax.block_until_ready(out.rgb)

    times = []
    for r in range(REPEATS):
        keys = jax.random.split(jax.random.PRNGKey(100 + r), BATCH)
        t0 = time.perf_counter()
        out = generate_batch(keys, tpl, cfg, solver_cfg, render_sub_batch=sub)
        jax.block_until_ready(out.rgb)
        times.append(time.perf_counter() - t0)

    best = min(times)
    scenes_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": "ycb_tabletop_scenes_per_sec_per_chip_640x480",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / TARGET_SCENES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
