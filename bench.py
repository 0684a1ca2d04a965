#!/usr/bin/env python
"""Benchmark: YCB-style tabletop datagen throughput (settle + render + GT).

Measures scenes/sec/chip for the BASELINE.json north-star config 3: 10-object
textured tabletop arrange+settle (the reference's fixed 100x4-substep budget,
src/scene.cpp:612-759) plus a full 640x480 PBR render with IBL light map,
SSAO, textured background plane, and all GT buffers — the same pipeline as
the reference's examples/ycb.py:34-84.

Workload (BENCH_WORKLOAD env):
  "textured"   (default) 3 Stanford-bunny instances (textured, ~69k tris
               each) + 7 primitives, IBL light map, textured background
               plane, SSAO, randomized metallic/roughness — the honest
               config-3 analogue.
  "primitives" the round-1 10-primitive untextured workload (upper bound,
               kept for comparison).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "workload"}.
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
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "textured")
BUNNY = "/root/reference/tests/stanford_bunny/scene.gltf"


def _checker_texture(size=512, tiles=8):
    """Procedural uint8 board texture for the background plane."""
    t = size // tiles
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    board = ((yy // t + xx // t) % 2).astype(np.float32)
    rgb = (120 + 90 * board).astype(np.uint8)
    tex = np.stack([rgb, rgb // 2 + 60, np.full_like(rgb, 90), np.full_like(rgb, 255)], -1)
    return tex


def _sky_equirect(h=64, w=128):
    """Synthetic HDR sky: blue gradient + warm sun blob (exercises the full
    IBL precompute + per-pixel IBL shading/skybox path)."""
    v = np.linspace(0, np.pi, h, dtype=np.float32)[:, None]
    u = np.linspace(0, 2 * np.pi, w, dtype=np.float32)[None, :]
    sky = np.stack(
        [
            0.4 + 0.2 * np.cos(v) + 0 * u,
            0.5 + 0.3 * np.cos(v) + 0 * u,
            0.9 + 0.1 * np.cos(v) + 0 * u,
        ],
        -1,
    )
    sun = 40.0 * np.exp(-(((v - 0.9) / 0.08) ** 2 + ((u - 2.0) / 0.08) ** 2))
    sky[..., 0] += sun
    sky[..., 1] += 0.9 * sun
    sky[..., 2] += 0.7 * sun
    return sky.astype(np.float32)


def build_template():
    import stillleben_tpu as sl
    from stillleben_tpu.parallel.batch import template_from_scene
    from stillleben_tpu.render.light_map import LightMap

    sl.init()
    scene = sl.Scene((WIDTH, HEIGHT))
    scene.seed(0)
    rng = np.random.default_rng(7)

    meshes = []
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    sphere = sl.Mesh("primitive://sphere")
    sphere.scale_to_bbox_diagonal(0.15)

    if WORKLOAD == "textured":
        bunny = sl.Mesh(BUNNY)
        bunny.center_bbox()
        bunny.scale_to_bbox_diagonal(0.25)
        order = [bunny, cube, sphere, bunny, cube, sphere, bunny, cube, sphere, cube]
        meshes = [bunny, cube, sphere]
    else:
        order = [cube, sphere] * (N_OBJECTS // 2)
        meshes = [cube, sphere]
    for i, m in enumerate(meshes):
        m.class_index = i + 1

    for m in order[:N_OBJECTS]:
        o = sl.Object(m)
        # reference examples/ycb.py:55-57 randomizes the PBR overrides
        o.metallic = float(rng.random())
        o.roughness = float(rng.random())
        scene.add_object(o)

    if WORKLOAD == "textured":
        sun_dir = np.array([0.3, 0.5, -0.8], np.float32)
        sun_dir /= np.linalg.norm(sun_dir)
        scene.light_map = LightMap.from_equirect(
            _sky_equirect(), lights=[(sun_dir, np.array([3.0, 2.8, 2.5], np.float32))]
        )
        scene.background_plane_size = [3.0, 3.0]
        scene.background_plane_texture = sl.Texture2D(_checker_texture())

    return template_from_scene(scene)


def main():
    from stillleben_tpu.parallel.batch import generate_batch
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    tpl = build_template()

    has_tex = bool((np.asarray(tpl.render_atlas.mat_base_tex) >= 0).any())
    # chunk sized so the rasterizer's per-chunk edge tensor stays ~1 GB
    # across the vmapped batch: B x C x 3 x H x W x 4B
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT, shading="pbr", chunk=chunk,
        ssao=(WORKLOAD == "textured"),  # reference default: SSAO on
        max_lights=1,
        shadow_size=int(os.environ.get("BENCH_SHADOW", "0")),
        tile_capacity=int(os.environ.get("BENCH_TILE_CAP", "128")),
        fine_chunk=int(os.environ.get("BENCH_FINE_CHUNK", "128")),
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
                "workload": (
                    "textured: 3x bunny(69k tris)+7 primitives, IBL light map, "
                    "SSAO, textured bg plane, full GT"
                    if WORKLOAD == "textured"
                    else "primitives: 10 untextured cubes/spheres (upper bound)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
