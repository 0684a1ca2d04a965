#!/usr/bin/env python
"""In-pipeline stage ablation profiler (run on the real TPU, SOLO — a second
python process contends for the relay tunnel and corrupts every number).

Times the bench workload end-to-end and with stages toggled, reporting
amortized ms/scene per stage plus COMPILE seconds per variant (compile cost
is a first-class budget on the relay: the driver's bench has a finite wall
clock). Ablation (not xprof) because the device profiler is unavailable
through the relay.

PROF_WORKLOAD=textured (default: the honest bench workload — 3 bunnies,
IBL, SSAO, textured plane) | primitives.
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
BATCH = int(os.environ.get("PROF_BATCH", "8"))
SUB = int(os.environ.get("PROF_SUB", "4"))
WORKLOAD = os.environ.get("PROF_WORKLOAD", "textured")


def timeit(label, fn, *args, n=2):
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
    ms_scene = best / BATCH * 1000
    # checksum forces a real device->host readback: a sub-ms "best" with a
    # sane checksum means block_until_ready returned without executing
    # (observed once through the relay, r5) — treat such rows as invalid
    leaf = jax.tree.leaves(out)[0]
    chk = float(jnp.asarray(leaf).astype(jnp.float32).sum())
    print(
        f"{label:44s} {best * 1000:9.1f} ms total  {ms_scene:8.2f} ms/scene"
        f"   (compile+warm {warm:.1f}s, chk {chk:.3g})",
        flush=True,
    )
    return best


def main():
    import bench as benchmod
    from stillleben_tpu.parallel.batch import render_with_poses, settle_scene
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    tpl = benchmod.build_template(WORKLOAD)
    # honor the bench/TUNED physics knobs so the profile reflects the
    # shipped configuration (bench.py:259-262 reads the same env)
    solver_cfg = default_config()._replace(
        contact_gen=os.environ.get("BENCH_CONTACT_GEN", "substep"),
        max_narrow_pairs=int(os.environ.get("BENCH_NARROW_PAIRS", "256")),
    )

    import numpy as np

    has_tex = bool((np.asarray(tpl.render_atlas.mat_base_tex) >= 0).any())
    base = dict(
        width=WIDTH, height=HEIGHT, shading="pbr", chunk=64,
        ssao=(WORKLOAD == "textured"), max_lights=1,
        shadow_size=0, shadow_mode="vsm",
        tile_capacity=128, fine_chunk=128,
        sample_textures=has_tex, sample_stickers=False,
    )

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    def make_settle(cfg):
        @jax.jit
        def settle_all(keys):
            return jax.vmap(lambda k: settle_scene(k, tpl, cfg, 100))(keys)

        return settle_all

    settle_all = make_settle(solver_cfg)
    poses, cams, lights = settle_all(keys)
    jax.block_until_ready(poses)
    timeit("settle (100x4) B=%d" % BATCH, settle_all, keys)

    # PROF_SETTLE=1: ablate the settle cost (narrowphase vs solver split)
    if os.environ.get("PROF_SETTLE"):
        for label, over in [
            ("settle frame-mode contact gen", dict(contact_gen="frame")),
            ("settle velocity_iterations=4", dict(velocity_iterations=4)),
            ("settle velocity_iterations=1", dict(velocity_iterations=1)),
            ("settle position_iterations=1", dict(position_iterations=1)),
            ("settle max_narrow_pairs=128", dict(max_narrow_pairs=128)),
        ]:
            timeit(label, make_settle(solver_cfg._replace(**over)), keys)

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

    def cfgv(**over):
        kw = dict(base)
        kw.update(over)
        return FrameConfig(**kw)

    variants = [
        ("full", "render FULL (bench config)", cfgv()),
        ("noshadow", "render shadow off", cfgv(shadow_mode="off")),
        ("shadow512", "render shadow 512", cfgv(shadow_size=512)),
        ("nossao", "render ssao off", cfgv(ssao=False)),
        ("refssao", "render reference-mode ssao", cfgv(ssao_mode="reference")),
        ("notex", "render textures off", cfgv(sample_textures=False)),
        ("flat", "render flat (raster+minimal shade)",
         cfgv(shading="flat", shadow_mode="off", ssao=False)),
        ("flat_nopix", "render flat, pixel stage off",
         cfgv(shading="flat", shadow_mode="off", ssao=False, pixel_stage=False)),
        ("flat_nopallas", "render flat, XLA fine stage",
         cfgv(shading="flat", shadow_mode="off", ssao=False, use_pallas=False)),
    ]
    # PROF_VARIANTS: comma-separated keys (default: all) — each variant is a
    # fresh 5+ minute XLA compile on the relay, so select what you need
    sel = os.environ.get("PROF_VARIANTS", "")
    keys_sel = [k for k in sel.split(",") if k]
    for key, label, cfg in variants:
        if keys_sel and key not in keys_sel:
            continue
        timeit(label, make_render(cfg), poses, cams, lights)

    if not keys_sel or "geom" in keys_sel:
        from stillleben_tpu.render.rasterize import geometry_stage

        @jax.jit
        def geom_only(poses, cams):
            def one(p, c):
                nb_render = tpl.base_inputs.obj_to_world.shape[0]
                otw = tpl.base_inputs.obj_to_world.at[: p.shape[0]].set(
                    p[:nb_render]
                )
                inputs = tpl.base_inputs._replace(obj_to_world=otw, cam_pose=c)
                return geometry_stage(tpl.render_atlas, inputs, WIDTH, HEIGHT)

            return jax.vmap(one)(poses, cams)

        timeit("geometry stage only", geom_only, poses, cams)


if __name__ == "__main__":
    main()
