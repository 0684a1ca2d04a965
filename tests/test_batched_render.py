"""Batched rendering must equal per-scene rendering (the binning /
pixel-stage compaction paths are batch-size independent)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_batched_render_matches_unbatched():
    """End-to-end: a vmapped render equals per-scene renders (the rewritten
    sorts change the program, not the image)."""
    import stillleben_tpu as sl
    from stillleben_tpu.parallel.batch import (
        render_with_poses,
        settle_scene,
        template_from_scene,
    )
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    scene = sl.Scene((48, 48))
    scene.seed(0)
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.25)
    cube.class_index = 1
    scene.add_object(sl.Object(cube))
    scene.add_object(sl.Object(cube))
    tpl = template_from_scene(scene)
    cfg = FrameConfig(width=48, height=48, ssao=False, max_lights=1, shadow_size=64)

    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    poses, cams, lights = jax.vmap(
        lambda k: settle_scene(k, tpl, default_config(), 5)
    )(keys)
    batched = jax.jit(
        jax.vmap(lambda p, c, l: render_with_poses(tpl, p, c, cfg, l))
    )(poses, cams, lights)
    for b in range(3):
        single = render_with_poses(
            tpl, jax.tree.map(lambda x: x[b], poses), cams[b], cfg, lights[b]
        )
        np.testing.assert_array_equal(
            np.asarray(batched.instance_index[b]), np.asarray(single.instance_index)
        )
