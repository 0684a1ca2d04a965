"""Pallas fine-raster kernel coverage on CPU via interpret mode.

Round-1 gaps closed here: the kernel used to run only on real TPU (no CPU
test existed), and JVP tracing through the pallas_call crashed the
differentiable render path on TPU. These tests (a) force the Pallas path in
interpret mode and assert pixel agreement with the XLA scan fallback, and
(b) run jax.value_and_grad through the full render program with Pallas on —
gradients must flow via the recomputed barycentrics in shading (hard-raster
visibility is stop-gradient by design, same as the reference's Sobel-diff
scheme, python/stillleben/diff.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stillleben_tpu as sl
from stillleben_tpu.parallel.batch import (
    apply_pose_delta_matrix,
    render_with_poses,
    settle_scene,
    template_from_scene,
)
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig

# small shadow maps: interpret mode walks the pallas grid in Python
_BASE = dict(
    width=48, height=48, shading="pbr", ssao=False, max_lights=1,
    chunk=64, shadow_size=64,
)
CFG_PALLAS = FrameConfig(use_pallas=True, **_BASE)
CFG_XLA = FrameConfig(use_pallas=False, **_BASE)


@pytest.fixture(scope="module")
def settled():
    scene = sl.Scene((48, 48))
    scene.seed(0)
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.25)
    cube.class_index = 1
    sph = sl.Mesh("primitive://sphere")
    sph.scale_to_bbox_diagonal(0.3)
    sph.class_index = 2
    scene.add_object(sl.Object(cube))
    scene.add_object(sl.Object(sph))
    tpl = template_from_scene(scene)
    poses, cam, light = settle_scene(
        jax.random.PRNGKey(5), tpl, default_config(), settle_iterations=10
    )
    return tpl, poses, cam, light


def test_pallas_matches_brute_force(settled):
    """The compact-cell Pallas raster (round-4 default) agrees EXACTLY with
    the O(F * W * H) brute-force z-buffer — no capacity drops, no scatter
    stage. (The classic span-class path is checked separately below; it
    drops a small fraction of triangles by design at tight capacities.)"""
    tpl, poses, cam, light = settled
    fp = render_with_poses(tpl, poses, cam, CFG_PALLAS, light)
    fb = render_with_poses(
        tpl, poses, cam, CFG_XLA._replace(tiled=False), light
    )

    inst_p = np.asarray(fp.instance_index)
    inst_b = np.asarray(fb.instance_index)
    assert (inst_b > 0).sum() > 20, "scene unexpectedly empty"
    np.testing.assert_array_equal(inst_p, inst_b)
    np.testing.assert_allclose(
        np.asarray(fp.depth), np.asarray(fb.depth), rtol=1e-5, atol=1e-5
    )


def test_classic_xla_close_to_brute_force(settled):
    tpl, poses, cam, light = settled
    fx = render_with_poses(tpl, poses, cam, CFG_XLA, light)
    fb = render_with_poses(
        tpl, poses, cam, CFG_XLA._replace(tiled=False), light
    )
    mismatch = (np.asarray(fx.instance_index) != np.asarray(fb.instance_index)).mean()
    # the classic path's static capacities may drop a few triangles
    assert mismatch < 0.03, f"instance mismatch fraction {mismatch}"


def test_grad_through_pallas_render(settled):
    tpl, poses, cam, light = settled
    target = render_with_poses(tpl, poses, cam, CFG_PALLAS, light).hdr

    def loss(delta):
        perturbed = jax.vmap(apply_pose_delta_matrix)(poses, delta)
        img = render_with_poses(tpl, perturbed, cam, CFG_PALLAS, light).hdr
        w = jax.lax.stop_gradient(target[..., 3:])
        return jnp.sum(w * (img[..., :3] - target[..., :3]) ** 2)

    delta0 = jnp.zeros((poses.shape[0], 6), jnp.float32).at[:, 5].set(0.02)
    val, g = jax.value_and_grad(loss)(delta0)
    g = np.asarray(g)
    assert np.isfinite(float(val))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0, "gradient is identically zero"


def test_pallas_slab_path_matches_single_pass(settled, monkeypatch):
    """The slabbed fine stage (used when the tile count exceeds
    MAX_TILES_PER_PASS, e.g. 2048^2 shadow maps) is bit-identical to the
    single-pass path."""
    import stillleben_tpu.render.rasterize_tiled as rt

    monkeypatch.setenv("SL_RASTER", "classic")  # slabs are a classic-path
    # mechanism; the compact-cell raster runs one pass at any tile count
    tpl, poses, cam, light = settled
    one = render_with_poses(tpl, poses, cam, CFG_PALLAS, light)
    monkeypatch.setattr(rt, "MAX_TILES_PER_PASS", 2)
    slabbed = render_with_poses(tpl, poses, cam, CFG_PALLAS, light)
    np.testing.assert_array_equal(
        np.asarray(one.instance_index), np.asarray(slabbed.instance_index)
    )
    np.testing.assert_array_equal(
        np.asarray(one.depth), np.asarray(slabbed.depth)
    )


def test_fine_raster_grouped_matches_single():
    """tiles_per_cell>1 (fat-cell grid) agrees bitwise with the 1-tile grid,
    including the padded remainder group and the occupancy-skip path."""
    from stillleben_tpu.ops.fine_raster import FIELDS, fine_raster_pallas

    rng = np.random.default_rng(4)
    n_tiles, n_chunks, C = 11, 2, 64  # 11 % 8 != 0 -> exercises padding
    G = jnp.asarray(rng.normal(size=(n_tiles, n_chunks, FIELDS, C)).astype(np.float32))
    ids = rng.integers(-1, 40, size=(n_tiles, n_chunks, C)).astype(np.int32)
    ids[3] = -1  # fully-masked tile (occupancy skip)
    ids[7, 1] = -1  # fully-masked chunk
    ids = jnp.asarray(ids)
    md = jnp.asarray(rng.random((n_tiles, 16 * 16)).astype(np.float32) * 0.1)

    kw = dict(near=0.1, far=10.0, chunk=C, tw=4, interpret=True)
    w1, t1 = fine_raster_pallas(G, ids, md, **kw)
    for tpg in (4, 8):
        wg, tg = fine_raster_pallas(G, ids, md, tiles_per_cell=tpg, **kw)
        np.testing.assert_array_equal(np.asarray(wg), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(tg), np.asarray(t1))


def test_fine_raster_tpg_through_render(settled, monkeypatch):
    """SL_FINE_TPG plumbs through the full render and matches TPG=1."""
    tpl, poses, cam, light = settled
    monkeypatch.setenv("SL_FINE_TPG", "8")
    a = render_with_poses(tpl, poses, cam, CFG_PALLAS, light)
    monkeypatch.setenv("SL_FINE_TPG", "1")
    b = render_with_poses(tpl, poses, cam, CFG_PALLAS, light)
    np.testing.assert_array_equal(
        np.asarray(a.instance_index), np.asarray(b.instance_index)
    )
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=1)
