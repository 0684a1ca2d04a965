"""Multi-device scale-out tests on the 8-virtual-CPU-device mesh
(the distributed layer the reference lacks — SURVEY.md §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stillleben_tpu as sl
from stillleben_tpu.parallel.batch import (
    apply_pose_delta_matrix,
    generate_batch,
    generate_batch_sharded,
    make_device_mesh,
    render_with_poses,
    settle_scene,
    template_from_scene,
)
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig


@pytest.fixture(scope="module")
def template():
    scene = sl.Scene((24, 24))
    scene.seed(0)
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    cube.class_index = 1
    for _ in range(3):
        scene.add_object(sl.Object(cube))
    return template_from_scene(scene)


# What this file tests is BATCHING AND SHARDING, not shading: the flat
# tiny-viewport config keeps each test's (fresh, 1-core CI) XLA compile in
# seconds — PBR-path correctness lives in test_render/test_batched_render.
CFG = FrameConfig(
    width=24, height=24, shading="flat", ssao=False, shadow_mode="off",
    max_lights=1, chunk=32, tile_capacity=32, big_capacity=16, fine_chunk=32,
    use_pallas=False, sample_textures=False, sample_stickers=False,
)


def test_generate_batch(template):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    frames = generate_batch(keys, template, CFG, default_config(), 10)
    assert frames.rgb.shape == (4, 24, 24, 4)
    inst = np.asarray(frames.instance_index)
    # every scene shows at least one object
    for b in range(4):
        assert (inst[b] > 0).sum() > 5, f"scene {b} empty"
    # different keys -> different scenes
    assert not np.array_equal(inst[0], inst[1])


def test_generate_batch_sharded_over_mesh(template):
    assert len(jax.devices()) == 8, "conftest should configure 8 CPU devices"
    mesh = make_device_mesh()
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    frames = generate_batch_sharded(
        keys, template, CFG, default_config(), mesh=mesh, settle_iterations=5
    )
    jax.block_until_ready(frames.rgb)
    assert frames.rgb.shape == (8, 24, 24, 4)
    # outputs keep the scene-axis sharding (one scene per device)
    sharding = frames.rgb.sharding
    assert sharding.num_devices == 8 or not hasattr(sharding, "num_devices")
    shard_shapes = {s.data.shape for s in frames.rgb.addressable_shards}
    assert shard_shapes == {(1, 24, 24, 4)}


def test_settle_and_render_with_poses(template):
    poses, cam, light = settle_scene(
        jax.random.PRNGKey(2), template, default_config(), settle_iterations=10
    )
    frame = render_with_poses(template, poses, cam, CFG, light)
    assert (np.asarray(frame.instance_index) > 0).sum() > 5


def test_pose_gradients_through_renderer():
    """jax.grad flows through the full render program to pose deltas.

    Uses spheres (curved normals -> interior shading varies with pose): hard
    rasterization has no silhouette gradients by construction — the reference
    has the same limitation and adds Sobel image gradients on top
    (python/stillleben/diff.py; our `diff` module mirrors that). What
    jax.grad provides natively is the INTERIOR appearance gradient, which
    this test checks against a finite-difference slope.
    """
    scene = sl.Scene((32, 32))
    scene.seed(0)
    sph = sl.Mesh("primitive://sphere")
    sph.scale_to_bbox_diagonal(0.3)
    scene.add_object(sl.Object(sph))
    tpl = template_from_scene(scene)

    # needs real shading (flat gives a constant interior -> zero gradient)
    cfg = CFG._replace(width=32, height=32, shading="pbr")

    poses, cam, light = settle_scene(
        jax.random.PRNGKey(3), tpl, default_config(), settle_iterations=10
    )
    target = render_with_poses(tpl, poses, cam, cfg, light).hdr

    def loss(delta):
        perturbed = jax.vmap(apply_pose_delta_matrix)(poses, delta)
        img = render_with_poses(tpl, perturbed, cam, cfg, light).hdr
        # interior-only: mask out silhouette-adjacent pixels via target alpha
        w = target[..., 3:]
        return jnp.sum(w * (img[..., :3] - target[..., :3]) ** 2)

    # translation along z only (moves shading/scale smoothly)
    delta0 = jnp.zeros((poses.shape[0], 6), jnp.float32).at[:, 5].set(0.02)
    g = jax.grad(loss)(delta0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0, "gradient is identically zero"


def test_hybrid_mesh_2d_sharding(template):
    """2-D hosts x chips hybrid mesh (parallel.distributed): the scene batch
    shards over both axes; single-process it degenerates to (1, 8) but the
    same program covers multi-host DCN x ICI (SURVEY.md §2.9 required
    addition)."""
    from stillleben_tpu.parallel.distributed import (
        initialize,
        local_batch_slice,
        make_hybrid_mesh,
        shard_keys,
    )

    # no coordinator configured -> single-process fallback, no crash
    assert initialize() is False

    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("hosts", "scenes")
    assert mesh.devices.shape == (1, 8)

    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    frames = generate_batch_sharded(
        keys, template, CFG, default_config(), mesh=mesh, settle_iterations=5
    )
    jax.block_until_ready(frames.rgb)
    assert frames.rgb.shape == (16, 24, 24, 4)
    # two scenes per device, sharded over the flattened 2-D mesh
    shard_shapes = {s.data.shape for s in frames.rgb.addressable_shards}
    assert shard_shapes == {(2, 24, 24, 4)}

    # this (only) process owns the whole batch
    assert local_batch_slice(16, mesh) == slice(0, 16)

    # explicit 2-D key placement helper
    k2 = shard_keys(keys, mesh)
    assert {s.data.shape[0] for s in k2.addressable_shards} == {2}


def test_dryrun_train_step_budget():
    """The EXACT train step the driver's dryrun_multichip gate runs, under a
    wall-clock budget, so the gate can't silently rot (it was red in rounds
    1 and 2 — env breakage once, compile blow-up once). Budget covers
    compile + one step on the 8-device CPU mesh."""
    import time

    import __graft_entry__ as g
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    t0 = time.time()
    train_step, tpl, nb = g.make_train_step()
    mesh = Mesh(np.array(jax.devices()), ("scenes",))
    sharding = NamedSharding(mesh, P("scenes"))
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), 8), sharding)
    delta = jax.device_put(jnp.full((8, nb, 6), 0.02, jnp.float32), sharding)
    step = jax.jit(
        train_step,
        in_shardings=(sharding, sharding),
        out_shardings=(NamedSharding(mesh, P()), sharding),
    )
    loss, new_delta = step(keys, delta)
    jax.block_until_ready(new_delta)
    elapsed = time.time() - t0
    assert np.isfinite(float(loss))
    assert {s.data.shape[0] for s in new_delta.addressable_shards} == {1}
    assert elapsed < 120, f"dryrun train step took {elapsed:.0f}s (budget 120s)"


def test_generate_stream_overlap(template, tmp_path):
    """Host-pipelined stream: yields host numpy batches, distinct content
    per batch, works sharded over the mesh, feeds ImageSaver."""
    from stillleben_tpu.parallel.batch import generate_stream

    got = list(
        generate_stream(
            template, CFG, default_config(), batch=4, n_batches=3, seed=5,
            settle_iterations=5, render_sub_batch=2,
        )
    )
    assert len(got) == 3
    insts = [f.instance_index for f in got]
    for inst in insts:
        assert isinstance(inst, np.ndarray) and inst.shape == (4, 24, 24)
        assert (inst > 0).sum() > 5
    assert not np.array_equal(insts[0], insts[1])  # fresh keys per batch

    # sharded variant: scene axis over the 8-device mesh
    mesh = make_device_mesh()
    (frames,) = list(
        generate_stream(
            template, CFG, default_config(), batch=8, n_batches=1, mesh=mesh,
            settle_iterations=5,
        )
    )
    assert frames.rgb.shape == (8, 24, 24, 4)

    # the host side of the pipeline: threaded saver consumes a batch
    with sl.ImageSaver(2) as saver:
        for i, img in enumerate(got[0].rgb):
            saver.save(img, str(tmp_path / f"rgb_{i:04d}.png"))
    assert len(list(tmp_path.glob("rgb_*.png"))) == 4


def test_generate_stream_gt_subset(template):
    """gt_fields reads back only the named planes, narrowed on device: f32
    buffers -> f16, u8/u16 untouched (VERDICT r4 item 6 — readback bytes
    decide steady-state throughput on link-bound rigs)."""
    from stillleben_tpu.parallel.batch import generate_stream

    fields = ("rgb", "instance_index", "class_index", "depth")
    (frames,) = list(
        generate_stream(
            template, CFG, default_config(), batch=2, n_batches=1, seed=5,
            settle_iterations=5, render_sub_batch=2, gt_fields=fields,
        )
    )
    assert set(frames) == set(fields)
    assert frames["rgb"].dtype == np.uint8
    assert frames["instance_index"].dtype == np.uint16
    assert frames["class_index"].dtype == np.uint16
    assert frames["depth"].dtype == np.float16
    assert frames["depth"].shape == (2, 24, 24)
    assert (frames["instance_index"] > 0).sum() > 5

    with pytest.raises(ValueError):
        list(
            generate_stream(
                template, CFG, default_config(), batch=2, n_batches=1,
                gt_fields=("rgb", "nope"),
            )
        )
