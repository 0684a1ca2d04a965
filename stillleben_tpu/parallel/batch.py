"""Batched datagen: vmap over scenes, shard_map/pjit over chips.

The reference's only batching facility is a thread pool running one PhysX
scene per thread (JobQueue, src/job_queue.cpp:30-144). Here the scene axis
is a tensor axis: one scene template (shared geometry atlases), N scenes =
N random keys, `vmap` for the batch, `jax.sharding` over a device mesh for
scale-out — collectives ride ICI; no NCCL/MPI analogue is needed because the
arrays are already distributed.

Pipeline per scene (all in ONE XLA program):
  key -> stack objects (random quats) -> settle (100x4 substeps, redrop)
      -> random camera fit -> random light -> render -> full GT buffers
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..physics import tabletop as tt
from ..physics.contacts import Floor
from ..physics.types import BodyParams, HullAtlas, SolverConfig
from ..render.atlas import RenderInputs, SceneAtlas
from ..render.frame import FrameConfig, RenderedFrame, render_frame_core
from ..scene.camera_fit import choose_random_camera_pose, choose_random_light_direction


class SceneTemplate(NamedTuple):
    """Everything static shared by all scenes in a batch."""

    hull_atlas: HullAtlas
    body_params: BodyParams
    pairs: jax.Array
    tabletop_geom: tt.TabletopGeom
    floor: Floor
    render_atlas: SceneAtlas
    base_inputs: RenderInputs  # camera/lights/materials template
    bbox_corners: jax.Array  # (NB, 8, 3) mesh-frame bbox corners (pretransformed)
    base_z: jax.Array  # scalar
    light_map: object = None  # LightMapData pytree or None (IBL for all scenes)


def template_from_scene(scene) -> SceneTemplate:
    """Build a SceneTemplate from a host Scene (objects added; background
    plane + IBL light map carried over, matching the reference ycb.py flow)."""
    import numpy as np

    from ..render.atlas import build_scene_atlas, render_inputs_from_scene

    atlas, params, pairs, geom = scene._compile()
    floor = scene._default_floor(enabled=all(not o.static for o in scene.objects))
    bg_plane = None
    if np.any(scene.background_plane_size):
        tex = scene.background_plane_texture
        bg_plane = {
            "size": scene.background_plane_size,
            "texture": tex.pixels if tex is not None else None,
        }
    render_atlas = build_scene_atlas(scene.objects, background_plane=bg_plane)
    base_inputs = render_inputs_from_scene(scene, render_atlas)
    light_map = scene.light_map.data if scene.light_map is not None else None

    corners = np.zeros((max(len(scene.objects), 1), 8, 3), np.float32)
    for i, o in enumerate(scene.objects):
        corners[i] = o.mesh.bbox.corners()
    base_z = tt.FLOOR_TOP_Z if all(not o.static for o in scene.objects) else tt.STACK_BASE_STATIC
    return SceneTemplate(
        hull_atlas=atlas,
        body_params=params,
        pairs=pairs,
        tabletop_geom=geom,
        floor=floor,
        render_atlas=render_atlas,
        base_inputs=base_inputs,
        bbox_corners=jnp.asarray(corners),
        base_z=jnp.float32(base_z),
        light_map=light_map,
    )


def generate_one(
    key: jax.Array,
    tpl: SceneTemplate,
    cfg: FrameConfig,
    solver_cfg: SolverConfig,
    settle_iterations: int = tt.MAX_ITERATIONS,
) -> RenderedFrame:
    """One scene: settle + camera + light + render (jit/vmap-able)."""
    k_stack, k_cam, k_light = jax.random.split(key, 3)

    state = tt.stack_objects(k_stack, tpl.tabletop_geom, tpl.base_z)
    state = tt.settle(
        tpl.hull_atlas, tpl.body_params, state, tpl.floor, tpl.pairs,
        tpl.tabletop_geom, solver_cfg, iterations=settle_iterations,
    )

    poses = state.pose_matrix()  # (NB_phys, 4, 4)
    nb_render = tpl.base_inputs.obj_to_world.shape[0]
    obj_to_world = tpl.base_inputs.obj_to_world.at[: poses.shape[0]].set(
        poses[:nb_render]
    )

    # camera fit over settled bbox corners (world space)
    n_phys = tpl.bbox_corners.shape[0]
    world_corners = (
        jnp.einsum(
            "bij,bcj->bci", obj_to_world[:n_phys, :3, :3], tpl.bbox_corners
        )
        + obj_to_world[:n_phys, None, :3, 3]
    ).reshape(-1, 3)
    valid = jnp.ones(world_corners.shape[0], bool)
    cam_pose = choose_random_camera_pose(
        k_cam, tpl.base_inputs.projection, world_corners, valid
    )
    light_dir = choose_random_light_direction(k_light, cam_pose)
    light_dirs = tpl.base_inputs.light_directions.at[0].set(light_dir)

    inputs = tpl.base_inputs._replace(
        obj_to_world=obj_to_world,
        cam_pose=cam_pose,
        light_directions=light_dirs,
    )
    return render_frame_core(tpl.render_atlas, inputs, cfg, light_map=tpl.light_map)


def _generate_batch_impl(
    keys: jax.Array,  # (B, 2) PRNG keys
    tpl: SceneTemplate,
    cfg: FrameConfig,
    solver_cfg: SolverConfig,
    settle_iterations: int = tt.MAX_ITERATIONS,
    render_sub_batch: int = 8,
) -> RenderedFrame:
    """vmap over the scene axis; shard `keys` over a device mesh to scale out
    (outputs inherit the sharding — each chip keeps its own scenes).

    Physics settles the WHOLE batch at once (tiny state, latency-bound —
    batching amortizes kernel launches), while rendering streams through
    ``lax.map`` sub-batches so the rasterizer's per-chunk edge tensors stay
    inside HBM."""
    poses, cams, lights = jax.vmap(
        lambda k: settle_scene(k, tpl, solver_cfg, settle_iterations)
    )(keys)

    def render_chunklet(pcl):
        p, c, l = pcl
        return jax.vmap(lambda pi, ci, li: render_with_poses(tpl, pi, ci, cfg, li))(
            p, c, l
        )

    B = keys.shape[0]
    sub = min(render_sub_batch, B)
    pad = (-B) % sub
    if pad:
        padder = lambda x: jnp.concatenate([x, x[:pad]], axis=0)
        poses, cams, lights = padder(poses), padder(cams), padder(lights)
    n_groups = poses.shape[0] // sub
    grouped = jax.tree.map(
        lambda x: x.reshape((n_groups, sub) + x.shape[1:]), (poses, cams, lights)
    )
    frames = jax.lax.map(render_chunklet, grouped)
    frames = jax.tree.map(
        lambda x: x.reshape((n_groups * sub,) + x.shape[2:])[:B], frames
    )
    return frames


generate_batch = partial(
    jax.jit,
    static_argnames=("cfg", "solver_cfg", "settle_iterations", "render_sub_batch"),
)(_generate_batch_impl)


def settle_scene(
    key: jax.Array,
    tpl: SceneTemplate,
    solver_cfg: SolverConfig,
    settle_iterations: int = tt.MAX_ITERATIONS,
):
    """Settle only: returns (poses (NB,4,4), cam_pose (4,4), light_dir (3,))."""
    k_stack, k_cam, k_light = jax.random.split(key, 3)
    state = tt.stack_objects(k_stack, tpl.tabletop_geom, tpl.base_z)
    state = tt.settle(
        tpl.hull_atlas, tpl.body_params, state, tpl.floor, tpl.pairs,
        tpl.tabletop_geom, solver_cfg, iterations=settle_iterations,
    )
    poses = state.pose_matrix()
    n_phys = tpl.bbox_corners.shape[0]
    world_corners = (
        jnp.einsum("bij,bcj->bci", poses[:n_phys, :3, :3], tpl.bbox_corners)
        + poses[:n_phys, None, :3, 3]
    ).reshape(-1, 3)
    cam_pose = choose_random_camera_pose(
        k_cam, tpl.base_inputs.projection,
        world_corners, jnp.ones(world_corners.shape[0], bool),
    )
    light_dir = choose_random_light_direction(k_light, cam_pose)
    return poses, cam_pose, light_dir


def render_with_poses(
    tpl: SceneTemplate,
    poses: jax.Array,  # (NB_phys, 4, 4) — differentiable input
    cam_pose: jax.Array,
    cfg: FrameConfig,
    light_dir: jax.Array | None = None,
) -> RenderedFrame:
    """Render the template at the given poses — the differentiable hook for
    render-and-compare pose refinement (gradients flow pose -> image)."""
    nb_render = tpl.base_inputs.obj_to_world.shape[0]
    obj_to_world = tpl.base_inputs.obj_to_world.at[: poses.shape[0]].set(
        poses[:nb_render]
    )
    inputs = tpl.base_inputs._replace(obj_to_world=obj_to_world, cam_pose=cam_pose)
    if light_dir is not None:
        inputs = inputs._replace(
            light_directions=inputs.light_directions.at[0].set(light_dir)
        )
    return render_frame_core(tpl.render_atlas, inputs, cfg, light_map=tpl.light_map)


def apply_pose_delta_matrix(pose: jax.Array, delta: jax.Array) -> jax.Array:
    """pose @ (I + [delta]) with so(3)+translation generators — the batched
    local linearization used by the reference's diff module
    (python/stillleben/diff.py:525-590)."""
    a, b, g, x, y, z = (delta[..., i] for i in range(6))
    zeros = jnp.zeros_like(a)
    D = jnp.stack(
        [
            jnp.stack([zeros, -g, b, x], -1),
            jnp.stack([g, zeros, -a, y], -1),
            jnp.stack([-b, a, zeros, z], -1),
            jnp.stack([zeros, zeros, zeros, zeros], -1),
        ],
        -2,
    )
    return pose @ (jnp.eye(4, dtype=pose.dtype) + D)


def make_device_mesh(axis: str = "scenes"):
    """1-D device mesh over all available devices."""
    import numpy as np

    devices = np.array(jax.devices())
    return jax.sharding.Mesh(devices, (axis,))


def generate_batch_sharded(
    keys: jax.Array,
    tpl: SceneTemplate,
    cfg: FrameConfig,
    solver_cfg: SolverConfig,
    mesh: "jax.sharding.Mesh | None" = None,
    settle_iterations: int = tt.MAX_ITERATIONS,
) -> RenderedFrame:
    """Scale-out entry: scene batch sharded over ALL mesh axes (works for a
    1-D chip mesh and for the 2-D hosts x chips hybrid mesh from
    parallel.distributed.make_hybrid_mesh — the scene axis is embarrassingly
    parallel, so splitting it across DCN and ICI alike is free). Outputs keep
    the scene-axis sharding (each chip holds only its own scenes); zero
    collectives are issued — the TPU answer to the reference's JobQueue
    thread pool."""

    if mesh is None:
        mesh = make_device_mesh()
    from .distributed import shard_keys

    B = keys.shape[0]
    D = int(mesh.devices.size)
    pad = (-B) % D  # shard_map needs an even split; excess scenes are real
    # work (fresh keys), trimmed off the sharded output below
    if pad:
        extra = jax.vmap(lambda k: jax.random.fold_in(k, 977))(keys[:pad])
        keys = jnp.concatenate([keys, extra], axis=0)
    keys = shard_keys(keys, mesh)
    out = _sharded_batch_fn(mesh)(
        keys, tpl, cfg, solver_cfg, settle_iterations=settle_iterations
    )
    if pad:
        out = jax.tree.map(lambda x: x[:B], out)
    return out


@lru_cache(maxsize=8)
def _sharded_batch_fn(mesh):
    """The batch pipeline under ``shard_map``: each device runs the WHOLE
    settle+render pipeline on its local scene slice, so per-device code is
    identical to the single-chip program and the compiled module contains
    ZERO collectives (asserted by __graft_entry__._measure_scaling).

    The earlier jit+out_shardings formulation let the SPMD partitioner
    propagate shardings through the render sub-batch ``lax.map``, whose
    (n_groups, sub, ...) reshape crosses device boundaries — every map step
    all-gathered the sliced poses/cameras. shard_map makes the scene split
    explicit instead of inferred, which is the whole point of the axis
    being embarrassingly parallel."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = P(mesh.axis_names)
    ns = NamedSharding(mesh, axes)

    def run(keys, tpl, cfg, solver_cfg, settle_iterations, render_sub_batch=8):
        local = jax.shard_map(
            lambda k, t: _generate_batch_impl(
                k, t, cfg, solver_cfg,
                settle_iterations=settle_iterations,
                render_sub_batch=render_sub_batch,
            ),
            mesh=mesh, in_specs=(axes, P()), out_specs=axes, check_vma=False,
        )
        return local(keys, tpl)

    return jax.jit(
        run,
        static_argnames=("cfg", "solver_cfg", "settle_iterations", "render_sub_batch"),
        out_shardings=ns,
    )


def generate_stream(
    tpl: SceneTemplate,
    cfg: FrameConfig,
    solver_cfg: SolverConfig,
    *,
    batch: int,
    n_batches: int | None = None,
    seed: int = 0,
    mesh: "jax.sharding.Mesh | None" = None,
    render_sub_batch: int = 8,
    settle_iterations: int = tt.MAX_ITERATIONS,
    prefetch: int = 2,
    gt_fields: "tuple[str, ...] | None" = None,
):
    """Host-pipelined datagen stream: yields HOST (numpy) RenderedFrame
    batches while the device renders ahead.

    The reference's production loop is render -> readback -> ImageSaver per
    scene (examples/ycb.py:34-84 with the threaded saver of
    src/image_saver.cpp); its GPU idles during every readback/encode. Here
    up to ``prefetch`` batches are dispatched ahead (JAX dispatch is async),
    so the device computes batch k+1..k+prefetch while the host fetches and
    consumes batch k — steady-state throughput is max(device, host) rather
    than their sum.

    ``gt_fields``: names of RenderedFrame fields to read back (None = the
    full frame). When set, each yielded batch is a dict of numpy arrays and
    wide f32 GT planes are narrowed ON DEVICE before readback (depth and
    other float buffers -> f16, rgb stays u8, index maps stay u16) — the
    full f32 set is ~20 MB/scene at 640x480 while
    ("rgb", "instance_index", "class_index", "depth") is ~3 MB, which is
    what decides throughput whenever the host link, not the chip, is the
    bottleneck (a training consumer typically needs exactly that subset).

    ``n_batches=None`` streams forever (the caller breaks). With ``mesh``
    the scene axis is sharded over the mesh (generate_batch_sharded);
    fetching then gathers each chip's scenes to host.
    """
    import itertools
    from collections import deque

    import numpy as np

    narrow = None
    if gt_fields is not None:
        bad = set(gt_fields) - set(RenderedFrame._fields)
        if bad:
            raise ValueError(f"unknown gt_fields {sorted(bad)}")

        @jax.jit
        def narrow(frames):
            out = {}
            for f in gt_fields:
                x = getattr(frames, f)
                if x.dtype == jnp.float32:
                    x = x.astype(jnp.float16)
                out[f] = x
            return out

    def _fetch(frames):
        return jax.tree.map(np.asarray, frames)

    key = jax.random.PRNGKey(seed)
    counter = range(n_batches) if n_batches is not None else itertools.count()
    pending: deque = deque()
    for _ in counter:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        if mesh is not None:
            out = generate_batch_sharded(
                keys, tpl, cfg, solver_cfg, mesh=mesh,
                settle_iterations=settle_iterations,
            )
        else:
            out = generate_batch(
                keys, tpl, cfg, solver_cfg,
                settle_iterations=settle_iterations,
                render_sub_batch=render_sub_batch,
            )
        if narrow is not None:
            out = narrow(out)
        pending.append(out)
        if len(pending) > prefetch:
            yield _fetch(pending.popleft())
    while pending:
        yield _fetch(pending.popleft())
