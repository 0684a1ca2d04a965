"""The tabletop arrange-and-settle program (functional, jittable).

Reproduces Scene::simulateTableTopScene (reference src/scene.cpp:612-759):

- a static floor box is added only when ALL objects are dynamic; its top
  surface is z = 0.04 (BOX_HALF_EXTENTS.z); otherwise objects stack from
  z = 0.4 onto the scene's static objects and no floor is added,
- dynamic objects are stacked at increasing z with random orientations:
  z += d/2; pose = (q, z*normal) * translate(-bbox_center); z += d/2,
- 100 outer iterations of one 25 FPS frame each, 4 substeps (dt = 0.01),
- redrop when an object falls below z = -0.5 or stays interpenetrated
  (min separation < -0.01) for more than 0.4 s (10 frames): it is placed at
  x = y = 0 above the highest other object with velocities cleared
  (src/scene.cpp:686-711),
- the whole loop is ONE lax.scan -> ONE XLA program; vmap over scenes for
  batched datagen.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from .contacts import Floor
from .engine import step_fn
from .types import BodyParams, BodyState, HullAtlas, SolverConfig

FLOOR_TOP_Z = 0.04  # reference BOX_HALF_EXTENTS.z (src/scene.cpp:650)
STACK_BASE_STATIC = 0.4  # starting z when static objects exist (src/scene.cpp:634)
FRAME_TIME = 1.0 / 25.0
SUBSTEPS = 4
MAX_ITERATIONS = 100
REDROP_Z = -0.5
STUCK_SEPARATION = -0.01
STUCK_FRAMES = int(0.4 / FRAME_TIME)  # 10


class TabletopGeom(NamedTuple):
    """Per-body host-precomputed quantities the settle loop needs."""

    diameter: jax.Array  # (NB,) bbox diagonal (pretransformed)
    bbox_center: jax.Array  # (NB, 3) bbox center in mesh frame (pretransformed)
    dynamic: jax.Array  # (NB,) bool: participates in stacking/redrop


def stack_objects(
    key: jax.Array, geom: TabletopGeom, base_z: jax.Array, quats: jax.Array | None = None
) -> BodyState:
    """Initial stacked poses with random orientations
    (reference src/scene.cpp:670-679)."""
    nb = geom.diameter.shape[0]
    if quats is None:
        quats = m.random_quaternion(key, (nb,))
    d = jnp.where(geom.dynamic, geom.diameter, 0.0)
    # z_i = base + sum_{j<i} d_j + d_i/2 (cumulative stacking)
    cum = jnp.cumsum(d) - d
    z = base_z + cum + d / 2.0
    center_pos = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
    # pose = (q, pos) * translate(-bbox_center): origin = pos - R @ center
    R = m.quat_to_matrix(quats)
    pos = center_pos - jnp.einsum("bij,bj->bi", R, geom.bbox_center)
    quat = jnp.where(geom.dynamic[:, None], quats, jnp.array([1.0, 0, 0, 0]))
    pos = jnp.where(geom.dynamic[:, None], pos, 0.0)
    return BodyState(
        pos=pos,
        quat=quat,
        lin_vel=jnp.zeros((nb, 3), jnp.float32),
        ang_vel=jnp.zeros((nb, 3), jnp.float32),
    )


def _redrop(state: BodyState, geom: TabletopGeom, which: jax.Array) -> BodyState:
    """Teleport flagged objects above the pile at x = y = 0
    (reference redropObject, src/scene.cpp:686-711)."""
    R = m.quat_to_matrix(state.quat)
    center_world = state.pos + jnp.einsum("bij,bj->bi", R, geom.bbox_center)
    r = geom.diameter / 2.0
    top = jnp.where(geom.dynamic, center_world[..., 2] + r, -jnp.inf)
    # max over OTHERS: exclude self by taking max of top with self masked
    nb = top.shape[0]
    eye = jnp.eye(nb, dtype=bool)
    others_top = jnp.max(jnp.where(eye, -jnp.inf, top[None, :]), axis=1)
    max_z = jnp.maximum(others_top, 0.0)  # reference starts maxZ at 0

    bbox_offset_z = jnp.einsum("bij,bj->bi", R, geom.bbox_center)[..., 2] - r
    new_z = max_z - bbox_offset_z
    new_pos = jnp.stack([jnp.zeros_like(new_z), jnp.zeros_like(new_z), new_z], axis=-1)

    w = which[:, None]
    return BodyState(
        pos=jnp.where(w, new_pos, state.pos),
        quat=state.quat,
        lin_vel=jnp.where(w, 0.0, state.lin_vel),
        ang_vel=jnp.where(w, 0.0, state.ang_vel),
    )


def settle(
    atlas: HullAtlas,
    params: BodyParams,
    state: BodyState,
    floor: Floor,
    pairs: jax.Array,
    geom: TabletopGeom,
    cfg: SolverConfig,
    iterations: int = MAX_ITERATIONS,
    substeps: int = SUBSTEPS,
) -> BodyState:
    """The 100-iteration settle loop with redrop recovery."""
    sub_dt = FRAME_TIME / substeps
    nb = params.inv_mass.shape[0]

    # zero warm-start accumulators shaped like the (static-slot) contact set;
    # slot k is the same (hull pair, manifold point) every narrowphase call,
    # so impulses persist meaningfully across substeps AND frames
    from .engine import gather_contacts

    c0 = gather_contacts(
        atlas, params, state, floor, pairs, max_narrow_pairs=cfg.max_narrow_pairs
    )
    acc0 = (jnp.zeros_like(c0.depth),) * 3

    def frame(carry):
        st, stuck, acc = carry

        if cfg.contact_gen == "frame":
            from .engine import frame_fn

            st, rep, acc = frame_fn(
                atlas, params, st, floor, pairs, FRAME_TIME, substeps, cfg,
                warm=acc,
            )
            min_sep = rep.min_separation
        elif cfg.contact_gen == "every2":
            # half-rate narrowphase: SAT contact gen every 2 substeps, each
            # gen covering a 2-substep TGS block (frame_fn depth-updates the
            # cached manifold within the block). Halves the dominant
            # narrowphase cost vs "substep" while the manifold staleness is
            # bounded to 0.02 s — pile-stability validated by the same
            # tabletop tests as the other cadences.
            from .engine import frame_fn

            if substeps > 1 and substeps % 2 != 0:
                raise ValueError(
                    "contact_gen='every2' needs an even substep count "
                    f"(got {substeps}): odd counts would silently run "
                    "substeps//2*2 coarser substeps"
                )
            n_blocks = max(substeps // 2, 1)
            block_sub = substeps // n_blocks

            def gen_block(c, _):
                s, ms, a = c
                s, rep, a = frame_fn(
                    atlas, params, s, floor, pairs,
                    FRAME_TIME / n_blocks, block_sub, cfg, warm=a,
                )
                return (s, jnp.minimum(ms, rep.min_separation), a), None

            (st, min_sep, acc), _ = jax.lax.scan(
                gen_block,
                (st, jnp.full((nb,), jnp.inf, jnp.float32), acc),
                None, length=n_blocks,
            )
        else:

            def sub(c, _):
                s, min_sep, a = c
                s, rep, a = step_fn(
                    atlas, params, s, floor, pairs, sub_dt, cfg, warm=a
                )
                return (s, jnp.minimum(min_sep, rep.min_separation), a), None

            (st, min_sep, acc), _ = jax.lax.scan(
                sub, (st, jnp.full((nb,), jnp.inf, jnp.float32), acc), None,
                length=substeps,
            )

        fallen = st.pos[..., 2] < REDROP_Z
        interpenetrating = min_sep < STUCK_SEPARATION
        stuck = jnp.where(
            interpenetrating, stuck + 1, jnp.maximum(stuck - 1, 0)
        )
        stuck_too_long = stuck > STUCK_FRAMES
        redrop_mask = (fallen | stuck_too_long) & geom.dynamic & params.valid
        st = _redrop(st, geom, redrop_mask)
        # a teleported body's cached impulses are stale — drop them all
        # (redrops are rare; a few cold solves are cheap)
        any_redrop = redrop_mask.any()
        acc = tuple(jnp.where(any_redrop, 0.0, a) for a in acc)
        stuck = jnp.where(redrop_mask, 0, stuck)
        return st, stuck, acc, any_redrop

    stuck0 = jnp.zeros((nb,), jnp.int32)
    if cfg.sleep_frames <= 0:
        # reference cadence: fixed 100-frame churn (src/scene.cpp:681)
        def scan_body(carry, _):
            st, stuck, acc = carry
            st, stuck, acc, _ = frame((st, stuck, acc))
            return (st, stuck, acc), None

        (state, _, _), _ = jax.lax.scan(
            scan_body, (state, stuck0, acc0), None, length=iterations
        )
        return state

    # Sleep early exit: stop once every valid dynamic body has stayed below
    # the sleep velocity thresholds for cfg.sleep_frames consecutive frames
    # (PhysX puts the reference's bodies to sleep the same way; the rest of
    # the fixed schedule does no work on a sleeping pile). Under vmap the
    # while_loop masks converged lanes, so batched scenes each stop at
    # their own convergence frame.
    watched = geom.dynamic & params.valid

    def cond(carry):
        _, _, _, i, quiet = carry
        return (i < iterations) & (quiet < cfg.sleep_frames)

    def body(carry):
        st, stuck, acc, i, quiet = carry
        st, stuck, acc, any_redrop = frame((st, stuck, acc))
        lin = jnp.linalg.norm(st.lin_vel, axis=-1)
        ang = jnp.linalg.norm(st.ang_vel, axis=-1)
        moving = (lin > cfg.sleep_lin_vel) | (ang > cfg.sleep_ang_vel)
        asleep = ~jnp.any(moving & watched) & ~any_redrop
        quiet = jnp.where(asleep, quiet + 1, 0)
        return st, stuck, acc, i + 1, quiet

    state, _, _, _, _ = jax.lax.while_loop(
        cond, body, (state, stuck0, acc0, jnp.int32(0), jnp.int32(0))
    )
    return state


@partial(jax.jit, static_argnames=("cfg", "iterations", "substeps"))
def simulate_tabletop(
    key: jax.Array,
    atlas: HullAtlas,
    params: BodyParams,
    floor: Floor,
    pairs: jax.Array,
    geom: TabletopGeom,
    cfg: SolverConfig,
    base_z: jax.Array,
    iterations: int = MAX_ITERATIONS,
    substeps: int = SUBSTEPS,
) -> BodyState:
    """stack + settle in one program. ``base_z`` is FLOOR_TOP_Z when a floor
    box was added, STACK_BASE_STATIC otherwise."""
    state = stack_objects(key, geom, base_z)
    return settle(
        atlas, params, state, floor, pairs, geom, cfg, iterations, substeps
    )
