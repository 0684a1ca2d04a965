"""Physics data model: padded, static-shape pytrees.

Functionally replaces PhysX rigid dynamics (reference §2.4: convex-mesh
shapes, simulate/fetchResults, contact reporting with separation, overlap
queries, materials, mass properties — src/object.cpp:142-213,
src/scene.cpp:44-173). Everything is fixed-shape so a scene steps inside one
XLA program and batches with ``vmap``/``shard_map``.

Conventions:
- Body pose = pose of the MESH frame (matching Object.pose() semantics).
- Dynamics integrate the center of mass; the COM offset (in mesh frame,
  pretransform included) is carried in ``BodyParams.com``.
- Hull vertices/planes are stored in the mesh frame with the mesh
  pretransform (uniform scale x rigid) baked in — mirroring how the
  reference attaches PxShapes with mesh scale + rigid pretransform local
  pose (src/object.cpp:142-213).
- Static bodies: ``inv_mass = 0``; kinematic flag rides along for parity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m

# Padding budgets (tunable per atlas; defaults match YCB-scale scenes)
MAX_HULL_VERTS = 64
MAX_HULL_PLANES = 64


class HullAtlas(NamedTuple):
    """All convex hulls of all bodies in a scene, padded."""

    verts: jax.Array  # (NH, VH, 3) f32, mesh frame (pretransform baked)
    vert_valid: jax.Array  # (NH, VH) bool
    planes: jax.Array  # (NH, PH, 4) f32: n·x + d <= 0 inside
    plane_valid: jax.Array  # (NH, PH) bool
    hull_body: jax.Array  # (NH,) i32 body index owning each hull
    hull_valid: jax.Array  # (NH,) bool
    center: jax.Array  # (NH, 3) f32 hull centroid (mesh frame)
    radius: jax.Array  # (NH,) f32 bounding radius about centroid

    @property
    def num_hulls(self) -> int:
        return self.verts.shape[0]


class BodyParams(NamedTuple):
    """Per-body static parameters."""

    inv_mass: jax.Array  # (NB,) f32; 0 = static/kinematic
    inv_inertia_body: jax.Array  # (NB, 3, 3) f32 inverse inertia in mesh frame about COM
    com: jax.Array  # (NB, 3) f32 center of mass in mesh frame
    friction: jax.Array  # (NB,) f32 dynamic coefficient (PhysX-average combined)
    restitution: jax.Array  # (NB,) f32
    linear_velocity_limit: jax.Array  # (NB,) f32 (reference Object::setLinearVelocityLimit)
    valid: jax.Array  # (NB,) bool padding mask
    kinematic: jax.Array  # (NB,) bool
    friction_static: jax.Array | None = None  # (NB,) stick coeff; None -> friction


class BodyState(NamedTuple):
    """Per-body dynamic state (the thing lax.scan carries)."""

    pos: jax.Array  # (NB, 3) f32 mesh-frame origin position in world
    quat: jax.Array  # (NB, 4) f32 wxyz
    lin_vel: jax.Array  # (NB, 3) f32 velocity of COM in world
    ang_vel: jax.Array  # (NB, 3) f32 world-frame angular velocity

    def pose_matrix(self) -> jax.Array:
        return m.transform_from_quat_pos(self.quat, self.pos)


class ContactReport(NamedTuple):
    """Per-body contact summary (reference SimulationCallback::onContact
    records min separation per object, src/scene.cpp:73-116)."""

    min_separation: jax.Array  # (NB,) f32 (+inf when no contact)


class SolverConfig(NamedTuple):
    """Hashable (all-static) solver configuration — safe as a jit static arg."""

    gravity: tuple = (0.0, 0.0, -9.81)
    velocity_iterations: int = 12
    position_iterations: int = 4
    # small: position projection handles depenetration; a large Baumgarte
    # bias on top pumps energy into resting contacts (bounce/jitter)
    baumgarte: float = 0.1
    slop: float = 1e-3  # penetration slop
    rest_offset: float = 0.0015  # reference src/object.cpp restOffset
    restitution_threshold: float = 0.2  # m/s below which no bounce
    max_contacts_per_hull_pair: int = 8
    max_depenetration_velocity: float = 0.5  # m/s cap on Baumgarte push-out
    linear_damping: float = 0.0  # 1/s (PhysX default: 0)
    angular_damping: float = 0.05
    relaxation: float = 0.9  # Jacobi under-relaxation factor
    max_velocity: float = 5.0  # m/s global clamp (PhysX maxLinearVelocity)
    max_angular_velocity: float = 20.0  # rad/s
    # contact generation cadence: "substep" (default) regenerates contacts
    # every substep — the reference's PxScene::simulate cadence — and
    # warm-starts impulses BY SLOT across substeps and frames (the
    # narrowphase emits a fixed slot layout, so slot k is the same
    # (hull pair, manifold point) while the pair list is static; top-k
    # pruning reshuffles are rare at rest and stale impulses are bounded by
    # the cone/positivity clamps). "frame" generates once per 25FPS frame
    # with a speculative margin and depth-updates across substeps (~2.6x
    # cheaper narrowphase); "every2" is the midpoint. Since the settle loop
    # began carrying the warm-start accumulators across frames, all three
    # cadences hold dense multi-hull piles at rest; resting-pose
    # distribution parity vs "substep" is measured per cadence by
    # tools/settle_fidelity.py (r5, 24-seed bench template: frame/p128
    # pd_med 0.006 / pd_q90 0.17 — the closest reduced cadence; every2/p128
    # 0.103 / 0.63).
    contact_gen: str = "substep"
    # cached-impulse fraction carried between solves. With CORRECT Tonge
    # mass splitting each contact converges only ~1/n of its impulse per
    # Jacobi iteration, so persistent accumulators are what hold resting
    # piles up: full persistence keeps 5-cube drops and 8-bunny piles at
    # rest (vmax ~0.0) where cold solves sink 2-9 cm and redrop-cascade.
    warm_start: float = 1.0
    stick_velocity: float = 0.05  # m/s slip below which static friction holds
    # broadphase budget: candidate hull pairs kept (by bounding-sphere
    # overlap top-K) ahead of the SAT narrowphase each contact-gen call.
    # The SAT tensors are (K, PH, VH) — this K scales the whole narrowphase.
    # 256 covers dense 10-object piles of decomposed meshes (~100 hulls);
    # raise for many-body scenes.
    max_narrow_pairs: int = 256
    # settle early exit: when > 0, the 100-frame settle loop becomes a
    # while_loop that stops once every valid dynamic body has stayed below
    # the sleep velocity thresholds for this many consecutive frames — the
    # analogue of PhysX putting bodies to sleep (the reference's PxScene
    # sleeps resting bodies with default thresholds too; a fixed 100x4
    # churn over a sleeping pile does no further work there either).
    # Under vmap, lax.while_loop masks converged lanes, so each scene in a
    # batch stops at ITS convergence frame (wall clock gated by the slowest
    # scene). 0 = reference fixed-iteration behavior.
    sleep_frames: int = 0
    sleep_lin_vel: float = 1e-3  # m/s
    sleep_ang_vel: float = 1e-2  # rad/s

    @property
    def gravity_vec(self) -> jax.Array:
        return jnp.asarray(self.gravity, jnp.float32)


def default_config(gravity=(0.0, 0.0, -9.81)) -> SolverConfig:
    return SolverConfig(gravity=tuple(float(g) for g in gravity))


def make_empty_state(num_bodies: int) -> BodyState:
    return BodyState(
        pos=jnp.zeros((num_bodies, 3), jnp.float32),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (num_bodies, 1)),
        lin_vel=jnp.zeros((num_bodies, 3), jnp.float32),
        ang_vel=jnp.zeros((num_bodies, 3), jnp.float32),
    )


def build_hull_atlas(
    hull_lists: list[list[dict]],
    max_hulls: int | None = None,
    max_verts: int | None = None,
    max_planes: int | None = None,
) -> HullAtlas:
    """Pack per-body hull lists (host numpy) into a padded HullAtlas.

    ``hull_lists[b]`` is a list of dicts with keys ``verts`` (V,3) and
    ``planes`` (P,4), already in the body's mesh frame (pretransform baked).

    ``max_verts``/``max_planes`` default to the actual per-atlas maxima
    rounded up to a multiple of 8 (TPU sublane) — the narrowphase SAT
    tensors are (pairs, PH, VH), so padding to a fixed global budget
    (cook-time cap: 64) would multiply their cost by up to 4x for typical
    YCB hulls (~27 verts / ~50 planes).
    """
    entries = []
    for b, hulls in enumerate(hull_lists):
        for h in hulls:
            entries.append((b, np.asarray(h["verts"], np.float32), np.asarray(h["planes"], np.float32)))
    if max_verts is None:
        mv = max((e[1].shape[0] for e in entries), default=8)
        max_verts = min(-(-mv // 8) * 8, MAX_HULL_VERTS)
    if max_planes is None:
        mp = max((e[2].shape[0] for e in entries), default=8)
        max_planes = min(-(-mp // 8) * 8, MAX_HULL_PLANES)
    nh = max_hulls or max(len(entries), 1)
    if len(entries) > nh:
        raise ValueError(f"too many hulls ({len(entries)}) for atlas budget {nh}")

    verts = np.zeros((nh, max_verts, 3), np.float32)
    vvalid = np.zeros((nh, max_verts), bool)
    planes = np.zeros((nh, max_planes, 4), np.float32)
    # padded planes must never report "inside": use n=(0,0,1), d=-inf surrogate
    planes[:, :, 3] = 1e9
    pvalid = np.zeros((nh, max_planes), bool)
    hull_body = np.zeros((nh,), np.int32)
    hvalid = np.zeros((nh,), bool)
    center = np.zeros((nh, 3), np.float32)
    radius = np.zeros((nh,), np.float32)

    for i, (b, v, p) in enumerate(entries):
        if v.shape[0] > max_verts or p.shape[0] > max_planes:
            # a truncated hull is "open" -> SAT gaps misfire -> explosions;
            # cook-time (assets/convex.py) reduces hulls to fit the budget
            raise ValueError(
                f"hull exceeds atlas budget: {v.shape[0]} verts / "
                f"{p.shape[0]} planes (max {max_verts}/{max_planes})"
            )
        nv = min(v.shape[0], max_verts)
        npl = min(p.shape[0], max_planes)
        verts[i, :nv] = v[:nv]
        # pad slots repeat the first vertex so world transforms stay finite
        verts[i, nv:] = v[0] if nv > 0 else 0.0
        vvalid[i, :nv] = True
        planes[i, :npl] = p[:npl]
        pvalid[i, :npl] = True
        hull_body[i] = b
        hvalid[i] = True
        c = v[:nv].mean(axis=0) if nv else np.zeros(3)
        center[i] = c
        radius[i] = float(np.linalg.norm(v[:nv] - c, axis=1).max()) if nv else 0.0

    return HullAtlas(
        verts=jnp.asarray(verts),
        vert_valid=jnp.asarray(vvalid),
        planes=jnp.asarray(planes),
        plane_valid=jnp.asarray(pvalid),
        hull_body=jnp.asarray(hull_body),
        hull_valid=jnp.asarray(hvalid),
        center=jnp.asarray(center),
        radius=jnp.asarray(radius),
    )
