"""Contact generation: convex hull vs floor plane and hull vs hull (SAT).

Replaces PhysX narrowphase for the feature set the reference uses
(convex-mesh shapes only + the tabletop floor box, src/scene.cpp:612-700).
Static shapes throughout: fixed contact budgets with validity masks.

Hull-hull uses separating-axis over the face normals of both hulls (edge-edge
axes omitted — acceptable for settle-style dynamics and cheap on the VPU;
the contact manifold is the deepest vertices of each hull inside the other).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from .types import BodyParams, BodyState, HullAtlas

CONTACTS_PER_FLOOR_HULL = 4
CONTACTS_PER_PAIR = 8  # 4 deepest of B in A + 4 of A in B


def _topk_last(x: jax.Array, k: int):
    """Descending top-k along the last axis via k masked-max rounds.

    Functional twin of ``jax.lax.top_k`` for SMALL k over a short axis
    (contact selection: k<=8 over <=64 hull verts), built from elementwise
    ops + reductions only. lax.top_k's SPMD partition rule ALL-GATHERS the
    batch axes (measured in __graft_entry__._measure_scaling: every settle
    substep of the scenes-sharded dryrun paid a batch all-gather); max/min
    reductions partition trivially, so this keeps the scene axis sharded.
    Ties resolve to the lowest index, matching lax.top_k."""
    n = x.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(cur, axis=-1)
        hit = cur == v[..., None]
        i = jnp.min(jnp.where(hit, iota, n), axis=-1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


class Floor(NamedTuple):
    """Static environment plane z = height with material (the tabletop floor
    box top surface, reference src/scene.cpp:640-668: static/dynamic
    friction 0.5/0.5, restitution 0)."""

    height: jax.Array  # scalar f32
    enabled: jax.Array  # scalar bool
    friction: jax.Array  # scalar f32 (dynamic)
    restitution: jax.Array  # scalar f32
    friction_static: jax.Array  # scalar f32


def make_floor(
    height=0.0, enabled=True, friction=0.5, restitution=0.0, friction_static=None
) -> Floor:
    return Floor(
        height=jnp.asarray(height, jnp.float32),
        enabled=jnp.asarray(enabled, bool),
        friction=jnp.asarray(friction, jnp.float32),
        restitution=jnp.asarray(restitution, jnp.float32),
        friction_static=jnp.asarray(
            friction if friction_static is None else friction_static, jnp.float32
        ),
    )


class Contacts(NamedTuple):
    point: jax.Array  # (NC, 3) world position
    normal: jax.Array  # (NC, 3) unit, from A to B
    depth: jax.Array  # (NC,) penetration depth (>0 overlapping)
    body_a: jax.Array  # (NC,) i32, -1 = static environment
    body_b: jax.Array  # (NC,) i32
    valid: jax.Array  # (NC,) bool
    friction: jax.Array  # (NC,) dynamic (sliding) coefficient
    restitution: jax.Array  # (NC,)
    friction_static: jax.Array  # (NC,) stick coefficient (>= dynamic)


def hull_pairs_host(atlas: HullAtlas) -> np.ndarray:
    """Static candidate pair list (i, j) with different owning bodies.
    Computed host-side once per atlas."""
    hb = np.asarray(atlas.hull_body)
    hv = np.asarray(atlas.hull_valid)
    nh = len(hb)
    pairs = []
    for i in range(nh):
        for j in range(i + 1, nh):
            if hv[i] and hv[j] and hb[i] != hb[j]:
                pairs.append((i, j))
    if not pairs:
        pairs = [(0, 0)]  # placeholder; masked at runtime
    return np.asarray(pairs, np.int32)


def world_hull_verts(atlas: HullAtlas, state: BodyState) -> jax.Array:
    """(NH, VH, 3) hull vertices in world frame."""
    R = m.quat_to_matrix(state.quat[atlas.hull_body])  # (NH,3,3)
    t = state.pos[atlas.hull_body]
    return jnp.einsum("hij,hvj->hvi", R, atlas.verts) + t[:, None, :]


def world_hull_planes(atlas: HullAtlas, state: BodyState) -> jax.Array:
    """(NH, PH, 4) face planes in world frame (n·x + d <= 0 inside)."""
    R = m.quat_to_matrix(state.quat[atlas.hull_body])
    t = state.pos[atlas.hull_body]
    n_world = jnp.einsum("hij,hpj->hpi", R, atlas.planes[..., :3])
    d_world = atlas.planes[..., 3] - jnp.einsum("hpi,hi->hp", n_world, t)
    return jnp.concatenate([n_world, d_world[..., None]], axis=-1)


def floor_contacts(
    atlas: HullAtlas,
    state: BodyState,
    params: BodyParams,
    floor: Floor,
) -> Contacts:
    """Deepest-K vertices of each hull below the floor plane."""
    wv = world_hull_verts(atlas, state)  # (NH, VH, 3)
    sep = wv[..., 2] - floor.height  # (NH, VH) signed distance (+ above)
    sep = jnp.where(atlas.vert_valid, sep, jnp.inf)
    k = CONTACTS_PER_FLOOR_HULL
    neg_sep, idx = _topk_last(-sep, k)  # deepest first
    depth = neg_sep  # (NH, k) penetration (>0 below plane)
    pts = jnp.take_along_axis(wv, idx[..., None], axis=1)  # (NH, k, 3)
    body = atlas.hull_body  # (NH,)

    nh = atlas.num_hulls
    nc = nh * k
    body_b = jnp.repeat(body, k)
    valid = (
        jnp.repeat(atlas.hull_valid, k)
        & (depth.reshape(-1) > -1e9)
        & floor.enabled
        & params.valid[body_b]
        & (params.inv_mass[body_b] > 0)
    )
    # PhysX default combine mode is AVERAGE for both friction and
    # restitution (the reference never changes it)
    fs = params.friction_static if params.friction_static is not None else params.friction
    mu_d = 0.5 * (params.friction[body_b] + floor.friction)
    mu_s = 0.5 * (fs[body_b] + floor.friction_static)
    rest = 0.5 * (params.restitution[body_b] + floor.restitution)
    normal = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (nc, 1))
    return Contacts(
        point=pts.reshape(nc, 3),
        normal=normal,  # floor pushes bodies up; A = environment
        depth=depth.reshape(nc),
        body_a=jnp.full((nc,), -1, jnp.int32),
        body_b=body_b,
        valid=valid,
        friction=mu_d,
        restitution=rest,
        friction_static=mu_s,
    )


def pair_contacts(
    atlas: HullAtlas,
    state: BodyState,
    params: BodyParams,
    pairs: jax.Array,  # (NP, 2) i32 static candidate list
    max_narrow_pairs: int = 1024,
    overlap_margin=0.01,  # speculative margin (traced OK); frame-level
    # contact generation passes a velocity-scaled value to cover the travel
) -> Contacts:
    """SAT face-normal contacts for hull pairs.

    When the static candidate list exceeds ``max_narrow_pairs``, a broadphase
    top-K by bounding-sphere overlap prunes it first — the (K, PH, VH) SAT
    tensors stay bounded no matter how many hulls the scene has (the role of
    PhysX's broadphase ahead of its narrowphase)."""
    wv = world_hull_verts(atlas, state)  # (NH, VH, 3)
    wp = world_hull_planes(atlas, state)  # (NH, PH, 4)
    wc = jnp.einsum(
        "hij,hj->hi", m.quat_to_matrix(state.quat[atlas.hull_body]), atlas.center
    ) + state.pos[atlas.hull_body]

    if pairs.shape[0] > max_narrow_pairs:
        pa, pb = pairs[:, 0], pairs[:, 1]
        d = jnp.linalg.norm(wc[pa] - wc[pb], axis=-1)
        overlap_score = atlas.radius[pa] + atlas.radius[pb] - d
        # stays lax.top_k: k here is ~128 over thousands of pairs, where
        # the k-round masked-max trick is slower; its batch all-gather
        # under scene sharding only triggers when NP > max_narrow_pairs
        _, keep = jax.lax.top_k(overlap_score, max_narrow_pairs)
        pairs = pairs[keep]

    ia, ib = pairs[:, 0], pairs[:, 1]
    # broadphase: bounding spheres
    dist = jnp.linalg.norm(wc[ia] - wc[ib], axis=-1)
    margin = overlap_margin
    near = dist < atlas.radius[ia] + atlas.radius[ib] + margin

    ba = atlas.hull_body[ia]
    bb = atlas.hull_body[ib]
    pair_active = (
        near
        & (ba != bb)  # guards the placeholder self-pair too
        & atlas.hull_valid[ia]
        & atlas.hull_valid[ib]
        & params.valid[ba]
        & params.valid[bb]
        # at least one body dynamic
        & ((params.inv_mass[ba] > 0) | (params.inv_mass[bb] > 0))
    )

    # NOTE: a fused Pallas VMEM SAT kernel (whole per-pair manifold in VMEM)
    # was built and measured in r4; it LOST ~3%% end-to-end on the v5e even
    # paired with the pairs128 broadphase budget (ROADMAP r4) — the XLA SAT
    # below fuses well and the kernel's operand staging cost more than the
    # HBM traffic it saved. Removed per VERDICT r3 item 2.

    # signed distance of B's verts against A's planes: (NP, PH, VH)
    def _face_gaps(planes, plane_valid, verts, vert_valid):
        d = (
            jnp.einsum("nqi,nvi->nqv", planes[..., :3], verts)
            + planes[..., 3][:, :, None]
        )  # (NP, PH, VH)
        # per-plane gap = min over verts (support of other hull against face)
        d_v = jnp.where(vert_valid[:, None, :], d, jnp.inf)
        per_plane_gap = jnp.min(d_v, axis=2)  # (NP, PH)
        per_plane_gap = jnp.where(plane_valid, per_plane_gap, -jnp.inf)
        # per-vert depth inside = max over planes of signed distance
        d_p = jnp.where(plane_valid[:, :, None], d, -jnp.inf)
        per_vert_sd = jnp.max(d_p, axis=1)  # (NP, VH) <0 means inside
        return per_plane_gap, per_vert_sd

    gaps_a, sd_b_in_a = _face_gaps(wp[ia], atlas.plane_valid[ia], wv[ib], atlas.vert_valid[ib])
    gaps_b, sd_a_in_b = _face_gaps(wp[ib], atlas.plane_valid[ib], wv[ia], atlas.vert_valid[ia])

    best_a_gap = jnp.max(gaps_a, axis=1)
    best_a_idx = jnp.argmax(gaps_a, axis=1)
    best_b_gap = jnp.max(gaps_b, axis=1)
    best_b_idx = jnp.argmax(gaps_b, axis=1)

    # third candidate: the centroid axis. Face-normal SAT alone has no good
    # axis for vertex-heavy contacts (sphere-like hull on sphere-like hull);
    # the centroid direction supplies one and prevents wrong deep-penetration
    # normals from blowing up the solver.
    from ..core.math import normalize as _normalize

    d_c = _normalize(wc[ib] - wc[ia])  # (NP, 3) from A to B
    supp_a = jnp.max(
        jnp.where(atlas.vert_valid[ia], jnp.einsum("ni,nvi->nv", d_c, wv[ia]), -jnp.inf),
        axis=1,
    )
    supp_b = jnp.min(
        jnp.where(atlas.vert_valid[ib], jnp.einsum("ni,nvi->nv", d_c, wv[ib]), jnp.inf),
        axis=1,
    )
    gap_c = supp_b - supp_a

    separation = jnp.maximum(jnp.maximum(best_a_gap, best_b_gap), gap_c)  # (NP,)
    use_c = gap_c >= jnp.maximum(best_a_gap, best_b_gap)
    use_a_face = (best_a_gap >= best_b_gap) & ~use_c

    overlapping = separation < margin
    active = pair_active & overlapping

    # Reference-face / incident-hull manifold (standard SAT clipping scheme,
    # vertex-based): the hull whose face is the best separating axis is the
    # reference; the OTHER hull's vertices are measured against that single
    # face plane. This keeps the manifold one-sided and temporally stable.
    p_ref_a = jnp.take_along_axis(wp[ia], best_a_idx[:, None, None], axis=1)[:, 0]  # (NP,4)
    p_ref_b = jnp.take_along_axis(wp[ib], best_b_idx[:, None, None], axis=1)[:, 0]
    # centroid-axis reference plane: orthogonal to d_c at A's support point
    p_ref_c = jnp.concatenate([d_c, -supp_a[:, None]], axis=-1)
    p_ref = jnp.where(
        use_c[:, None], p_ref_c, jnp.where(use_a_face[:, None], p_ref_a, p_ref_b)
    )
    # contact normal, from A to B
    normal = jnp.where(
        use_c[:, None],
        d_c,
        jnp.where(use_a_face[:, None], p_ref_a[:, :3], -p_ref_b[:, :3]),
    )

    ref_is_a = use_a_face | use_c  # reference hull is A; incident is B
    inc_verts = jnp.where(ref_is_a[:, None, None], wv[ib], wv[ia])  # (NP,VH,3)
    inc_valid = jnp.where(ref_is_a[:, None], atlas.vert_valid[ib], atlas.vert_valid[ia])
    # penetration of incident verts along the reference face
    depth_ref = -(
        jnp.einsum("nvi,ni->nv", inc_verts, p_ref[:, :3]) + p_ref[:, 3:4][..., 0][:, None]
    )  # (NP, VH) >0 = behind the reference face
    # lateral containment: the vert must lie within the reference hull's SIDE
    # planes (those nearly perpendicular to the reference normal); depth along
    # the reference face itself may be anything (deep overlap included)
    ref_planes = jnp.where(ref_is_a[:, None, None], wp[ia], wp[ib])  # (NP,PH,4)
    ref_pvalid = jnp.where(ref_is_a[:, None], atlas.plane_valid[ia], atlas.plane_valid[ib])
    is_side = ref_pvalid & (
        jnp.abs(jnp.einsum("npi,ni->np", ref_planes[..., :3], p_ref[:, :3])) < 0.95
    )
    sd_side = (
        jnp.einsum("npi,nvi->npv", ref_planes[..., :3], inc_verts)
        + ref_planes[..., 3][..., None]
    )  # (NP, PH, VH)
    sd_lateral = jnp.max(
        jnp.where(is_side[..., None], sd_side, -jnp.inf), axis=1
    )  # (NP, VH); -inf when the ref hull has no side planes at all
    lateral_ok = sd_lateral <= 0.02  # fixed: manifold containment must not
    # loosen with the speculative margin
    score = jnp.where(inc_valid & lateral_ok, depth_ref, -jnp.inf)
    # fallback: if no vert is laterally contained (e.g. crossing edge-edge
    # configurations), take the deepest verts unfiltered so penetration is
    # still resolved & reported (the reference's redrop heuristic needs
    # separation < -0.01 visible, src/scene.cpp:742-755)
    has_lateral = jnp.any(jnp.isfinite(score), axis=1)
    score = jnp.where(
        has_lateral[:, None], score, jnp.where(inc_valid, depth_ref, -jnp.inf)
    )

    k = CONTACTS_PER_PAIR
    depth, idx = _topk_last(score, k)  # (NP, k)
    pts = jnp.take_along_axis(inc_verts, idx[..., None], axis=1)  # (NP, k, 3)

    np_pairs = pairs.shape[0]
    point = pts.reshape(np_pairs * k, 3)
    depth = depth.reshape(-1)
    normal_full = jnp.repeat(normal, k, axis=0)
    body_a_full = jnp.repeat(ba, k)
    body_b_full = jnp.repeat(bb, k)
    valid = jnp.repeat(active, k) & (depth > -margin) & jnp.isfinite(depth)

    fs = params.friction_static if params.friction_static is not None else params.friction
    mu_d = 0.5 * (params.friction[body_a_full] + params.friction[body_b_full])
    mu_s = 0.5 * (fs[body_a_full] + fs[body_b_full])
    rest = 0.5 * (
        params.restitution[body_a_full] + params.restitution[body_b_full]
    )

    return Contacts(
        point=point,
        normal=normal_full,
        depth=depth,
        body_a=body_a_full,
        body_b=body_b_full,
        valid=valid,
        friction=mu_d,
        restitution=rest,
        friction_static=mu_s,
    )


def concat_contacts(*groups: Contacts) -> Contacts:
    return Contacts(*(jnp.concatenate(fs, axis=0) for fs in zip(*groups)))
