"""Velocity-level sequential-impulse contact solver (mass-splitting Jacobi).

Replaces the PhysX solver for the reference's workload (drop-and-settle
tabletop scenes, src/scene.cpp:612-759: 4 substeps of dt=0.01 per 25FPS
frame, solver iteration counts (4,4) per body, src/object.cpp:142-213).

TPU-first design: all contacts are solved simultaneously each iteration
(Jacobi) with per-body impulse averaging ("mass splitting") for stability —
a Gauss-Seidel sweep would serialize on the VPU. Baumgarte stabilization +
penetration slop gives PhysX-like resting behavior at dt=0.01; restitution
uses pre-solve normal velocities (Newton's impact law with a threshold).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from .contacts import Contacts
from .types import BodyParams, BodyState, ContactReport, SolverConfig


class _Kin(NamedTuple):
    r_a: jax.Array  # (NC,3) contact offset from COM of A (0 for environment)
    r_b: jax.Array
    inv_m_a: jax.Array  # (NC,)
    inv_m_b: jax.Array
    inv_I_a: jax.Array  # (NC,3,3) world-frame inverse inertia
    inv_I_b: jax.Array
    split_a: jax.Array  # (NC,) Jacobi mass-splitting contact count of body A
    split_b: jax.Array
    mat_a: jax.Array  # (NB, NC) masked one-hot: contact c touches body b as A
    mat_b: jax.Array  # (NB, NC)


def _world_inv_inertia(params: BodyParams, state: BodyState) -> jax.Array:
    """(NB,3,3) I^-1 in world frame = R I_body^-1 R^T."""
    R = m.quat_to_matrix(state.quat)
    return jnp.einsum("bij,bjk,blk->bil", R, params.inv_inertia_body, R)


def _com_world(params: BodyParams, state: BodyState) -> jax.Array:
    R = m.quat_to_matrix(state.quat)
    return state.pos + jnp.einsum("bij,bj->bi", R, params.com)


def contact_matrices(contacts: Contacts, nb: int):
    """(NB, NC) masked one-hot endpoint matrices.

    TPU-first segment-sum: per-contact gathers become ``mat.T @ per_body``
    and per-body accumulation becomes ``mat @ per_contact`` — tiny MXU
    matmuls instead of row-cost scatter/gathers (the round-1 solver spent
    most of each substep in ~60 per-contact scatter-adds)."""
    ar = jnp.arange(nb, dtype=jnp.int32)
    va = contacts.valid & (contacts.body_a >= 0)
    vb = contacts.valid & (contacts.body_b >= 0)
    mat_a = ((contacts.body_a[None, :] == ar[:, None]) & va[None, :]).astype(
        jnp.float32
    )
    mat_b = ((contacts.body_b[None, :] == ar[:, None]) & vb[None, :]).astype(
        jnp.float32
    )
    return mat_a, mat_b


def _pull(mat: jax.Array, per_body: jax.Array) -> jax.Array:
    """(NB, NC).T @ (NB, ...) -> per-contact values (0 for env/invalid)."""
    flat = per_body.reshape(per_body.shape[0], -1)
    out = jnp.einsum("bc,bk->ck", mat, flat, preferred_element_type=jnp.float32)
    return out.reshape((mat.shape[1],) + per_body.shape[1:])


def _push(mat: jax.Array, per_contact: jax.Array) -> jax.Array:
    """(NB, NC) @ (NC, ...) -> per-body accumulation."""
    flat = per_contact.reshape(per_contact.shape[0], -1)
    out = jnp.einsum("bc,ck->bk", mat, flat, preferred_element_type=jnp.float32)
    return out.reshape((mat.shape[0],) + per_contact.shape[1:])


def _build_kinematics(
    contacts: Contacts, params: BodyParams, state: BodyState
) -> _Kin:
    com = _com_world(params, state)
    inv_I = _world_inv_inertia(params, state)
    nb = params.inv_mass.shape[0]
    mat_a, mat_b = contact_matrices(contacts, nb)

    inv_m_a = _pull(mat_a, params.inv_mass)
    inv_m_b = _pull(mat_b, params.inv_mass)
    inv_I_a = _pull(mat_a, inv_I)
    inv_I_b = _pull(mat_b, inv_I)
    va = mat_a.sum(axis=0) > 0  # (NC,) contact has a real body A
    vb = mat_b.sum(axis=0) > 0
    r_a = jnp.where(va[:, None], contacts.point - _pull(mat_a, com), 0.0)
    r_b = jnp.where(vb[:, None], contacts.point - _pull(mat_b, com), 0.0)

    # Mass splitting (Tonge et al.): each contact solves against a body
    # SPLIT n ways — the split copy is n-fold LIGHTER, so its effective
    # inverse mass is n * m^-1 and the per-contact impulse shrinks n-fold;
    # updates then apply the FULL inverse mass. (The inverted form —
    # heavier copies in the effective mass, diluted updates — makes n
    # same-direction contacts overshoot n-fold in the simultaneous Jacobi
    # step: a 100-contact bunny pile boiled at the velocity clamps.)
    count = jnp.maximum(mat_a.sum(axis=1) + mat_b.sum(axis=1), 1.0)
    split_a = _pull(mat_a, count)
    split_b = _pull(mat_b, count)
    return _Kin(
        r_a, r_b, inv_m_a, inv_m_b, inv_I_a, inv_I_b, split_a, split_b,
        mat_a, mat_b,
    )


def _rel_velocity(
    contacts: Contacts, kin: _Kin, lin: jax.Array, ang: jax.Array
) -> jax.Array:
    """(NC,3) velocity of B relative to A at the contact point."""
    v_a = _pull(kin.mat_a, lin) + jnp.cross(_pull(kin.mat_a, ang), kin.r_a)
    v_b = _pull(kin.mat_b, lin) + jnp.cross(_pull(kin.mat_b, ang), kin.r_b)
    return v_b - v_a


def _apply_impulse(
    contacts: Contacts,
    kin: _Kin,
    lin: jax.Array,
    ang: jax.Array,
    impulse: jax.Array,  # (NC,3) applied +P to B, -P to A
):
    P = jnp.where(contacts.valid[:, None], impulse, 0.0)

    # full (unsplit) inverse masses here; the splitting lives ONLY in the
    # effective mass so each contact's impulse is pre-shrunk n-fold
    dv_b = kin.inv_m_b[:, None] * P
    dw_b = jnp.einsum("cij,cj->ci", kin.inv_I_b, jnp.cross(kin.r_b, P))
    dv_a = kin.inv_m_a[:, None] * P
    dw_a = jnp.einsum("cij,cj->ci", kin.inv_I_a, jnp.cross(kin.r_a, P))

    lin = lin + _push(kin.mat_b, dv_b) - _push(kin.mat_a, dv_a)
    ang = ang + _push(kin.mat_b, dw_b) - _push(kin.mat_a, dw_a)
    return lin, ang


def _effective_mass(contacts: Contacts, kin: _Kin, dirs: jax.Array) -> jax.Array:
    """(NC,) effective mass along direction `dirs` (NC,3) of the SPLIT body
    copies (n-fold lighter => n-fold larger k => n-fold smaller impulses),
    which is what keeps the simultaneous Jacobi update contractive."""
    ra_x_d = jnp.cross(kin.r_a, dirs)
    rb_x_d = jnp.cross(kin.r_b, dirs)
    k = (
        kin.inv_m_a * kin.split_a
        + kin.inv_m_b * kin.split_b
        + jnp.einsum("ci,cij,cj->c", ra_x_d, kin.inv_I_a, ra_x_d) * kin.split_a
        + jnp.einsum("ci,cij,cj->c", rb_x_d, kin.inv_I_b, rb_x_d) * kin.split_b
    )
    return 1.0 / jnp.maximum(k, 1e-9)


def _tangent_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two unit tangents orthogonal to n, branch-free."""
    ref = jnp.where(
        (jnp.abs(n[..., 2:3]) < 0.9),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve_contacts(
    contacts: Contacts,
    params: BodyParams,
    state: BodyState,
    dt: jax.Array,
    cfg: SolverConfig,
    warm=None,  # optional (acc_n, acc_t1, acc_t2) from the previous substep
) -> tuple[BodyState, ContactReport, tuple]:
    """Run velocity iterations; returns (velocities, report, accumulators).

    With ``warm`` (same contact set, previous substep's accumulated
    impulses), the cached impulses are applied up front scaled by
    cfg.warm_start and the accumulators start there — the standard warm
    start that lets fewer Jacobi iterations reach the same resting quality
    (PhysX does the same across its internal steps)."""
    kin = _build_kinematics(contacts, params, state)
    n = contacts.normal
    t1, t2 = _tangent_basis(n)

    # invalid contacts have zero pulled masses -> 1/eps blowups; mask them
    ok = contacts.valid
    m_n = jnp.where(ok, _effective_mass(contacts, kin, n), 0.0)
    m_t1 = jnp.where(ok, _effective_mass(contacts, kin, t1), 0.0)
    m_t2 = jnp.where(ok, _effective_mass(contacts, kin, t2), 0.0)

    # restitution target from pre-solve velocity (Newton impact law)
    v0 = _rel_velocity(contacts, kin, state.lin_vel, state.ang_vel)
    vn0 = jnp.einsum("ci,ci->c", v0, n)
    bounce = jnp.where(
        vn0 < -cfg.restitution_threshold, -contacts.restitution * vn0, 0.0
    )

    # Speculative contacts (the role of PhysX's eENABLE_SPECULATIVE_CCD,
    # reference src/object.cpp:142-213): a separated contact (depth < 0) only
    # limits the approach speed to gap/dt (no tunneling, free fall otherwise);
    # an overlapping contact gets Baumgarte push-out + restitution.
    pen = jnp.maximum(contacts.depth - cfg.slop + cfg.rest_offset, 0.0)
    # cap the depenetration velocity (PhysX maxDepenetrationVelocity-style):
    # wrong deep-penetration measurements must not inject unbounded energy
    bias = jnp.minimum((cfg.baumgarte / dt) * pen, cfg.max_depenetration_velocity)
    gap = jnp.minimum(contacts.depth + cfg.rest_offset, 0.0)  # <= 0 when separated
    # separated: approach limited to gap/dt. Restitution applies only when the
    # contact actually impacts within this substep (vn0 <= gap/dt), otherwise
    # a speculative contact would brake/bounce bodies in mid-air.
    impacting = vn0 <= gap / dt
    separated_target = jnp.where(
        impacting & (bounce > 0.0), jnp.maximum(gap / dt, bounce), gap / dt
    )
    target_vn = jnp.where(gap < 0.0, separated_target, jnp.maximum(bounce, bias))
    # invalid slots carry -inf depth sentinels (top-k fill): their -inf
    # targets times a zero effective mass make NaN accumulators that poison
    # every body through the segment-sum matmuls (0 * inf)
    target_vn = jnp.where(ok, target_vn, 0.0)

    # under-relaxation keeps the Jacobi iteration contractive for
    # strongly-coupled contact piles
    relax = cfg.relaxation

    # in-loop velocity clamp: Jacobi on a dense multi-hull pile (hundreds of
    # coupled contacts per body) can diverge oscillating — without a bound
    # INSIDE the loop, velocities overflow f32 within one solve (observed
    # ang_vel 1e14 after 12 iterations on a 3-bunny stack). Matches PhysX's
    # maxLinearVelocity/maxAngularVelocity which also bound solver output.
    dyn = ((params.inv_mass > 0) & params.valid)[:, None]

    def _bound(lin, ang):
        speed = jnp.linalg.norm(lin, axis=-1, keepdims=True)
        lin = jnp.where(
            dyn & (speed > cfg.max_velocity),
            lin * (cfg.max_velocity / jnp.maximum(speed, 1e-9)),
            lin,
        )
        spin = jnp.linalg.norm(ang, axis=-1, keepdims=True)
        ang = jnp.where(
            dyn & (spin > cfg.max_angular_velocity),
            ang * (cfg.max_angular_velocity / jnp.maximum(spin, 1e-9)),
            ang,
        )
        return lin, ang

    def body_fn(_, carry):
        lin, ang, acc_n, acc_t1, acc_t2 = carry
        v = _rel_velocity(contacts, kin, lin, ang)
        vn = jnp.einsum("ci,ci->c", v, n)

        d_n = relax * (target_vn - vn) * m_n
        new_acc_n = jnp.maximum(acc_n + d_n, 0.0)
        d_n = new_acc_n - acc_n

        lin, ang = _apply_impulse(contacts, kin, lin, ang, d_n[:, None] * n)

        # friction (uses updated velocities). Stick/slip: a near-sticking
        # contact holds with the STATIC coefficient, a sliding one with the
        # dynamic — PhysX's two-coefficient material model
        # (reference createMaterial(staticF, dynamicF, restitution)).
        v = _rel_velocity(contacts, kin, lin, ang)
        slip2 = (
            jnp.einsum("ci,ci->c", v, t1) ** 2 + jnp.einsum("ci,ci->c", v, t2) ** 2
        )
        mu = jnp.where(
            slip2 < cfg.stick_velocity**2, contacts.friction_static, contacts.friction
        )
        max_f = mu * new_acc_n
        vt1 = jnp.einsum("ci,ci->c", v, t1)
        d_t1 = -vt1 * m_t1  # tangential: full step (drift hurts more than
        # overshoot; the clamp to the friction cone bounds it)
        new_acc_t1 = jnp.clip(acc_t1 + d_t1, -max_f, max_f)
        d_t1 = new_acc_t1 - acc_t1
        lin, ang = _apply_impulse(contacts, kin, lin, ang, d_t1[:, None] * t1)

        v = _rel_velocity(contacts, kin, lin, ang)
        vt2 = jnp.einsum("ci,ci->c", v, t2)
        d_t2 = -vt2 * m_t2
        new_acc_t2 = jnp.clip(acc_t2 + d_t2, -max_f, max_f)
        d_t2 = new_acc_t2 - acc_t2
        lin, ang = _apply_impulse(contacts, kin, lin, ang, d_t2[:, None] * t2)

        lin, ang = _bound(lin, ang)
        return lin, ang, new_acc_n, new_acc_t1, new_acc_t2

    zeros = jnp.zeros_like(m_n)
    lin0, ang0 = state.lin_vel, state.ang_vel
    if warm is not None:
        w = cfg.warm_start
        wn = jnp.maximum(warm[0] * w, 0.0)
        max_f = contacts.friction * wn
        wt1 = jnp.clip(warm[1] * w, -max_f, max_f)
        wt2 = jnp.clip(warm[2] * w, -max_f, max_f)
        P0 = wn[:, None] * n + wt1[:, None] * t1 + wt2[:, None] * t2
        lin0, ang0 = _apply_impulse(contacts, kin, lin0, ang0, P0)
        lin0, ang0 = _bound(lin0, ang0)
        init_acc = (wn, wt1, wt2)
    else:
        init_acc = (zeros, zeros, zeros)

    # NOTE: a fused Pallas VMEM velocity loop was built and measured in r4
    # (one launch for all iterations); it LOST 2% end-to-end on the v5e —
    # XLA already fuses the Jacobi iteration body well and the kernel's
    # operand relayout cost more than the launches it saved (ROADMAP r4).
    lin, ang, acc_n, acc_t1, acc_t2 = jax.lax.fori_loop(
        0,
        cfg.velocity_iterations,
        body_fn,
        (lin0, ang0) + init_acc,
    )

    # per-body min separation (reference records it for the redrop heuristic)
    sep = jnp.where(contacts.valid, -contacts.depth, jnp.inf)
    touches = (kin.mat_a + kin.mat_b) > 0  # (NB, NC)
    min_sep = jnp.min(jnp.where(touches, sep[None, :], jnp.inf), axis=1)

    new_state = BodyState(
        pos=state.pos, quat=state.quat, lin_vel=lin, ang_vel=ang
    )
    return new_state, ContactReport(min_separation=min_sep), (acc_n, acc_t1, acc_t2)


def position_correction(
    contacts: Contacts,
    params: BodyParams,
    state: BodyState,
    cfg: SolverConfig,
) -> BodyState:
    """Nonlinear Gauss-Seidel-style positional projection (Jacobi variant):
    removes residual penetration left by the velocity solve without adding
    kinetic energy (PhysX's position iterations, src/object.cpp solver
    iteration counts (4,4))."""
    kin = _build_kinematics(contacts, params, state)
    n = contacts.normal
    m_n = jnp.where(contacts.valid, _effective_mass(contacts, kin, n), 0.0)

    def body_fn(_, carry):
        pos, quat, corrected = carry
        # capped: an incorrectly-measured deep penetration must not teleport
        # bodies (max ~2mm per iteration)
        pen = jnp.minimum(
            jnp.maximum(contacts.depth - corrected - cfg.slop, 0.0), 2.5e-3
        )
        lam = 0.8 * pen * m_n  # positional "impulse" magnitude
        lam = jnp.where(contacts.valid, lam, 0.0)
        P = lam[:, None] * n

        dp_b = kin.inv_m_b[:, None] * P
        dth_b = jnp.einsum("cij,cj->ci", kin.inv_I_b, jnp.cross(kin.r_b, P))
        dp_a = kin.inv_m_a[:, None] * P
        dth_a = jnp.einsum("cij,cj->ci", kin.inv_I_a, jnp.cross(kin.r_a, P))

        dpos = _push(kin.mat_b, dp_b) - _push(kin.mat_a, dp_a)
        dth = _push(kin.mat_b, dth_b) - _push(kin.mat_a, dth_a)

        pos = pos + dpos
        dq = 0.5 * m.quat_multiply(
            jnp.concatenate([jnp.zeros_like(dth[..., :1]), dth], axis=-1), quat
        )
        quat = m.quat_normalize(quat + dq)

        # track correction applied along each contact normal
        corr_b = jnp.einsum("ci,ci->c", _pull(kin.mat_b, dpos), n)
        corr_a = jnp.einsum("ci,ci->c", _pull(kin.mat_a, dpos), n)
        corrected = corrected + (corr_b - corr_a)
        return pos, quat, corrected

    zeros = jnp.zeros_like(m_n)
    pos, quat, _ = jax.lax.fori_loop(
        0, cfg.position_iterations, body_fn, (state.pos, state.quat, zeros)
    )
    return state._replace(pos=pos, quat=quat)
