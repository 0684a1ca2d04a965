"""Pallas TPU kernel for the contact solver's velocity iterations.

The XLA path (physics/solver.py solve_contacts) runs the 12-iteration
Jacobi/PGS loop as ~40 small HLO ops per iteration — at small scene batches
the substep is op-dispatch-bound, not compute-bound. This kernel holds the
whole loop in VMEM: body velocities, impulse accumulators, the contact
Jacobians and their mass-weighted responses, with the per-contact
gather/scatter expressed as one-hot matmuls on the MXU (contraction over
NC/NB), one launch per solve.

Formulation (classic precomputed-Jacobian PGS): for direction d in
{normal, tangent1, tangent2} of contact c with bodies (a, b):

    J^d_a = [d, r_a x d]            (6,)  velocity-to-scalar row
    H^d_a = [m^-1_a s_a d, s_a I^-1_a (r_a x d)]  (6,) impulse response
    v_d   = J^d_b . V_b - J^d_a . V_a
    V    += mat_b @ (H^d_b dl) - mat_a @ (H^d_a dl)

where V is the stacked (6, NB) [lin; ang] body velocity and s the Jacobi
mass-splitting factor. The update order, stick/slip friction coupling,
accumulator clamps, and per-iteration velocity bound replicate
solve_contacts' loop body exactly (agreement test in tests/test_physics.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    v0_ref,      # (6, NB) stacked [lin; ang]
    dyn_ref,     # (1, NB) f32 1.0 = dynamic body
    mat_a_ref,   # (NB, NC) one-hot f32 (push)
    mat_b_ref,
    matt_a_ref,  # (NC, NB) transposed one-hot (pull)
    matt_b_ref,
    J_a_ref,     # (3, 6, NC) Jacobian rows per direction
    J_b_ref,
    H_a_ref,     # (3, 6, NC) impulse responses per direction
    H_b_ref,
    m_ref,       # (3, NC) effective masses (0 = invalid contact)
    tgt_ref,     # (1, NC) target normal velocity
    mu_d_ref,    # (1, NC) dynamic friction
    mu_s_ref,    # (1, NC) static friction
    acc0_ref,    # (3, NC) warm-start accumulators
    v_out_ref,   # (6, NB)
    acc_out_ref,  # (3, NC)
    *,
    iterations: int,
    relax: float,
    stick_vel2: float,
    max_vel: float,
    max_ang: float,
):
    V0 = v0_ref[...]
    dyn = dyn_ref[...] > 0.5  # (1, NB)
    mat_a = mat_a_ref[...]
    mat_b = mat_b_ref[...]
    matt_a = matt_a_ref[...]
    matt_b = matt_b_ref[...]
    Ja = J_a_ref[...]
    Jb = J_b_ref[...]
    Ha = H_a_ref[...]
    Hb = H_b_ref[...]
    m3 = m_ref[...]
    # Everything below stays RANK-2 ((1, NC) rows, never (NC,)) — Mosaic's
    # vector layouts are 2-D-minimum and 1-D intermediates abort the
    # compiler (layout.h: arr.size() >= layout_rank).
    tgt = tgt_ref[0:1]    # (1, NC)
    mu_d = mu_d_ref[0:1]
    mu_s = mu_s_ref[0:1]
    acc0 = acc0_ref[...]

    dn = (((1,), (0,)), ((), ()))  # contract dim1 of lhs with dim0 of rhs

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    def vel_along(V, d):  # (1, NC) relative velocity along direction d
        Va = dot(V, mat_a)  # (6, NC)
        Vb = dot(V, mat_b)
        return jnp.sum(Jb[d] * Vb - Ja[d] * Va, axis=0, keepdims=True)

    def push(V, d, dl):  # apply scalar impulses dl (1, NC) along direction d
        return (
            V
            + dot(Hb[d] * dl, matt_b)
            - dot(Ha[d] * dl, matt_a)
        )

    def bound(V):
        lin, ang = V[:3], V[3:]
        speed = jnp.sqrt(jnp.sum(lin * lin, axis=0, keepdims=True))
        lin = jnp.where(
            dyn & (speed > max_vel),
            lin * (max_vel / jnp.maximum(speed, 1e-9)),
            lin,
        )
        spin = jnp.sqrt(jnp.sum(ang * ang, axis=0, keepdims=True))
        ang = jnp.where(
            dyn & (spin > max_ang),
            ang * (max_ang / jnp.maximum(spin, 1e-9)),
            ang,
        )
        return jnp.concatenate([lin, ang], axis=0)

    def body(_, carry):
        V, acc_n, acc_t1, acc_t2 = carry

        vn = vel_along(V, 0)
        d_n = relax * (tgt - vn) * m3[0:1]
        new_acc_n = jnp.maximum(acc_n + d_n, 0.0)
        V = push(V, 0, new_acc_n - acc_n)

        # friction from the post-normal velocity; stick/slip two-coefficient
        vt1 = vel_along(V, 1)
        vt2 = vel_along(V, 2)
        slip2 = vt1 * vt1 + vt2 * vt2
        mu = jnp.where(slip2 < stick_vel2, mu_s, mu_d)
        max_f = mu * new_acc_n

        d_t1 = -vt1 * m3[1:2]
        new_acc_t1 = jnp.clip(acc_t1 + d_t1, -max_f, max_f)
        V = push(V, 1, new_acc_t1 - acc_t1)

        vt2 = vel_along(V, 2)
        d_t2 = -vt2 * m3[2:3]
        new_acc_t2 = jnp.clip(acc_t2 + d_t2, -max_f, max_f)
        V = push(V, 2, new_acc_t2 - acc_t2)

        return bound(V), new_acc_n, new_acc_t1, new_acc_t2

    V, acc_n, acc_t1, acc_t2 = jax.lax.fori_loop(
        0, iterations, body, (V0, acc0[0:1], acc0[1:2], acc0[2:3])
    )
    v_out_ref[...] = V
    acc_out_ref[...] = jnp.concatenate([acc_n, acc_t1, acc_t2], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iterations", "relax", "stick_vel2", "max_vel", "max_ang", "interpret"
    ),
)
def velocity_loop_pallas(
    V0: jax.Array,     # (6, NB)
    dyn: jax.Array,    # (1, NB) f32
    mat_a: jax.Array,  # (NB, NC)
    mat_b: jax.Array,
    J_a: jax.Array,    # (3, 6, NC)
    J_b: jax.Array,
    H_a: jax.Array,
    H_b: jax.Array,
    m3: jax.Array,     # (3, NC)
    tgt: jax.Array,    # (1, NC)
    mu_d: jax.Array,
    mu_s: jax.Array,
    acc0: jax.Array,   # (3, NC)
    *,
    iterations: int,
    relax: float,
    stick_vel2: float,
    max_vel: float,
    max_ang: float,
    interpret: bool = False,
):
    kernel = functools.partial(
        _kernel, iterations=iterations, relax=relax, stick_vel2=stick_vel2,
        max_vel=max_vel, max_ang=max_ang,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        in_specs=[vm] * 15,
        out_specs=(vm, vm),
        out_shape=(
            jax.ShapeDtypeStruct(V0.shape, jnp.float32),
            jax.ShapeDtypeStruct(acc0.shape, jnp.float32),
        ),
        interpret=interpret,
    )(
        V0, dyn, mat_a, mat_b,
        jnp.swapaxes(mat_a, 0, 1), jnp.swapaxes(mat_b, 0, 1),
        J_a, J_b, H_a, H_b, m3, tgt, mu_d, mu_s, acc0,
    )
    return out


def _pos_kernel(
    pos0_ref,    # (3, NB)
    quat0_ref,   # (4, NB)
    mat_a_ref,   # (NB, NC)
    mat_b_ref,
    matt_a_ref,  # (NC, NB)
    matt_b_ref,
    n_ref,       # (3, NC) contact normals (zeroed for invalid)
    hp_a_ref,    # (3, NC) position response inv_m*scale*n
    hp_b_ref,
    hth_a_ref,   # (3, NC) rotation response scale*inv_I(r x n)
    hth_b_ref,
    m_ref,       # (1, NC) effective normal mass (0 = invalid)
    depth_ref,   # (1, NC)
    pos_out_ref,
    quat_out_ref,
    *,
    iterations: int,
    slop: float,
    max_step: float,
    gain: float,
):
    pos0 = pos0_ref[...]
    quat0 = quat0_ref[...]
    mat_a = mat_a_ref[...]
    mat_b = mat_b_ref[...]
    matt_a = matt_a_ref[...]
    matt_b = matt_b_ref[...]
    nrm = n_ref[...]
    hp_a = hp_a_ref[...]
    hp_b = hp_b_ref[...]
    hth_a = hth_a_ref[...]
    hth_b = hth_b_ref[...]
    # rank-2 everywhere (see _kernel): (1, NC)/(1, NB) rows, never 1-D
    m_n = m_ref[0:1]      # (1, NC)
    depth = depth_ref[0:1]

    dn = (((1,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    def body(_, carry):
        pos, quat, corrected = carry
        pen = jnp.minimum(jnp.maximum(depth - corrected - slop, 0.0), max_step)
        lam = gain * pen * m_n  # (1, NC); m_n = 0 masks invalid contacts

        dpos = dot(hp_b * lam, matt_b) - dot(hp_a * lam, matt_a)
        dth = dot(hth_b * lam, matt_b) - dot(hth_a * lam, matt_a)

        pos = pos + dpos

        # quat += 0.5 * [0, dth] (x) quat, renormalized — (4, NB) layout
        w, x, y, z = quat[0:1], quat[1:2], quat[2:3], quat[3:4]
        ox, oy, oz = dth[0:1], dth[1:2], dth[2:3]
        dq_w = 0.5 * (-ox * x - oy * y - oz * z)
        dq_x = 0.5 * (ox * w + oy * z - oz * y)
        dq_y = 0.5 * (-ox * z + oy * w + oz * x)
        dq_z = 0.5 * (ox * y - oy * x + oz * w)
        q = jnp.concatenate([w + dq_w, x + dq_x, y + dq_y, z + dq_z], axis=0)
        q = q / jnp.maximum(
            jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True)), 1e-12
        )

        corr_b = jnp.sum(dot(dpos, mat_b) * nrm, axis=0, keepdims=True)
        corr_a = jnp.sum(dot(dpos, mat_a) * nrm, axis=0, keepdims=True)
        corrected = corrected + (corr_b - corr_a)
        return pos, q, corrected

    pos, quat, _ = jax.lax.fori_loop(
        0, iterations, body, (pos0, quat0, jnp.zeros_like(m_n))
    )
    pos_out_ref[...] = pos
    quat_out_ref[...] = quat


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "slop", "max_step", "gain", "interpret"),
)
def position_loop_pallas(
    pos0, quat0, mat_a, mat_b, nrm, hp_a, hp_b, hth_a, hth_b, m_n, depth,
    *, iterations, slop, max_step, gain, interpret=False,
):
    kernel = functools.partial(
        _pos_kernel, iterations=iterations, slop=slop, max_step=max_step,
        gain=gain,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[vm] * 13,
        out_specs=(vm, vm),
        out_shape=(
            jax.ShapeDtypeStruct(pos0.shape, jnp.float32),
            jax.ShapeDtypeStruct(quat0.shape, jnp.float32),
        ),
        interpret=interpret,
    )(
        pos0, quat0, mat_a, mat_b,
        jnp.swapaxes(mat_a, 0, 1), jnp.swapaxes(mat_b, 0, 1),
        nrm, hp_a, hp_b, hth_a, hth_b, m_n, depth,
    )
