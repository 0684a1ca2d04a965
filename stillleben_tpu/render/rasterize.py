"""Rasterization: geometry transform + chunked homogeneous rasterizer.

Replaces the reference's OpenGL vertex/geometry/fragment pipeline front half
(render_shader.vert + hardware rasterizer). TPU-first design:

- Geometry stage: ALL instanced vertices transformed by dense batched
  matmuls (MXU) in one shot — no per-object uniform churn
  (vs render_pass.cpp:584-622).
- Rasterizer: 2D homogeneous edge functions (Olano & Greer style) — no
  near-plane clipping needed (the 30x30 background plane works even with
  corners behind the camera); perspective-correct barycentrics fall out of
  the edge functions directly (E_k / sum E).
- Static shapes: a lax.scan over fixed-size triangle chunks carries the
  (depth, tri_id, bary) G-buffer; XLA fuses the per-chunk compute with the
  min-reduction.
- Like the reference, NO backface culling (render_pass.cpp:327); facing is
  reported via the signed area for the fragment-side normal flip.

The rasterizer itself is non-differentiable (hard visibility). The shading
stage RE-derives barycentrics differentiably from the selected triangle's
vertex coordinates, so gradients flow to poses/vertices through attribute
interpolation — the jax.grad equivalent of the reference's manual
vertex-index + barycentric chain rule (python/stillleben/diff.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from .atlas import RenderInputs, SceneAtlas


class GeometryBuffers(NamedTuple):
    """Per-instanced-vertex frame data (VI, ...)."""

    obj_coords: jax.Array  # (VI, 3) object-frame coords (mesh_to_obj applied)
    world: jax.Array  # (VI, 3)
    cam: jax.Array  # (VI, 3)
    pix_hom: jax.Array  # (VI, 3) (u*w, v*w, w) pixel-homogeneous
    normal_world: jax.Array  # (VI, 3)
    tangent_world: jax.Array  # (VI, 3)
    bitangent_world: jax.Array  # (VI, 3)
    sticker_uv: jax.Array  # (VI, 2)


class GBuffer(NamedTuple):
    tri_id: jax.Array  # (H, W) i32, -1 = background
    depth: jax.Array  # (H, W) f32 camera-space z (w), +inf = background
    bary: jax.Array  # (H, W, 3) perspective-correct barycentrics
    front_facing: jax.Array  # (H, W) bool


def geometry_stage(
    atlas: SceneAtlas, inputs: RenderInputs, width: int, height: int
) -> GeometryBuffers:
    """Transform all instanced vertices (reference render_shader.vert)."""
    o = atlas.vert_obj
    M_mo = inputs.mesh_to_obj[o]  # (VI,4,4)
    M_ow = inputs.obj_to_world[o]
    world_to_cam = m.invert_rigid(inputs.cam_pose)

    pos = atlas.positions
    obj_coords = (
        jnp.einsum("vij,vj->vi", M_mo[:, :3, :3], pos, precision="highest")
        + M_mo[:, :3, 3]
    )
    world = (
        jnp.einsum("vij,vj->vi", M_ow[:, :3, :3], obj_coords, precision="highest")
        + M_ow[:, :3, 3]
    )
    cam = (
        jnp.einsum("ij,vj->vi", world_to_cam[:3, :3], world, precision="highest")
        + world_to_cam[:3, 3]
    )
    P = inputs.projection
    clip = (
        jnp.einsum("ij,vj->vi", P[:3], jnp.concatenate([cam, jnp.ones_like(cam[:, :1])], -1),
                   precision="highest")
    )  # (VI, 3): x_c, y_c, z_c;  w == cam z
    w = cam[:, 2]
    # pixel-homogeneous: ((x_ndc+1)/2*W * w, (y_ndc+1)/2*H * w, w)
    px = (clip[:, 0] + w) * (width / 2.0)
    py = (clip[:, 1] + w) * (height / 2.0)
    pix_hom = jnp.stack([px, py, w], axis=-1)

    # normal matrices: rotation part (uniform scale cancels after normalize)
    N_ow = M_ow[:, :3, :3]
    N_mo = M_mo[:, :3, :3]
    nrm_obj = jnp.einsum("vij,vj->vi", N_mo, atlas.normals)
    normal_world = m.normalize(jnp.einsum("vij,vj->vi", N_ow, nrm_obj))
    tan_obj = jnp.einsum("vij,vj->vi", N_mo, atlas.tangents[:, :3])
    tangent_world = m.normalize(jnp.einsum("vij,vj->vi", N_ow, tan_obj))
    bitangent_world = (
        m.normalize(jnp.cross(normal_world, tangent_world)) * atlas.tangents[:, 3:4]
    )

    # sticker frame (reference render_shader.vert:90-94)
    sp = inputs.sticker_vp[o]
    st4 = jnp.einsum(
        "vij,vj->vi", sp, jnp.concatenate([obj_coords, jnp.ones_like(obj_coords[:, :1])], -1)
    )
    st = st4[:, :2] / jnp.where(jnp.abs(st4[:, 3:4]) < 1e-9, 1e-9, st4[:, 3:4])
    rng = inputs.sticker_range[o]
    sticker_uv = (st - rng[:, :2]) / jnp.where(jnp.abs(rng[:, 2:]) < 1e-9, 1e9, rng[:, 2:])

    return GeometryBuffers(
        obj_coords=obj_coords,
        world=world,
        cam=cam,
        pix_hom=pix_hom,
        normal_world=normal_world,
        tangent_world=tangent_world,
        bitangent_world=bitangent_world,
        sticker_uv=sticker_uv,
    )


def _pad_to_multiple(x: jax.Array, mult: int, fill) -> jax.Array:
    n = x.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return x
    pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def rasterize(
    geom: GeometryBuffers,
    atlas: SceneAtlas,
    inputs: RenderInputs,
    width: int,
    height: int,
    near: float = 0.1,
    far: float = 10.0,
    chunk: int = 256,
    min_depth: jax.Array | None = None,
) -> GBuffer:
    """Chunked z-buffer rasterization -> G-buffer.

    ``min_depth`` (H, W): depth-peeling input — fragments with
    w <= min_depth + 1e-5 are discarded (reference
    render_shader.frag:227-233, render_pass.cpp:462-466).
    """
    faces = atlas.faces
    F = faces.shape[0]
    v = geom.pix_hom[faces]  # (F, 3, 3)
    tri_visible = inputs.obj_visible[atlas.face_obj]

    v = _pad_to_multiple(v, chunk, 0.0)
    tri_visible = _pad_to_multiple(tri_visible, chunk, False)
    Fp = v.shape[0]
    n_chunks = Fp // chunk

    v = v.reshape(n_chunks, chunk, 3, 3)
    tri_visible = tri_visible.reshape(n_chunks, chunk)

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5

    inf = jnp.float32(jnp.inf)
    init = (
        jnp.full((height, width), inf, jnp.float32),  # depth
        jnp.full((height, width), -1, jnp.int32),  # tri id
        jnp.zeros((height, width, 3), jnp.float32),  # bary
        jnp.zeros((height, width), bool),  # front facing
    )
    if min_depth is None:
        min_depth = jnp.zeros((height, width), jnp.float32)

    def chunk_step(carry, xs_chunk):
        best_w, best_tri, best_bary, best_front = carry
        vc, vis, base_idx = xs_chunk  # (C,3,3), (C,), ()

        # edge lines L_k = cross of the other two vertices (C, 3, 3)
        L0 = jnp.cross(vc[:, 1], vc[:, 2])
        L1 = jnp.cross(vc[:, 2], vc[:, 0])
        L2 = jnp.cross(vc[:, 0], vc[:, 1])
        L = jnp.stack([L0, L1, L2], axis=1)  # (C, 3edges, 3coef)

        # E_k(x, y) = a x + b y + c  -> (C, 3, H, W)
        E = (
            L[:, :, 0, None, None] * xs[None, None, None, :]
            + L[:, :, 1, None, None] * ys[None, None, :, None]
            + L[:, :, 2, None, None]
        )
        all_pos = jnp.all(E >= 0, axis=1)
        all_neg = jnp.all(E <= 0, axis=1)
        inside = all_pos | all_neg  # (C, H, W)

        Esum = E.sum(axis=1)  # (C, H, W)
        denom = jnp.where(jnp.abs(Esum) < 1e-20, 1.0, Esum)
        bary = E / denom[:, None]  # perspective-correct barycentrics
        # interpolated camera-space depth w(p) = sum_k bary_k * w_k
        wp = (bary * vc[:, :, 2][:, :, None, None]).sum(axis=1)

        ok = (
            inside
            & (jnp.abs(Esum) > 1e-20)
            & (wp > near)
            & (wp <= far)
            & (wp > min_depth[None] + 1e-5)
            & vis[:, None, None]
        )
        score = jnp.where(ok, wp, inf)
        ci = jnp.argmin(score, axis=0)  # (H, W)
        cw = jnp.take_along_axis(score, ci[None], axis=0)[0]
        cb = jnp.take_along_axis(bary, ci[None, None].repeat(3, 1), axis=0)[0]
        cb = jnp.moveaxis(cb, 0, -1)  # (H, W, 3)
        # front-facing: CCW-wound (GL outward) faces seen from the front have
        # negative edge-sum in our y-down pixel space (validated on the cube
        # fixture: visible faces then satisfy dot(N, V) > 0)
        cfront = jnp.take_along_axis(Esum < 0, ci[None], axis=0)[0]

        better = cw < best_w
        best_bary = jnp.where(better[..., None], cb, best_bary)
        best_tri = jnp.where(better, base_idx + ci, best_tri)
        best_front = jnp.where(better, cfront, best_front)
        best_w = jnp.where(better, cw, best_w)
        return (best_w, best_tri, best_bary, best_front), None

    base_indices = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (depth, tri_id, bary, front), _ = jax.lax.scan(
        chunk_step, init, (v, tri_visible, base_indices)
    )
    # Hard visibility is non-differentiable by design: gradients reach
    # geometry through the shading stage's differentiable barycentric
    # recomputation instead (see module docstring). stop_gradient here keeps
    # the backward graph free of the rasterization scan entirely.
    return jax.lax.stop_gradient(
        GBuffer(tri_id=tri_id, depth=depth, bary=bary, front_facing=front)
    )
