"""Image-based lighting: sIBL/.hdr loading + full IBL precompute in JAX.

Parity with the reference LightMap (src/light_map.cpp):
- loads sIBL ``.ibl`` descriptors ([Reflection] REFfile/gamma/multi, plus
  Sun/Light1/Light2 analytic lights with spherical direction extraction,
  light_map.cpp:56-160, 314-346) or a raw equirectangular HDR image,
- GPU-precomputes (here: jitted jnp programs instead of GL shader passes):
  equirect -> 512^2 cubemap (light_map.cpp:394-453), 32^2 cosine irradiance
  convolution (:455-514), 128^2 5-mip GGX prefiltered specular (:516-572),
  split-sum BRDF LUT (:574-602),
- exposes ``light_directions`` / ``light_colors`` for shadow-casting analytic
  lights (include/stillleben/light_map.h:45-49).

Cube faces follow the GL convention (+X, -X, +Y, -Y, +Z, -Z); the equirect
mapping matches cubemap_shader_equirectangular.frag:
uv = (atan2(y, x) * 0.1591 + 0.5, asin(z) * 0.3183 + 0.5).
"""

from __future__ import annotations

import configparser
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CUBE_SIZE = 512
IRRADIANCE_SIZE = 32
PREFILTER_SIZE = 128
PREFILTER_MIPS = 5
BRDF_LUT_SIZE = 256


class LightMapData(NamedTuple):
    """Device arrays consumed by the shader (a pytree)."""

    cubemap: jax.Array  # (6, S, S, 3)
    irradiance: jax.Array  # (6, 32, 32, 3)
    prefilter0: jax.Array  # (6, 128, 128, 3) roughness 0
    prefilter1: jax.Array  # (6, 64, 64, 3)
    prefilter2: jax.Array  # (6, 32, 32, 3)
    prefilter3: jax.Array  # (6, 16, 16, 3)
    prefilter4: jax.Array  # (6, 8, 8, 3)
    # order-2 spherical-harmonic projection of the irradiance map: the
    # cosine convolution leaves almost no energy above SH band 2, so the
    # per-pixel irradiance lookup becomes 9 planar FMAs instead of 4
    # data-dependent cubemap gathers (TPU gathers cost per row).
    irradiance_sh: jax.Array | None = None  # (9, 3)

    def prefilter_mip(self, i: int) -> jax.Array:
        return (self.prefilter0, self.prefilter1, self.prefilter2,
                self.prefilter3, self.prefilter4)[i]


# ---------------------------------------------------------------------------
# Cube-face direction math (GL conventions)
# ---------------------------------------------------------------------------

def face_directions(size: int) -> jnp.ndarray:
    """(6, S, S, 3) unit direction for each cubemap texel."""
    t = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    tv, tu = jnp.meshgrid(t, t, indexing="ij")  # tv = row (t), tu = col (s)
    one = jnp.ones_like(tu)
    faces = [
        jnp.stack([one, -tv, -tu], -1),  # +X
        jnp.stack([-one, -tv, tu], -1),  # -X
        jnp.stack([tu, one, tv], -1),  # +Y
        jnp.stack([tu, -one, -tv], -1),  # -Y
        jnp.stack([tu, -tv, one], -1),  # +Z
        jnp.stack([-tu, -tv, -one], -1),  # -Z
    ]
    d = jnp.stack(faces, 0)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def sample_cubemap(cube: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cubemap sample. cube (6, S, S, 3); dirs (..., 3)."""
    S = cube.shape[1]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)

    # (u, v) per face matching face_directions
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    uu = (u / ma + 1.0) * 0.5 * S - 0.5
    vv = (v / ma + 1.0) * 0.5 * S - 0.5

    u0 = jnp.floor(uu)
    v0 = jnp.floor(vv)
    fu = (uu - u0)[..., None]
    fv = (vv - v0)[..., None]

    def fetch(ui, vi):
        ui = jnp.clip(ui.astype(jnp.int32), 0, S - 1)
        vi = jnp.clip(vi.astype(jnp.int32), 0, S - 1)
        return cube[face, vi, ui]

    c00 = fetch(u0, v0)
    c10 = fetch(u0 + 1, v0)
    c01 = fetch(u0, v0 + 1)
    c11 = fetch(u0 + 1, v0 + 1)
    return (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv


def sample_cubemap_packed(
    flat: jax.Array,  # (sum 6*S_l^2, 3) all mip levels, face-major per level
    offsets: jax.Array,  # (L,) i32 texel offset of each level
    sizes: jax.Array,  # (L,) i32 face edge of each level
    dirs: jax.Array,  # (..., 3)
    level: jax.Array,  # (...) i32 per-pixel mip level
) -> jax.Array:
    """Bilinear sample of ONE mip level per pixel from the packed chain —
    trilinear LOD sampling touches 2 levels (8 row gathers/px total) instead
    of blending every level (4L gathers; the profiler showed the all-level
    blend as a top IBL cost at L=5)."""
    S = sizes[level]
    off = offsets[level]
    Sf = S.astype(jnp.float32)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    uu = (u / ma + 1.0) * 0.5 * Sf - 0.5
    vv = (v / ma + 1.0) * 0.5 * Sf - 0.5
    u0 = jnp.floor(uu)
    v0 = jnp.floor(vv)
    fu = (uu - u0)[..., None]
    fv = (vv - v0)[..., None]
    base = off + face * S * S

    def fetch(ui, vi):
        ui = jnp.clip(ui.astype(jnp.int32), 0, S - 1)
        vi = jnp.clip(vi.astype(jnp.int32), 0, S - 1)
        return flat[base + vi * S + ui]

    c00 = fetch(u0, v0)
    c10 = fetch(u0 + 1, v0)
    c01 = fetch(u0, v0 + 1)
    c11 = fetch(u0 + 1, v0 + 1)
    return (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv


def quad_pack_cube_flat(mips):
    """[(6, S, S, C)] mip list -> (sum 6*S^2, 4C) quad rows: each texel
    carries its CLAMP-neighbor 2x2 quad [c00|c10(+u)|c01(+v)|c11(+uv)] so a
    bilinear cubemap tap is ONE row gather (sample_cubemap_packed_quad).
    Built from constants inside jit — XLA folds it at compile time."""
    rows = []
    for pcube in mips:
        e_u = jnp.concatenate([pcube[:, :, 1:], pcube[:, :, -1:]], axis=2)
        e_v = jnp.concatenate([pcube[:, 1:], pcube[:, -1:]], axis=1)
        e_uv = jnp.concatenate([e_v[:, :, 1:], e_v[:, :, -1:]], axis=2)
        q = jnp.concatenate([pcube, e_u, e_v, e_uv], axis=-1)
        rows.append(q.reshape(-1, q.shape[-1]))
    return jnp.concatenate(rows, axis=0)


def sample_cubemap_packed_quad(
    flat_quad: jax.Array,  # (sum 6*S_l^2, 4C) quad rows (quad_pack_cube_flat)
    offsets: jax.Array,  # (L,) i32 texel offset of each level
    sizes: jax.Array,  # (L,) i32 face edge of each level
    dirs: jax.Array,  # (..., 3)
    level: jax.Array,  # (...) i32 per-pixel mip level
) -> jax.Array:
    """Bilinear sample of ONE mip level per pixel at ONE row gather/px
    (vs 4 in sample_cubemap_packed). Bitwise-identical output: the quad
    rows carry clamp neighbors, and fu/fv are zeroed when u0/v0 < 0 so the
    low-edge double-clamp of the 4-fetch path is reproduced exactly."""
    C = flat_quad.shape[-1] // 4
    S = sizes[level]
    off = offsets[level]
    Sf = S.astype(jnp.float32)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    uu = (u / ma + 1.0) * 0.5 * Sf - 0.5
    vv = (v / ma + 1.0) * 0.5 * Sf - 0.5
    u0 = jnp.floor(uu)
    v0 = jnp.floor(vv)
    fu = jnp.where(u0 < 0, 0.0, uu - u0)[..., None]
    fv = jnp.where(v0 < 0, 0.0, vv - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, S - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, S - 1)
    q = flat_quad[off + face * S * S + v0i * S + u0i]  # (..., 4C)
    c00 = q[..., 0 * C : 1 * C]
    c10 = q[..., 1 * C : 2 * C]
    c01 = q[..., 2 * C : 3 * C]
    c11 = q[..., 3 * C : 4 * C]
    return (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv


def _sample_equirect(img: jax.Array, dirs: jax.Array) -> jax.Array:
    """Reference mapping (cubemap_shader_equirectangular.frag)."""
    Hs, Ws = img.shape[:2]
    u = jnp.arctan2(dirs[..., 1], dirs[..., 0]) * 0.1591 + 0.5
    v = jnp.arcsin(jnp.clip(dirs[..., 2], -1, 1)) * 0.3183 + 0.5
    uu = u * Ws - 0.5
    vv = (1.0 - v) * Hs - 0.5  # image row 0 = top = +z
    u0, v0 = jnp.floor(uu), jnp.floor(vv)
    fu = (uu - u0)[..., None]
    fv = (vv - v0)[..., None]

    def fetch(ui, vi):
        ui = jnp.mod(ui.astype(jnp.int32), Ws)
        vi = jnp.clip(vi.astype(jnp.int32), 0, Hs - 1)
        return img[vi, ui]

    c00, c10 = fetch(u0, v0), fetch(u0 + 1, v0)
    c01, c11 = fetch(u0, v0 + 1), fetch(u0 + 1, v0 + 1)
    return (c00 * (1 - fu) + c10 * fu) * (1 - fv) + (c01 * (1 - fu) + c11 * fu) * fv


# ---------------------------------------------------------------------------
# Precompute passes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("size",))
def equirect_to_cube(img: jax.Array, size: int = CUBE_SIZE) -> jax.Array:
    return _sample_equirect(img, face_directions(size))


def _tangent_frame(N):
    up = jnp.where(
        jnp.abs(N[..., 2:3]) < 0.999,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), N.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), N.shape),
    )
    T = jnp.cross(up, N)
    T = T / jnp.maximum(jnp.linalg.norm(T, axis=-1, keepdims=True), 1e-9)
    B = jnp.cross(N, T)
    return T, B


def sh_basis(d: jax.Array) -> jax.Array:
    """Real SH basis up to order 2 for unit directions d (..., 3) -> (..., 9).
    Standard constants (Ramamoorthi & Hanrahan 2001)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.282095 * one,
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3.0 * z * z - 1.0),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )


@partial(jax.jit, static_argnames=())
def project_irradiance_sh(irr: jax.Array) -> jax.Array:
    """Project a (6, S, S, 3) irradiance cubemap onto SH-2 -> (9, 3) coeffs.
    Texel solid angles from the unnormalized face-grid coordinates."""
    S = irr.shape[1]
    t = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S * 2.0 - 1.0
    tv, tu = jnp.meshgrid(t, t, indexing="ij")
    # d_omega = du dv / (u^2+v^2+1)^(3/2) with du = dv = 2/S (sums to 4 pi)
    dw = (2.0 / S) ** 2 / ((tu * tu + tv * tv + 1.0) ** 1.5)  # (S, S)
    dirs = face_directions(S)  # (6, S, S, 3) unit
    Y = sh_basis(dirs)  # (6, S, S, 9)
    w = jnp.broadcast_to(dw[None], (6, S, S))[..., None]  # (6, S, S, 1)
    return jnp.einsum("fuvk,fuvc->kc", Y * w, irr)


def eval_irradiance_sh(coeffs: jax.Array, n: jax.Array) -> jax.Array:
    """coeffs (9, 3), unit normals n (..., 3) -> irradiance (..., 3)."""
    Y = sh_basis(n)  # (..., 9)
    return jnp.einsum("...k,kc->...c", Y, coeffs)


@partial(jax.jit, static_argnames=("size", "n_phi", "n_theta"))
def irradiance_convolution(
    cube: jax.Array, size: int = IRRADIANCE_SIZE, n_phi: int = 64, n_theta: int = 16
) -> jax.Array:
    """Cosine-weighted hemisphere convolution (learnopengl-derived,
    light_map.cpp:455-514)."""
    N = face_directions(size)  # (6, S, S, 3)
    T, B = _tangent_frame(N)

    phis = jnp.linspace(0, 2 * jnp.pi, n_phi, endpoint=False)
    thetas = (jnp.arange(n_theta, dtype=jnp.float32) + 0.5) * (0.5 * jnp.pi / n_theta)

    def theta_step(acc, theta):
        def phi_step(acc2, phi):
            st, ct = jnp.sin(theta), jnp.cos(theta)
            d = (
                T * (st * jnp.cos(phi))
                + B * (st * jnp.sin(phi))
                + N * ct
            )
            L = sample_cubemap(cube, d)
            return acc2 + L * (ct * st), None

        acc, _ = jax.lax.scan(phi_step, acc, phis)
        return acc, None

    acc, _ = jax.lax.scan(theta_step, jnp.zeros_like(N), thetas)
    return acc * (jnp.pi / (n_phi * n_theta))


def _ggx_importance_dirs(N, roughness, n_samples):
    """Hammersley GGX half-vector importance samples about N."""
    i = np.arange(n_samples)
    # radical inverse (van der Corput)
    bits = i.astype(np.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    xi2 = bits.astype(np.float64) * 2.3283064365386963e-10
    xi1 = i / n_samples
    a = roughness * roughness
    phi = 2 * np.pi * xi1
    cos_t = np.sqrt((1.0 - xi2) / (1.0 + (a * a - 1.0) * xi2))
    sin_t = np.sqrt(np.maximum(1.0 - cos_t**2, 0.0))
    hx = (np.cos(phi) * sin_t).astype(np.float32)
    hy = (np.sin(phi) * sin_t).astype(np.float32)
    hz = cos_t.astype(np.float32)
    return jnp.asarray(np.stack([hx, hy, hz], -1))  # (n, 3) tangent space


@partial(jax.jit, static_argnames=("roughness", "size", "n_samples"))
def _prefilter_mip(cube, roughness: float, size: int, n_samples: int = 256):
    N = face_directions(size)
    T, B = _tangent_frame(N)
    Hs = _ggx_importance_dirs(N, float(roughness), n_samples)  # (n, 3)

    def step(carry, h):
        acc, wacc = carry
        Hv = T * h[0] + B * h[1] + N * h[2]
        # V = N assumption: L = reflect(-N, H) = 2(N.H)H - N
        ndh = (N * Hv).sum(-1, keepdims=True)
        L = 2.0 * ndh * Hv - N
        ndl = jnp.maximum((N * L).sum(-1, keepdims=True), 0.0)
        c = sample_cubemap(cube, L)
        return (acc + c * ndl, wacc + ndl), None

    (acc, wacc), _ = jax.lax.scan(
        step, (jnp.zeros_like(N), jnp.zeros_like(N[..., :1])), Hs
    )
    return acc / jnp.maximum(wacc, 1e-6)


@partial(jax.jit, static_argnames=("size", "n_samples"))
def brdf_lut(size: int = BRDF_LUT_SIZE, n_samples: int = 512) -> jax.Array:
    """Split-sum BRDF integration LUT (x = NoV, y = roughness) -> (A, B)."""
    # frag does texture2D(lut, vec2(NoV, roughness)) -> LUT[row=roughness,
    # col=NoV]
    nov = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    NoVm, Rg = jnp.meshgrid(nov, rough, indexing="xy")  # both (size, size)
    V = jnp.stack([jnp.sqrt(1 - NoVm**2), jnp.zeros_like(NoVm), NoVm], -1)
    N = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), V.shape)

    i = np.arange(n_samples)
    bits = i.astype(np.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    xi2 = jnp.asarray(bits.astype(np.float64) * 2.3283064365386963e-10, jnp.float32)
    xi1 = jnp.asarray(i / n_samples, jnp.float32)

    a = Rg * Rg

    def step(carry, xi):
        A, Bv = carry
        x1, x2 = xi
        phi = 2 * jnp.pi * x1
        cos_t = jnp.sqrt((1.0 - x2) / (1.0 + (a * a - 1.0) * x2))
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        Hv = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], -1)
        vdh = (V * Hv).sum(-1)
        L = 2.0 * vdh[..., None] * Hv - V
        NoL = jnp.maximum(L[..., 2], 0.0)
        NoH = jnp.maximum(Hv[..., 2], 0.0)
        VoH = jnp.maximum(vdh, 0.0)
        k = (Rg * Rg) / 2.0  # IBL k
        G = (NoL / jnp.maximum(NoL * (1 - k) + k, 1e-6)) * (
            NoVm / jnp.maximum(NoVm * (1 - k) + k, 1e-6)
        )
        G_vis = jnp.where(NoL > 0, G * VoH / jnp.maximum(NoH * NoVm, 1e-6), 0.0)
        Fc = (1.0 - VoH) ** 5
        return (A + (1 - Fc) * G_vis, Bv + Fc * G_vis), None

    (A, Bv), _ = jax.lax.scan(
        step, (jnp.zeros_like(NoVm), jnp.zeros_like(NoVm)), (xi1, xi2)
    )
    return jnp.stack([A, Bv], -1) / n_samples


_BRDF_LUT_CACHE: jax.Array | None = None


def get_brdf_lut() -> jax.Array:
    global _BRDF_LUT_CACHE
    if _BRDF_LUT_CACHE is None:
        # the first call may happen inside a jit trace: force eager eval and
        # cache a HOST constant, otherwise the cache would capture a tracer
        # and poison every later trace (UnexpectedTracerError)
        with jax.ensure_compile_time_eval():
            _BRDF_LUT_CACHE = np.asarray(brdf_lut())
    return jnp.asarray(_BRDF_LUT_CACHE)


# ---------------------------------------------------------------------------
# LightMap (host object)
# ---------------------------------------------------------------------------

def _load_hdr_image(path: str) -> np.ndarray:
    """(H, W, 3) float32 linear."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        return arr**2.2
    img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    img = img[..., ::-1]  # BGR -> RGB
    if img.max() > 10.0 and path.lower().endswith((".png", ".jpg", ".jpeg")):
        img = (img / 255.0) ** 2.2
    return np.ascontiguousarray(img)


class LightMap:
    """Load + precompute. The heavy passes run once, jitted."""

    def __init__(self, path: str | None = None):
        self.path = path or ""
        self.light_directions = np.zeros((0, 3), np.float32)
        self.light_colors = np.zeros((0, 3), np.float32)
        self.data: LightMapData | None = None
        if path:
            self.load(path)

    @classmethod
    def from_equirect(cls, equirect, lights=()) -> "LightMap":
        """Build a LightMap from an in-memory (H, W, 3) float equirect panorama
        (no file needed). ``lights``: iterable of (direction, color) pairs for
        the analytic lights an .ibl sidecar would provide."""
        lm = cls()
        lm.path = "<equirect>"
        lm._precompute(np.asarray(equirect, np.float32), list(lights))
        return lm

    def load(self, path: str) -> bool:
        equirect, lights = self._load_source(path)
        self.path = path
        self._precompute(equirect, lights)
        return True

    def _precompute(self, equirect, lights) -> None:
        for d, c in lights:
            self.light_directions = np.concatenate([self.light_directions, d[None]])
            self.light_colors = np.concatenate([self.light_colors, c[None]])

        img = jnp.asarray(equirect)
        cube = equirect_to_cube(img)
        irr = irradiance_convolution(cube)
        mips = []
        for i in range(PREFILTER_MIPS):
            size = PREFILTER_SIZE >> i
            roughness = i / (PREFILTER_MIPS - 1)
            mips.append(_prefilter_mip(cube, roughness, size))
        self.data = LightMapData(
            cubemap=cube,
            irradiance=irr,
            prefilter0=mips[0],
            prefilter1=mips[1],
            prefilter2=mips[2],
            prefilter3=mips[3],
            prefilter4=mips[4],
            irradiance_sh=project_irradiance_sh(irr),
        )

    def _load_source(self, path: str):
        lights = []
        if path.endswith(".ibl"):
            # real sIBL descriptors are hand-authored ini with quirks:
            # UTF-8 BOMs, '%' in values (breaks configparser interpolation),
            # duplicated keys, CRLF — parse leniently
            cp = configparser.ConfigParser(interpolation=None, strict=False)
            with open(path, "r", errors="replace") as f:
                text = f.read().lstrip("﻿")
            cp.read_string(text)
            if "Reflection" not in cp:
                raise ValueError(
                    f"{path}: no [Reflection] section — not an sIBL descriptor"
                )
            base = os.path.dirname(os.path.abspath(path))
            sec = cp["Reflection"]
            file = sec.get("REFfile", "").strip('"')
            gamma = float(sec.get("REFgamma", 1.0))
            multi = float(sec.get("REFmulti", 1.0))
            img = _load_hdr_image(os.path.join(base, file))
            img = multi * (img**gamma)

            def parse_light(section, prefix):
                if section not in cp:
                    return None
                g = cp[section]
                multi = float(g.get(prefix + "multi", 1.0))
                color = np.ones(3, np.float32)
                if prefix + "color" in g:
                    parts = g.get(prefix + "color").split(",")
                    color = np.array([float(p) for p in parts], np.float32) / 255.0
                u = float(g.get(prefix + "u", 0.0))
                v = float(g.get(prefix + "v", 0.0))
                # reference: theta = (u+0.5)*2pi, phi = v*pi (light_map.cpp:314-326)
                theta = (u + 0.5) * 2 * np.pi
                phi = v * np.pi
                pos = np.array(
                    [
                        np.cos(phi) * np.sin(theta),
                        np.sin(phi) * np.sin(theta),
                        np.cos(theta),
                    ],
                    np.float32,
                )
                return -pos, multi * color

            for section, prefix in [("Sun", "SUN"), ("Light1", "LIGHT"), ("Light2", "LIGHT")]:
                res = parse_light(section, prefix)
                if res is not None:
                    lights.append(res)
        else:
            img = _load_hdr_image(path)
        return img.astype(np.float32), lights
