"""SSAO: 64-sample view-space hemisphere occlusion + bilateral blur apply.

Reference: ssao_shader.frag:13-57 (radius 0.1, bias 0.0025, 64 samples with
4x4 tiled rotation noise) and ssao_apply_shader.frag:35-81 (depth-aware
bilateral blur, sharpness 300, multiplied into RGB). Quality-only effect;
ground-truth buffers are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RADIUS = 0.1
BIAS = 0.0025
N_SAMPLES = 64
SHARPNESS = 300.0


def _make_kernel() -> np.ndarray:
    """Hemisphere samples like learnopengl's (deterministic here)."""
    rng = np.random.default_rng(1234)
    samples = []
    for i in range(N_SAMPLES):
        v = rng.uniform([-1, -1, 0], [1, 1, 1])
        v = v / max(np.linalg.norm(v), 1e-9)
        v *= rng.uniform(0, 1)
        scale = i / N_SAMPLES
        v *= 0.1 + 0.9 * scale * scale  # bias toward center
        samples.append(v)
    return np.asarray(samples, np.float32)


# numpy on purpose: a module-level jnp constant would capture a TRACER
# when this module is first imported inside a jit trace (lazy import)
_KERNEL = _make_kernel()


def _noise_rotation(H: int, W: int) -> jax.Array:
    """4x4 tiled random rotation vectors (xy plane)."""
    rng = np.random.default_rng(99)
    n = rng.uniform(-1, 1, size=(4, 4, 2)).astype(np.float32)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    tiled = np.tile(n, (H // 4 + 1, W // 4 + 1, 1))[:H, :W]
    return jnp.asarray(tiled)  # called inside traces; constant-folds per trace


def compute_ssao(
    cam_coords: jax.Array,  # (H, W, 4) view-space position (w unused)
    normals_cam: jax.Array,  # (H, W, 4) view-space normal in xyz
    valid: jax.Array,  # (H, W)
    projection: jax.Array,  # (4, 4)
    width: int,
    height: int,
) -> jax.Array:
    """(H, W) ambient occlusion in [0, 1] (1 = unoccluded).

    Planar (channel-plane) layout like the shading core — every per-pixel
    quantity is an (H, W) plane so the VPU's full lane width applies — and
    ONE flat gather per hemisphere sample: depth and validity are packed into
    a single value (invalid pixels carry -inf), halving the 64-sample loop's
    gather count."""
    H, W = valid.shape
    P = jnp.moveaxis(cam_coords[..., :3], -1, 0)  # (3, H, W)
    N = jnp.moveaxis(normals_cam[..., :3], -1, 0)

    noise = jnp.moveaxis(_noise_rotation(H, W), -1, 0)  # (2, H, W)
    rdotn = noise[0] * N[0] + noise[1] * N[1]
    T = jnp.stack([noise[0], noise[1], jnp.zeros((H, W))]) - N * rdotn
    tn = jnp.sqrt(T[0] ** 2 + T[1] ** 2 + T[2] ** 2)
    T = T / jnp.maximum(tn, 1e-9)
    B = jnp.cross(N, T, axis=0)

    depth = P[2]
    # depth+validity packed into one gather: invalid pixels read as +inf,
    # which both fails the occlusion compare and zeroes the range check
    depth_v = jnp.where(valid, depth, jnp.inf).reshape(-1)
    fx = projection[0, 0] * W / 2
    fy = projection[1, 1] * H / 2
    cx = (projection[0, 2] + 1) * W / 2
    cy = (projection[1, 2] + 1) * H / 2

    occlusion = jnp.zeros((H, W), jnp.float32)
    for i in range(N_SAMPLES):
        k = _KERNEL[i]
        sx = T[0] * k[0] + B[0] * k[1] + N[0] * k[2]
        sy = T[1] * k[0] + B[1] * k[1] + N[1] * k[2]
        sz = T[2] * k[0] + B[2] * k[1] + N[2] * k[2]
        px = P[0] + sx * RADIUS
        py = P[1] + sy * RADIUS
        pz = P[2] + sz * RADIUS
        z = jnp.maximum(pz, 1e-4)
        u = jnp.clip((fx * px / z + cx).astype(jnp.int32), 0, W - 1)
        v = jnp.clip((fy * py / z + cy).astype(jnp.int32), 0, H - 1)
        sample_depth = depth_v[v * W + u]  # +inf where the G-buffer is empty
        range_check = jnp.clip(
            RADIUS / jnp.maximum(jnp.abs(depth - sample_depth), 1e-6), 0, 1
        )
        occluded = sample_depth <= pz - BIAS  # False when sample_depth = inf
        occlusion = occlusion + occluded.astype(jnp.float32) * range_check
    ao = 1.0 - occlusion / N_SAMPLES
    return jnp.where(valid, ao, 1.0)


N_DIRS = 8
RING_RADII = (2, 4, 8, 16, 28)  # px; reference world radius 0.1 m spans
# ~40 px at typical bench depths (fx ~ 600, z ~ 1.5)


def compute_ssao_fast(
    cam_coords: jax.Array,
    normals_cam: jax.Array,
    valid: jax.Array,
    projection: jax.Array,
    width: int,
    height: int,
) -> jax.Array:
    """Static-tap screen-space AO: 40 ring taps read via jnp.roll.

    The reference SSAO's 64 hemisphere samples need a data-dependent gather
    per sample (19.6M gathers at 640x480 — ~200 ms/scene on v5e, gathers run
    ~60-100M/s). Reformulated with STATIC screen offsets the taps become
    jnp.roll reads (pure vectorized shifts) plus a tangent-plane horizon
    test: a tap occludes when its depth is in front of the center's tangent
    plane (normal-corrected — flat surfaces self-occlude nowhere), range-
    checked like the reference (ssao_shader.frag:44-52). The hemisphere
    radius becomes depth-dependent instead of fixed-world — a documented
    deviation; `ssao_mode="reference"` keeps the exact sampler."""
    H, W = valid.shape
    d = jnp.where(valid, cam_coords[..., 2], jnp.inf)
    N = jnp.moveaxis(normals_cam[..., :3], -1, 0)

    fx = projection[0, 0] * W / 2
    fy = projection[1, 1] * H / 2
    # tangent-plane depth slopes per screen pixel step (clamped at grazing)
    nz = jnp.where(jnp.abs(N[2]) < 0.1, jnp.sign(N[2]) * 0.1 + 1e-9, N[2])
    dz_du = jnp.clip(-N[0] / nz * d / fx, -0.05, 0.05)
    dz_dv = jnp.clip(-N[1] / nz * d / fy, -0.05, 0.05)

    Xi = jnp.arange(W, dtype=jnp.int32)[None, :]
    Yi = jnp.arange(H, dtype=jnp.int32)[:, None]

    occ = jnp.zeros((H, W), jnp.float32)
    wsum = 0.0
    for k in range(N_DIRS):
        ang = 2.0 * np.pi * (k + 0.5) / N_DIRS
        ca, sa = np.cos(ang), np.sin(ang)
        for r in RING_RADII:
            dx = int(round(r * ca))
            dy = int(round(r * sa))
            if dx == 0 and dy == 0:
                continue
            ds = jnp.roll(d, (-dy, -dx), axis=(0, 1))
            in_img = (
                (Xi + dx >= 0) & (Xi + dx < W) & (Yi + dy >= 0) & (Yi + dy < H)
            )
            d_exp = d + dz_du * dx + dz_dv * dy
            occluded = in_img & (d_exp - ds > BIAS) & jnp.isfinite(ds)
            rng = jnp.clip(RADIUS / jnp.maximum(jnp.abs(d - ds), 1e-6), 0.0, 1.0)
            w = 1.0 / (1.0 + 0.08 * r)  # center-biased like the reference kernel
            occ = occ + occluded.astype(jnp.float32) * rng * w
            wsum += w
    ao = 1.0 - occ / wsum
    return jnp.where(valid, ao, 1.0)


def bilateral_blur(ao: jax.Array, depth: jax.Array, ksize: int = 2) -> jax.Array:
    """Depth-aware box blur (reference ssao_apply_shader.frag:35-81)."""
    H, W = ao.shape
    acc = jnp.zeros_like(ao)
    wacc = jnp.zeros_like(ao)
    for dy in range(-ksize, ksize + 1):
        for dx in range(-ksize, ksize + 1):
            shifted_ao = jnp.roll(ao, (dy, dx), axis=(0, 1))
            shifted_d = jnp.roll(depth, (dy, dx), axis=(0, 1))
            w = jnp.exp(-SHARPNESS * jnp.abs(shifted_d - depth))
            acc = acc + shifted_ao * w
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-9)


def ssao_apply(hdr, cam_coordinates, normals, valid, projection, mode="fast"):
    """Compute AO from the G-buffer and multiply into RGB. Uses the
    cam-space normal stored in the normals GT buffer. ``mode``: "fast"
    (static ring taps, default) | "reference" (exact 64-sample hemisphere)."""
    H, W = valid.shape
    fn = compute_ssao_fast if mode == "fast" else compute_ssao
    ao = fn(cam_coordinates, normals, valid, projection, W, H)
    depth = cam_coordinates[..., 2]
    ao = bilateral_blur(ao, jnp.where(valid, depth, 0.0))
    rgb = hdr[..., :3] * ao[..., None]
    return jnp.concatenate([rgb, hdr[..., 3:]], -1)
