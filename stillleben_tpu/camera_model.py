"""Camera sensor-noise model (Carlson et al. 2018).

API-parity port of the reference python/stillleben/camera_model.py to JAX:
chromatic aberration (per-channel affine resample, :46-72), 5x5 Gaussian blur
(:75-119), logistic re-exposure (:121-130), Poissonian-Gaussian noise (Foi et
al. 2008, :132-159), vectorized RGB<->HSV hue jitter (:161-220), and the
deterministic / randomized pipelines (:222-286 — same parameter ranges).

Images are 3xHxW float arrays in [0, 1] (jax or numpy; torch tensors are
converted). Random functions take an optional ``key``; without one a fresh
key is drawn from numpy entropy (mirroring the reference's global RNG use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

KERNEL_SIZE = 5


def _as_jnp(x):
    if "torch" in type(x).__module__:
        x = x.detach().cpu().numpy()
    return jnp.asarray(x, jnp.float32)


def _fresh_key():
    return jax.random.PRNGKey(int.from_bytes(np.random.bytes(4), "little"))


def _gaussian_kernel(sigma: float) -> jax.Array:
    ax = np.arange(KERNEL_SIZE, dtype=np.float32)
    xx, yy = np.meshgrid(ax, ax)
    mean = (KERNEL_SIZE - 1) / 2.0
    var = max(float(sigma), 1e-6) ** 2
    k = np.exp(-((xx - mean) ** 2 + (yy - mean) ** 2) / (2 * var))
    return jnp.asarray(k / k.sum(), jnp.float32)


def _sample_bilinear_reflect(img: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Bilinear sample of (H, W) image at pixel coords with reflection padding."""
    H, W = img.shape

    def reflect(i, n):
        # torch 'reflection' padding (align_corners=False style)
        i = jnp.abs(i)
        period = 2 * n
        i = jnp.mod(i, period)
        return jnp.where(i >= n, period - 1 - i, i)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0

    def fetch(xi, yi):
        xi = reflect(xi.astype(jnp.int32), W)
        yi = reflect(yi.astype(jnp.int32), H)
        return img[yi, xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def chromatic_aberration(rgb, translations, scaling):
    """Per-channel affine resample (reference :46-72).

    :param rgb: 3xHxW image
    :param translations: (3, 2) per-channel (tx, ty) in normalized coords
    :param scaling: (3,) per-channel scale
    """
    rgb = _as_jnp(rgb)
    translations = _as_jnp(translations)
    scaling = _as_jnp(scaling)
    assert rgb.ndim == 3 and rgb.shape[0] == 3
    H, W = rgb.shape[1:]

    # normalized grid matching torch affine_grid(align_corners=False)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")

    out = []
    for c in range(3):
        sx = gx * scaling[c] + translations[c, 0]
        sy = gy * scaling[c] + translations[c, 1]
        px = (sx + 1) * W / 2 - 0.5
        py = (sy + 1) * H / 2 - 0.5
        out.append(_sample_bilinear_reflect(rgb[c], px, py))
    return jnp.stack(out)


def blur(rgb, sigma):
    """5x5 Gaussian blur (reference :75-119; zero padding like conv2d pad=2)."""
    rgb = _as_jnp(rgb)
    k = _gaussian_kernel(float(sigma))
    return jax.vmap(lambda c: jax.scipy.signal.convolve2d(c, k, mode="same"))(rgb)


def exposure(rgb, deltaS):
    """Logistic re-exposure (reference :121-130)."""
    rgb = _as_jnp(rgb)
    return 1.0 / (1.0 + jnp.exp(jnp.float32(deltaS)) * (1.0 / (rgb + 1e-4) - 1.0))


def noise(rgb, a, b, key=None):
    """Poissonian-Gaussian noise (Foi et al. 2008; reference :132-159)."""
    rgb = _as_jnp(rgb)
    if key is None:
        key = _fresh_key()
    kp, kg = jax.random.split(key)
    if a > 0.0:
        chi = 1.0 / a
        poisson_part = jax.random.poisson(kp, chi * rgb).astype(jnp.float32) / chi
    else:
        poisson_part = rgb
    if b > 0.0:
        gaussian_part = b * jax.random.normal(kg, rgb.shape)
    else:
        gaussian_part = jnp.zeros_like(rgb)
    return jnp.clip(poisson_part + gaussian_part, 0.0, 1.0)


def color_jitter(tensor_img, hue_shift):
    """Vectorized RGB->HSV hue shift->RGB (reference :161-220)."""
    img = _as_jnp(tensor_img)
    assert img.shape[0] == 3
    R, G, B = img[0], img[1], img[2]
    M = img.max(axis=0)
    Mi = img.argmax(axis=0)
    m = img.min(axis=0)
    C = M - m
    safe_C = jnp.where(C == 0, 1.0, C)

    H1 = (G - B) / safe_C
    H2 = (B - R) / safe_C + 2.0
    H3 = (R - G) / safe_C + 4.0
    case = jnp.where(C == 0, 0, Mi + 1)
    Hsel = jnp.choose(case, [jnp.zeros_like(H1), H1, H2, H3], mode="clip")
    Hdeg = 60.0 * Hsel
    Hdeg = jnp.where(Hdeg < 0, Hdeg + 360.0, Hdeg)

    S = jnp.where(M == 0, 0.0, C / jnp.where(M == 0, 1.0, M))
    V = M

    Hdeg = Hdeg + hue_shift * 360.0
    Hdeg = jnp.where(Hdeg < 0, Hdeg + 360.0, Hdeg)
    Hdeg = jnp.where(Hdeg > 360.0, Hdeg - 360.0, Hdeg)

    Hp = Hdeg / 60.0
    X = C * (1.0 - jnp.abs(jnp.mod(Hp, 2.0) - 1.0))
    order_case = jnp.clip(Hp.astype(jnp.int32), 0, 5)
    order = jnp.asarray(
        [[0, 1, 2], [1, 0, 2], [2, 0, 1], [2, 1, 0], [1, 2, 0], [0, 2, 1]],
        jnp.int32,
    )
    sel = order[order_case]  # (H, W, 3): which of (C, X, 0) goes to R/G/B
    CX0 = jnp.stack([C, X, jnp.zeros_like(C)], axis=-1)  # (H, W, 3)
    RGB = jnp.take_along_axis(CX0, sel, axis=-1)  # (H, W, 3)
    return RGB.transpose(2, 0, 1) + m[None]


def process_deterministic(
    rgb,
    chromatic_translation,
    chromatic_scaling,
    blur_sigma,
    exposure_deltaS,
    do_noise,
    noise_a,
    noise_b,
    hue_shift,
    key=None,
):
    """Full pipeline with fixed parameters (reference :222-258):
    aberration -> blur -> exposure -> noise -> jitter -> 0.4-sigma post-blur."""
    rgb = _as_jnp(rgb)
    assert rgb.ndim == 3 and rgb.shape[0] == 3

    rgb = chromatic_aberration(rgb, chromatic_translation, chromatic_scaling)
    if blur_sigma > 0.0:
        rgb = blur(rgb, blur_sigma)
    rgb = exposure(rgb, exposure_deltaS)
    if do_noise:
        rgb = noise(rgb, noise_a, noise_b, key)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = color_jitter(rgb, hue_shift)
    # the sensor noise has an effect on more than one pixel -> post-blur
    rgb = blur(rgb, 0.4)
    return jnp.clip(rgb, 0.0, 1.0)


def process_image(rgb, key=None):
    """Full pipeline with the reference's random parameter ranges (:260-286)."""
    rng = np.random.default_rng(None)
    hue_jitter = 0.05
    return process_deterministic(
        rgb,
        chromatic_translation=rng.uniform(-0.002, 0.002, size=(3, 2)),
        chromatic_scaling=rng.uniform(0.998, 1.002, size=3),
        blur_sigma=rng.uniform(0.0, 3.0) if rng.random() > 0.3 else 0.0,
        exposure_deltaS=rng.uniform(-2, 1.2),
        do_noise=rng.random() > 0.3,
        noise_a=rng.random() * 0.04,
        noise_b=rng.random() * 0.02,
        hue_shift=rng.uniform(-hue_jitter, hue_jitter),
        key=key,
    )
