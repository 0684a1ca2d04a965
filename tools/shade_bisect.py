#!/usr/bin/env python
"""Shading-stage micro-op cost bisect (run SOLO on the real TPU).

The stage profiler (profile_stages.py) showed textures ≈ 45 ms/scene and
PBR+IBL ≈ 25 ms/scene at 640x480 — this tool times the individual blocks at
the same shapes so kernel work targets measurements, not guesses. Prints one
line per block: total ms over ITERS runs / amortized ms per 640x480 frame.
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

H, W = 480, 640
N = H * W
B = int(os.environ.get("BISECT_BATCH", "4"))  # mimic render_sub_batch vmap


def timeit(label, fn, *args, n=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best*1000:9.2f} ms total {best*1000/B:8.2f} ms/frame",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # ---- inputs shaped like the bench workload -------------------------------
    from stillleben_tpu.render.atlas import MIP_TOTAL, COMBO_CHANNELS

    NC = 3
    stack = jnp.asarray(
        rng.random((NC, MIP_TOTAL, COMBO_CHANNELS)).astype(np.float32)
    )
    u = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    v = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    lod = jnp.asarray((rng.random((B, H, W)) * 6).astype(np.float32))
    tex_id = jnp.asarray(rng.integers(0, NC, (B, H, W)).astype(np.int32))

    from stillleben_tpu.render.shading import (
        ROW, _sample_combo_mip_packed, sample_combo_mip_planar,
    )

    # full packed trilinear sampler
    timeit(
        "tex: packed trilinear sampler",
        jax.vmap(lambda t, uu, vv, l: _sample_combo_mip_packed(stack, t, uu, vv, l)),
        tex_id, u, v, lod,
    )
    timeit(
        "tex: packed bilinear (4 taps)",
        jax.vmap(lambda t, uu, vv, l: _sample_combo_mip_packed(
            stack, t, uu, vv, l, trilinear=False)),
        tex_id, u, v, lod,
    )
    timeit(
        "tex: hwc trilinear sampler",
        jax.vmap(lambda t, uu, vv, l: sample_combo_mip_planar(
            stack, t, uu, vv, l)),
        tex_id, u, v, lod,
    )

    # gathers alone: 8 x (N,) row gathers from the flat stack
    flat = stack.reshape(NC * MIP_TOTAL, COMBO_CHANNELS)
    rows = jnp.asarray(
        rng.integers(0, NC * MIP_TOTAL, (B, 8, N)).astype(np.int32)
    )

    def gathers_only(r):
        return sum(flat[r[i]].sum() for i in range(8))

    timeit("tex: 8 row-gathers only", jax.vmap(gathers_only), rows)

    def gather_concat_reduce(r, w8):
        g = jnp.concatenate([flat[r[i]] for i in range(8)], axis=-1)  # (N, 128)
        wfull = jnp.broadcast_to(
            w8[:, :, None], (8, N, COMBO_CHANNELS)
        ).transpose(1, 0, 2).reshape(N, 8 * COMBO_CHANNELS)
        acc = g * wfull
        while acc.shape[1] > COMBO_CHANNELS:
            half = acc.shape[1] // 2
            acc = acc[:, :half] + acc[:, half:]
        return acc.T.reshape(COMBO_CHANNELS, H, W)

    w8 = jnp.asarray(rng.random((B, 8, N)).astype(np.float32))
    timeit("tex: gathers+filter+transpose", jax.vmap(gather_concat_reduce),
           rows, w8)

    def transpose_only(x):
        return x.T.reshape(COMBO_CHANNELS, H, W)

    x_nt = jnp.asarray(rng.random((B, N, COMBO_CHANNELS)).astype(np.float32))
    timeit("tex: (N,16)->(16,H,W) transpose", jax.vmap(transpose_only), x_nt)

    # LOD/derivative chain (planar math only, no gathers)
    planes = jnp.asarray(rng.random((B, 30, H, W)).astype(np.float32))

    def lod_chain(p):
        b0, b1, b2 = p[0], p[1], p[2]
        denom = p[3] + 1e-6
        lx0, lx1, lx2, ly0, ly1, ly2 = p[4], p[5], p[6], p[7], p[8], p[9]
        uvs = p[10:16]
        slx = lx0 + lx1 + lx2
        sly = ly0 + ly1 + ly2
        db_dx = ((lx0 - b0 * slx) / denom, (lx1 - b1 * slx) / denom,
                 (lx2 - b2 * slx) / denom)
        db_dy = ((ly0 - b0 * sly) / denom, (ly1 - b1 * sly) / denom,
                 (ly2 - b2 * sly) / denom)

        def deriv(db):
            du = uvs[0] * db[0] + uvs[2] * db[1] + uvs[4] * db[2]
            dv = uvs[1] * db[0] + uvs[3] * db[1] + uvs[5] * db[2]
            return du * du + dv * dv

        foot2 = jnp.maximum(deriv(db_dx), deriv(db_dy))
        return 0.5 * jnp.log2(jnp.maximum(foot2 * 65536.0, 1.0))

    timeit("tex: LOD derivative chain", jax.vmap(lod_chain), planes)

    # the big face-row gather + planarize (shading's first step)
    F = 210_000
    rows_tab = jnp.asarray(rng.random((F, ROW)).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, F, (B, N)).astype(np.int32))

    def row_gather(t):
        return rows_tab[t].T.reshape(ROW, H, W)

    timeit("shade: (N,94) row gather + planarize", jax.vmap(row_gather), tri)

    def row_gather_nt(t):
        return rows_tab[t]

    timeit("shade: (N,94) row gather only", jax.vmap(row_gather_nt), tri)

    # VSM shadow factor (4 gathers + chebyshev)
    from stillleben_tpu.render.shadow import shadow_factor_vsm_planar

    S = 2048
    vsm = jnp.asarray(rng.random((1, S, S, 2)).astype(np.float32))
    mats = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (1, 1, 1))
    world = jnp.asarray(rng.random((B, 3, H, W)).astype(np.float32) * 100)
    timeit(
        "shadow: VSM factor (4 taps + chebyshev)",
        jax.vmap(lambda w: shadow_factor_vsm_planar(vsm, mats, 0, w)),
        world,
    )

    # IBL term (LUT + prefilter trilinear + irradiance)
    from stillleben_tpu.render.ibl import ibl_term
    from stillleben_tpu.render.light_map import LightMapData

    lm = LightMapData(
        cubemap=jnp.asarray(rng.random((6, 512, 512, 3)).astype(np.float32)),
        irradiance=jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32)),
        prefilter0=jnp.asarray(rng.random((6, 128, 128, 3)).astype(np.float32)),
        prefilter1=jnp.asarray(rng.random((6, 64, 64, 3)).astype(np.float32)),
        prefilter2=jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32)),
        prefilter3=jnp.asarray(rng.random((6, 16, 16, 3)).astype(np.float32)),
        prefilter4=jnp.asarray(rng.random((6, 8, 8, 3)).astype(np.float32)),
    )
    nrm = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    Vv = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    Vv = Vv / jnp.linalg.norm(Vv, axis=-1, keepdims=True)
    NoV = jnp.clip((nrm * Vv).sum(-1), 1e-5, 1.0)
    rough = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    F0 = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))

    os.environ["SL_IBL_SH"] = "0"
    timeit(
        "ibl: full term (cubemap irradiance)",
        jax.vmap(lambda n, vv, nov, r, f0: ibl_term(
            lm, n, vv, nov, r, f0, f0, f0)),
        nrm, Vv, NoV, rough, F0,
    )
    from stillleben_tpu.render.light_map import project_irradiance_sh

    lm_sh = lm._replace(irradiance_sh=project_irradiance_sh(lm.irradiance))
    os.environ["SL_IBL_SH"] = "1"
    timeit(
        "ibl: full term (SH irradiance)",
        jax.vmap(lambda n, vv, nov, r, f0: ibl_term(
            lm_sh, n, vv, nov, r, f0, f0, f0)),
        nrm, Vv, NoV, rough, F0,
    )

    # one GGX light evaluation, bf16 planar (no shadow)
    def light_eval(p):
        dt = jnp.bfloat16
        n3 = p[0:3].astype(dt)
        v3 = p[3:6].astype(dt)
        rough = p[6].astype(dt)
        metal = p[7].astype(dt)
        base = p[8:11].astype(dt)
        NoVl = jnp.clip((n3 * v3).sum(0), 1e-5, 1.0)
        F0 = 0.04 * (1.0 - metal) + base * metal
        Fr = jnp.maximum(1.0 - rough, F0) - F0
        k_S = F0 + Fr * (1.0 - NoVl) ** 5
        Ld = jnp.asarray([0.3, 0.5, -0.8], dt)[:, None, None]
        Hv = v3 + Ld
        Hv = Hv * jax.lax.rsqrt(jnp.maximum((Hv * Hv).sum(0), 1e-9))
        NdotL = jnp.maximum((n3 * Ld).sum(0), 0.0)
        NdotH = jnp.maximum((n3 * Hv).sum(0), 0.0)
        a = rough * rough
        a2 = a * a
        dnm = NdotH * NdotH * (a2 - 1.0) + 1.0
        NDF = a2 / jnp.maximum(jnp.float32(np.pi).astype(dt) * dnm * dnm, 1e-7)
        r1 = rough + 1.0
        kk = (r1 * r1) / 8.0
        G = (NoVl / (NoVl * (1 - kk) + kk)) * (NdotL / (NdotL * (1 - kk) + kk))
        spec = (NDF * G) * k_S / jnp.maximum(4.0 * NoVl * NdotL, 1e-3)
        kD = (1.0 - k_S) * (1.0 - metal)
        return ((kD * base / np.pi + spec) * NdotL).astype(jnp.float32)

    timeit("light: one GGX direct eval (bf16)", jax.vmap(light_eval), planes)

    # tonemap
    from stillleben_tpu.render.tonemap import tone_map

    img = jnp.asarray(rng.random((B, H, W, 4)).astype(np.float32))
    timeit(
        "tonemap: Yxy auto-exposure + ACES",
        jax.vmap(lambda x: tone_map(x, x, jnp.float32(-1.0))), img,
    )

    # skybox background (full-frame cubemap sample)
    from stillleben_tpu.render.ibl import sample_skybox
    from stillleben_tpu.render.atlas import RenderInputs

    def skybox(x):
        proj = jnp.eye(4, dtype=jnp.float32)

        class IN:
            projection = proj
            cam_pose = jnp.eye(4, dtype=jnp.float32)

        return sample_skybox(lm, IN, W, H) + x[..., :3] * 0.0

    timeit("bg: skybox full-frame sample", jax.vmap(skybox), img)


if __name__ == "__main__":
    main()
