#!/usr/bin/env python
"""Stage bisect of the compact-cell raster (run SOLO on TPU).

Times cumulative prefixes of rasterize_vertices_cells on the bench geometry
so the ~70 ms/frame camera raster cost is attributed to a stage, not guessed.
Each stage returns a reduced scalar to keep XLA from eliding work, except
where the full tensor feeds the next stage.
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

B = int(os.environ.get("AB_BATCH", "4"))
W, H = 640, 480
TILE = 16


def timeit(label, fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best*1000:9.2f} ms total {best*1000/B:8.2f} ms/frame"
          f"  (compile {warm:.0f}s)", flush=True)
    return best


def main():
    import bench as benchmod
    from stillleben_tpu.parallel.batch import settle_scene
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.rasterize import geometry_stage
    from stillleben_tpu.render import rasterize_tiled as rt

    tpl = benchmod.build_template(os.environ.get("AB_WORKLOAD", "textured"))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    poses, cams, _ = jax.jit(jax.vmap(
        lambda k: settle_scene(k, tpl, default_config(), 100)
    ))(keys)
    jax.block_until_ready(poses)
    atlas = tpl.render_atlas
    faces = atlas.faces
    F = int(faces.shape[0])
    tw, th = -(-W // TILE), -(-H // TILE)
    n_tiles = tw * th
    print(f"F={F} n_tiles={n_tiles}", flush=True)

    def verts_of(p, c):
        nb = tpl.base_inputs.obj_to_world.shape[0]
        otw = tpl.base_inputs.obj_to_world.at[: p.shape[0]].set(p[:nb])
        inputs = tpl.base_inputs._replace(obj_to_world=otw, cam_pose=c)
        geom = geometry_stage(atlas, inputs, W, H)
        v = geom.pix_hom[faces]
        visible = inputs.obj_visible[atlas.face_obj]
        return v, visible

    timeit("geometry + pix_hom[faces] gather", lambda p, c: jax.vmap(verts_of)(p, c)[0].sum(), poses, cams)

    # pair-slot build (prologue + classes + keys), no sort
    def build_pairs(v, visible):
        """Replicates the cells-path prologue; returns (key, tri)."""
        depth_attr = v[..., 2]
        w = v[..., 2]
        all_front = jnp.all(w > 1e-6, axis=-1)
        safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
        u_px = v[..., 0] / safe_w
        v_px = v[..., 1] / safe_w
        x0 = jnp.clip(jnp.floor(u_px.min(-1)), 0, W - 1)
        x1 = jnp.clip(jnp.ceil(u_px.max(-1)), 0, W - 1)
        y0 = jnp.clip(jnp.floor(v_px.min(-1)), 0, H - 1)
        y1 = jnp.clip(jnp.ceil(v_px.max(-1)), 0, H - 1)
        on_screen = ((u_px.max(-1) >= 0) & (u_px.min(-1) < W)
                     & (v_px.max(-1) >= 0) & (v_px.min(-1) < H))
        zmin = depth_attr.min(-1)
        zmax = depth_attr.max(-1)
        in_range = (zmax > 0.1) & (zmin <= 10.0)
        active = visible & (zmax > 0.1) & ~(all_front & (~on_screen | ~in_range))
        tx0 = (x0 / TILE).astype(jnp.int32)
        tx1 = (x1 / TILE).astype(jnp.int32)
        ty0 = (y0 / TILE).astype(jnp.int32)
        ty1 = (y1 / TILE).astype(jnp.int32)
        span_x = tx1 - tx0 + 1
        span_y = ty1 - ty0 + 1
        fits = active & all_front
        one_tile = fits & (span_x == 1) & (span_y == 1)
        class2 = fits & ~one_tile & (span_x <= 2) & (span_y <= 2)
        class4 = fits & ~one_tile & ~class2 & (span_x <= 4) & (span_y <= 4)
        big = active & ~one_tile & ~class2 & ~class4
        arangeF = jnp.arange(F, dtype=jnp.int32)
        znorm = jnp.clip(zmin / 10.0, 0.0, 1.0) * 0.999

        def span_pairs(mask, span_budget, cap):
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            src = jnp.where(mask & (rank < cap), rank, cap)
            ids = jnp.zeros((cap + 1,), jnp.int32).at[src].set(arangeF, mode="drop")[:cap]
            ok = jnp.zeros((cap + 1,), bool).at[src].set(mask, mode="drop")[:cap]
            n_slots = span_budget * span_budget
            s = jnp.arange(n_slots, dtype=jnp.int32)
            sx = s % span_budget
            sy = s // span_budget
            ptx = tx0[ids][None, :] + sx[:, None]
            pty = ty0[ids][None, :] + sy[:, None]
            pok = (ok[None, :] & (sx[:, None] < span_x[ids][None, :])
                   & (sy[:, None] < span_y[ids][None, :]))
            ptile = pty * tw + ptx
            key = jnp.where(pok, ptile.astype(jnp.float32) + znorm[ids][None, :],
                            jnp.float32(n_tiles + 2)).reshape(-1)
            tri = jnp.broadcast_to(ids[None, :], (n_slots, cap)).reshape(-1)
            return key, tri

        cap2 = int(min(F, max(32768, F // 3)))
        cap4 = int(min(F, max(8192, F // 16)))
        k1, t1 = span_pairs(one_tile, 1, F)
        k2, t2 = span_pairs(class2, 2, cap2)
        k4, t4 = span_pairs(class4, 4, cap4)
        bc = 64
        big_rank = jnp.cumsum(big.astype(jnp.int32)) - 1
        big_src = jnp.where(big & (big_rank < bc), big_rank, bc)
        big_ids = jnp.zeros((bc + 1,), jnp.int32).at[big_src].set(arangeF, mode="drop")[:bc]
        big_ok = jnp.zeros((bc + 1,), bool).at[big_src].set(big, mode="drop")[:bc]
        tids = jnp.arange(n_tiles, dtype=jnp.int32)
        kb = jnp.where(big_ok[None, :],
                       tids[:, None].astype(jnp.float32) + znorm[big_ids][None, :],
                       jnp.float32(n_tiles + 2)).reshape(-1)
        tb = jnp.broadcast_to(big_ids[None, :], (n_tiles, bc)).reshape(-1)
        return jnp.concatenate([k1, k2, k4, kb]), jnp.concatenate([t1, t2, t4, tb])

    def stage_pairs(p, c):
        v, vis = jax.vmap(verts_of)(p, c)
        key, tri = jax.vmap(build_pairs)(v, vis)
        return key.sum() + tri.sum()

    timeit("+ pair-slot build (keys)", stage_pairs, poses, cams)

    def stage_argsort(p, c):
        v, vis = jax.vmap(verts_of)(p, c)
        key, tri = jax.vmap(build_pairs)(v, vis)
        order = jnp.argsort(key, axis=-1)
        return order.sum()

    timeit("+ argsort", stage_argsort, poses, cams)

    def stage_sorted(p, c):
        v, vis = jax.vmap(verts_of)(p, c)
        key, tri = jax.vmap(build_pairs)(v, vis)
        sk, st = jax.vmap(lambda k, t: jax.lax.sort((k, t), num_keys=1))(key, tri)
        return sk.sum() + st.sum()

    timeit("+ lax.sort key+payload (vs argsort)", stage_sorted, poses, cams)

    def stage_cells(p, c, with_kernel, merge=False):
        v, vis = jax.vmap(verts_of)(p, c)

        def one(v1, vis1, key, tri):
            sk, st = jax.lax.sort((key, tri), num_keys=1)
            n_pairs = st.shape[0]
            bounds = jnp.searchsorted(sk, jnp.arange(n_tiles + 1, dtype=jnp.float32))
            starts = bounds[:-1]
            counts = jnp.minimum(bounds[1:] - starts, 8192)
            C = 128
            ncells = -(-counts // C)
            cum = jnp.cumsum(ncells)
            total = cum[-1]
            max_cells = int(n_tiles + max(512, (F * 2) // C))
            j = jnp.arange(max_cells, dtype=jnp.int32)
            t_of = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            t_cl = jnp.minimum(t_of, n_tiles - 1)
            base = cum[t_cl] - ncells[t_cl]
            j_in = j - base
            cell_valid = j < total
            cell_tile = jnp.where(cell_valid, t_cl, n_tiles)
            pair0 = starts[t_cl] + j_in * C
            offs = jnp.arange(C, dtype=jnp.int32)
            gi = pair0[:, None] + offs[None, :]
            in_count = (j_in[:, None] * C + offs[None, :]) < counts[t_cl][:, None]
            ids = jnp.where(cell_valid[:, None] & in_count,
                            st[jnp.clip(gi, 0, n_pairs - 1)], -1)
            from stillleben_tpu.render.rasterize_tiled import _edge_lines
            from stillleben_tpu.ops.cell_raster import FIELDS, cell_raster_pallas
            Lf = _edge_lines(v1)
            Lsum = Lf.sum(axis=1)
            Lz = (Lf * v1[..., 2][:, :, None]).sum(axis=1)
            Lcat = jnp.concatenate([Lf.reshape(-1, 9), Lsum, Lz], axis=1)
            LT = jnp.pad(Lcat, ((0, 0), (0, FIELDS - 15)))
            G = LT[jnp.maximum(ids, 0).reshape(-1)].reshape(max_cells, C, FIELDS)
            if not with_kernel:
                return G.sum() + cell_tile.sum()
            mdc = jnp.zeros((max_cells, TILE * TILE), jnp.float32)
            w_c, t_c = cell_raster_pallas(
                G, ids, cell_tile, mdc, 0.1, 10.0, tw, TILE, n_tiles,
            )
            if not merge:
                return w_c.sum() + t_c.sum()
            inf = jnp.float32(jnp.inf)
            wt = jnp.full((n_tiles + 1, TILE * TILE), inf).at[cell_tile].min(w_c, mode="drop")
            BIGID = jnp.int32(2**31 - 1)
            cand = jnp.where((w_c <= wt[cell_tile]) & (w_c < inf) & (t_c >= 0), t_c, BIGID)
            tt = jnp.full((n_tiles + 1, TILE * TILE), BIGID, jnp.int32).at[cell_tile].min(cand, mode="drop")
            return wt.sum() + tt.sum()

        key, tri = jax.vmap(build_pairs)(v, vis)
        return jax.vmap(one)(v, vis, key, tri).sum()

    timeit("+ cell build + G gather (no kernel)",
           lambda p, c: stage_cells(p, c, False), poses, cams)
    timeit("+ kernel", lambda p, c: stage_cells(p, c, True), poses, cams)
    timeit("+ merge (full path)", lambda p, c: stage_cells(p, c, True, True), poses, cams)


if __name__ == "__main__":
    main()
