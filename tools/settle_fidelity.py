#!/usr/bin/env python
"""Resting-pose distribution parity across settle configurations.

The reference settle semantics are a fixed 100-frame x 4-substep schedule
with per-substep narrowphase and a 256-pair broadphase budget
(/root/reference/src/scene.cpp:681-740). Any TUNED.json physics knob
(cadence, pair budget, sleep early-exit) must hold the RESTING-POSE
DISTRIBUTION of that schedule, not merely stay stable — a settle that is
stable but rests differently changes the dataset (VERDICT r4 item 4).

Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/settle_fidelity.py \
        [--seeds 24] [config ...]

Configs (default: all): ref, tuned, frame_p128, sleep10, sleep10_frame.
Prints per-config deltas vs ref: resting-z median/q90/max and pairwise
XY-distance median/q90 over all seeds x objects.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=24)
    ap.add_argument("configs", nargs="*")
    args = ap.parse_args()

    import jax

    import bench
    from stillleben_tpu.parallel.batch import settle_scene
    from stillleben_tpu.physics.types import default_config

    tpl = bench.build_template("textured")
    keys = jax.random.split(jax.random.PRNGKey(7), args.seeds)

    base = default_config()
    CONFIGS = {
        "ref": base._replace(contact_gen="substep", max_narrow_pairs=256),
        "tuned": base._replace(contact_gen="every2", max_narrow_pairs=128),
        "frame_p128": base._replace(contact_gen="frame", max_narrow_pairs=128),
        "sleep10": base._replace(
            contact_gen="substep", max_narrow_pairs=256, sleep_frames=10
        ),
        "sleep10_frame": base._replace(
            contact_gen="frame", max_narrow_pairs=128, sleep_frames=10
        ),
        "sleep10_every2": base._replace(
            contact_gen="every2", max_narrow_pairs=128, sleep_frames=10
        ),
    }
    names = args.configs or list(CONFIGS)

    def stats(cfg):
        poses, _, _ = jax.jit(
            jax.vmap(lambda k: settle_scene(k, tpl, cfg, 100))
        )(keys)
        p = np.asarray(poses)
        assert np.isfinite(p).all(), "non-finite settle"
        z = p[:, :, 2, 3]
        xy = p[:, :, :2, 3]
        d = np.linalg.norm(xy[:, :, None, :] - xy[:, None, :, :], axis=-1)
        iu = np.triu_indices(p.shape[1], 1)
        return z, d[:, iu[0], iu[1]].ravel()

    z_ref, pd_ref = stats(CONFIGS["ref"])
    print(
        f"ref: z_med {np.median(z_ref):.4f} z_q90 {np.quantile(z_ref, .9):.4f} "
        f"zmax {z_ref.max():.4f} pd_med {np.median(pd_ref):.4f} "
        f"pd_q90 {np.quantile(pd_ref, .9):.4f}",
        flush=True,
    )
    for name in names:
        if name == "ref":
            continue
        z, pd = stats(CONFIGS[name])
        dz_med = abs(np.median(z) - np.median(z_ref))
        dz_q90 = abs(np.quantile(z, 0.9) - np.quantile(z_ref, 0.9))
        dz_max = abs(z.max() - z_ref.max())
        dpd_med = abs(np.median(pd) - np.median(pd_ref))
        dpd_q90 = abs(np.quantile(pd, 0.9) - np.quantile(pd_ref, 0.9))
        ok = (
            dz_med < 0.01 and dz_q90 < 0.02 and dz_max < 0.05
            and dpd_med < 0.10 and dpd_q90 < 0.20
        )
        print(
            f"{name:16s} dz_med {dz_med:.4f} dz_q90 {dz_q90:.4f} "
            f"dz_max {dz_max:.4f} dpd_med {dpd_med:.4f} dpd_q90 {dpd_q90:.4f} "
            f"zmax {z.max():.3f}  {'PASS' if ok else 'FAIL'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
