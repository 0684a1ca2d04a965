#!/usr/bin/env python
"""Render a mesh file from a turntable of viewpoints (port of the reference
tools/display_mesh.py). Writes a PNG contact sheet (headless-friendly)."""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import stillleben_tpu as sl


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mesh", help="mesh file (.gltf/.glb/.obj/.ply)")
    parser.add_argument("--views", type=int, default=4)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out", default="/tmp/display_mesh.png")
    parser.add_argument("--physics", action="store_true",
                        help="also dump collision hulls next to --out")
    args = parser.parse_args()

    sl.init()
    mesh = sl.Mesh(args.mesh, physics=args.physics)
    mesh.center_bbox()
    diameter = mesh.bbox.diagonal

    scene = sl.Scene((args.size, args.size))
    obj = sl.Object(mesh)
    scene.add_object(obj)
    scene.choose_random_light_direction()
    rp = sl.RenderPass(ssao=False)

    dist = scene.min_dist_for_object_diameter(diameter) * 1.2
    tiles = []
    for i in range(args.views):
        a = 2 * np.pi * i / args.views
        eye = np.array([np.cos(a) * dist, np.sin(a) * dist, 0.4 * dist])
        scene.set_camera_look_at(eye, [0, 0, 0])
        rgb = np.asarray(rp.render(scene).rgb())[..., :3]
        tiles.append(rgb)

    sheet = np.concatenate(tiles, axis=1)
    import imageio.v2 as imageio

    imageio.imwrite(args.out, sheet)
    print(f"wrote {args.out} ({args.views} views, diameter {diameter:.3f})")

    if args.physics:
        prefix = str(pathlib.Path(args.out).with_suffix("")) + "_hull_"
        mesh.dump_physics_meshes(prefix)
        print(f"wrote collision hulls to {prefix}*.obj")


if __name__ == "__main__":
    main()
