#!/usr/bin/env python
"""Author ``<mesh>.pretransform`` sidecar files (the reference's align_mesh
GUI, tools/align_mesh/align_mesh.cpp, as a scriptable CLI).

Compose rotations/translations/scales in the given order; the result is
validated (uniform scale) and written next to the mesh:

    python tools/align_mesh.py model.obj --rot-x 90 --scale 0.001 \
        --center --write
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mesh")
    parser.add_argument("--rot-x", type=float, default=0.0, help="degrees")
    parser.add_argument("--rot-y", type=float, default=0.0)
    parser.add_argument("--rot-z", type=float, default=0.0)
    parser.add_argument("--translate", type=float, nargs=3, default=[0, 0, 0])
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--center", action="store_true",
                        help="center the bbox after the transform")
    parser.add_argument("--diagonal", type=float,
                        help="scale so the bbox diagonal equals this")
    parser.add_argument("--write", action="store_true",
                        help="write <mesh>.pretransform (else dry run)")
    args = parser.parse_args()

    import jax.numpy as jnp

    import stillleben_tpu as sl
    from stillleben_tpu.core import math as m

    sl.init()
    mesh = sl.Mesh(args.mesh, physics=False)

    R = (
        np.asarray(m.rotation_z(jnp.float32(np.deg2rad(args.rot_z))))
        @ np.asarray(m.rotation_y(jnp.float32(np.deg2rad(args.rot_y))))
        @ np.asarray(m.rotation_x(jnp.float32(np.deg2rad(args.rot_x))))
    )
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R * args.scale
    T[:3, 3] = args.translate
    mesh.pretransform = T
    if args.diagonal:
        mesh.scale_to_bbox_diagonal(args.diagonal)
    if args.center:
        mesh.center_bbox()

    P = mesh.pretransform
    print("pretransform:")
    print(P)
    print("bbox:", mesh.bbox)

    if args.write:
        out = args.mesh + ".pretransform"
        with open(out, "w") as f:
            for row in P:
                f.write(" ".join(f"{v:.8g}" for v in row) + "\n")
        print(f"wrote {out}")
    else:
        print("(dry run — pass --write to save)")


if __name__ == "__main__":
    main()
