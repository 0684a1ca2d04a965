#!/usr/bin/env python
"""Interactive viewer example (port of the reference examples/viewer.py).

``--web [PORT]`` serves the interactive window over HTTP instead of opening
a local matplotlib window — the mode for headless TPU hosts."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import stillleben_tpu as sl

sl.init()

mesh = sl.Mesh("/root/reference/tests/stanford_bunny/scene.gltf")
mesh.scale_to_bbox_diagonal(0.5)

scene = sl.Scene((640, 480))
for _ in range(4):
    scene.add_object(sl.Object(mesh))

scene.simulate_tabletop_scene()
scene.choose_random_light_direction()

if "--web" in sys.argv:
    i = sys.argv.index("--web")
    port = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8645
    sl.view(scene, web=True, port=port)
else:
    sl.view(scene)
