#!/usr/bin/env python
"""Interactive viewer example (port of the reference examples/viewer.py)."""

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

sl.view(scene)
