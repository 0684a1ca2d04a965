#!/usr/bin/env python
"""PBR bunny heap with IBL lighting (port of the reference examples/pbr.py)."""

import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import stillleben_tpu as sl

BUNNY = pathlib.Path("/root/reference/tests/stanford_bunny/scene.gltf")

sl.init()

mesh = sl.Mesh(BUNNY)
mesh.scale_to_bbox_diagonal(0.5)

scene = sl.Scene((1920, 1080) if os.environ.get("PBR_FULL") else (640, 480))

for i in range(int(os.environ.get("PBR_OBJECTS", "8"))):
    obj = sl.Object(mesh)
    obj.metallic = random.random()
    obj.roughness = random.random()
    scene.add_object(obj)

# let them fall in a heap
scene.simulate_tabletop_scene()

# lighting: sIBL environment map if provided, else a random directional light
ibl = os.environ.get("PBR_IBL")
if ibl:
    scene.light_map = sl.LightMap(ibl)
else:
    scene.choose_random_light_direction()

scene.background_plane_size = np.array([3.0, 3.0])
scene.background_color = np.array([0.1, 0.1, 0.1, 1.0])

if os.environ.get("DISPLAY"):
    sl.view(scene)

result = sl.RenderPass().render(scene)
print("Resulting RGB frame:", result.rgb().shape)
print("Resulting segmentation frame:", result.instance_index().shape)

from PIL import Image

Image.fromarray(np.asarray(result.rgb())[:, :, :3]).save("/tmp/pbr.jpeg")
print("wrote /tmp/pbr.jpeg")
