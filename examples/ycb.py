#!/usr/bin/env python
"""YCB-Video-style synthetic scene generation (port of the reference
examples/ycb.py — same flow, stillleben_tpu import).

Generates scenes with composition similar to the YCB Video Dataset
(Xiang et al. 2017, PoseCNN, arXiv:1711.00199). Point it at a YCB models
directory; without one it falls back to built-in primitives so the example
always runs.
"""

import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import stillleben_tpu as sl

CLASSES = (
    "__background__",
    "002_master_chef_can", "003_cracker_box", "004_sugar_box",
    "005_tomato_soup_can", "006_mustard_bottle", "007_tuna_fish_can",
    "008_pudding_box", "009_gelatin_box", "010_potted_meat_can",
    "011_banana", "019_pitcher_base", "021_bleach_cleanser",
    "024_bowl", "025_mug", "035_power_drill", "036_wood_block",
    "037_scissors", "040_large_marker", "051_large_clamp",
    "052_extra_large_clamp", "061_foam_brick",
)
RESOLUTION = (640, 480)
INTRINSICS = (1066.778, 1067.487, 312.9869, 241.3109)


def run(ycb_path=None, ibl_path=None, plane_texture_path=None, out="rgb.jpeg"):
    sl.init()

    if ycb_path:
        mesh_path = pathlib.Path(ycb_path) / "models"
        meshes = sl.Mesh.load_threaded(
            [mesh_path / c / "textured.obj" for c in CLASSES[1:]]
        )
    else:
        print("No YCB dataset given — using built-in primitives.")
        meshes = []
        for name, diag in (("cube", 0.15), ("sphere", 0.12)):
            m = sl.Mesh(f"primitive://{name}")
            m.scale_to_bbox_diagonal(diag)
            meshes.append(m)

    for i, mesh in enumerate(meshes):
        mesh.class_index = i + 1

    scene = sl.Scene(RESOLUTION)
    scene.set_camera_intrinsics(*INTRINSICS)

    for mesh in [random.choice(meshes) for _ in range(10)]:
        obj = sl.Object(mesh)
        # override metallic/roughness so it gets interesting
        obj.metallic = random.random()
        obj.roughness = random.random()
        scene.add_object(obj)

    # let them fall in a heap
    scene.simulate_tabletop_scene()

    # lighting
    if ibl_path:
        scene.light_map = sl.LightMap(str(ibl_path))
    else:
        scene.choose_random_light_position()

    # plane & background color
    scene.background_plane_size = np.array([3.0, 3.0])
    scene.background_color = np.array([0.1, 0.1, 0.1, 1.0])
    if plane_texture_path:
        scene.background_plane_texture = sl.Texture2D(plane_texture_path)

    if os.environ.get("DISPLAY"):
        sl.view(scene)

    result = sl.RenderPass().render(scene)

    from PIL import Image

    Image.fromarray(np.asarray(result.rgb())[:, :, :3]).save(out)
    print(f"wrote {out}; instances visible:",
          sorted(set(np.unique(np.asarray(result.instance_index()))) - {0}))


def run_stream(n_batches=4, batch=8, out_dir="ycb_out", width=320, height=240):
    """Production-shaped datagen: the host-pipelined stream renders batches
    on-device while the threaded saver writes the previous batch's PNGs
    (rgb + instance masks) — the reference's render->save loop without the
    readback stall."""
    from stillleben_tpu.parallel.batch import template_from_scene
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    sl.init()
    scene = sl.Scene((width, height))
    scene.seed(0)
    meshes = []
    for i, (name, diag) in enumerate((("cube", 0.15), ("sphere", 0.12))):
        m = sl.Mesh(f"primitive://{name}")
        m.scale_to_bbox_diagonal(diag)
        m.class_index = i + 1
        meshes.append(m)
    for k in range(8):
        scene.add_object(sl.Object(meshes[k % 2]))
    tpl = template_from_scene(scene)
    cfg = FrameConfig(width=width, height=height, shading="pbr", ssao=False,
                      max_lights=1)

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with sl.ImageSaver() as saver:
        for frames in sl.generate_stream(
            tpl, cfg, default_config(), batch=batch, n_batches=n_batches
        ):
            for rgb, inst in zip(frames.rgb, frames.instance_index):
                saver.save(rgb, os.path.join(out_dir, f"{n:06d}_rgb.png"))
                saver.save(inst.astype(np.uint16),
                           os.path.join(out_dir, f"{n:06d}_mask.png"))
                n += 1
    print(f"wrote {n} scenes to {out_dir}/")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", metavar="PATH", type=str, nargs="?", default=None,
                        help='path containing the "models" directory (optional)')
    parser.add_argument("--ibl", metavar="FILE.IBL", type=str, help="environment light map")
    parser.add_argument("--plane-texture", metavar="IMAGE", type=str)
    parser.add_argument("--stream", metavar="N", type=int, default=None,
                        help="datagen mode: stream N batches of 8 scenes to --out-dir")
    parser.add_argument("--out-dir", default="ycb_out")
    args = parser.parse_args()
    if args.stream:
        run_stream(n_batches=args.stream, out_dir=args.out_dir)
    else:
        run(args.dataset, args.ibl, args.plane_texture)
