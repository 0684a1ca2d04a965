#!/usr/bin/env python
"""Scripted viewer demonstration: drives the interactive Viewer through a
saved interaction script (arcball drags, zoom, keyboard controls, physics
stepping) headless and writes the resulting dashboard frames — the
reproducible stand-in for a live X11 session (reference src/viewer.cpp is a
window + imgui loop; our handlers are identical, only the event source
differs).

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/viewer_demo.py \
        [out_dir] [--size 256]

Writes out_dir/frame_NN.png plus a contact-sheet strip, and prints one line
per event with the viewer state it produced.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


# The saved interaction script: camera orbit, zoom, physics run, shading and
# segmentation toggles, exposure bump — every control class the window loop
# has. Coordinates are in the arcball's (2W, 2H) screen space.
def demo_script(W, H):
    return [
        ("drag", (W, H), (int(W * 1.5), H), 8),          # orbit right
        ("drag", (W, H), (W, int(H * 0.6)), 6),          # orbit up
        ("scroll", 3),                                   # zoom in
        ("key", " "),                                    # start physics
        ("frames", 10),                                  # let it run
        ("key", " "),                                    # pause
        ("key", "m"),                                    # flat shading
        ("key", "m"),                                    # back to pbr
        ("key", "i"),                                    # class segmentation
        ("key", "+"),                                    # exposure up
        ("key", "r"),                                    # reset objects
        ("scroll", -2),                                  # zoom out
    ]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/viewer_demo"
    size = 256
    for i, a in enumerate(sys.argv):
        if a == "--size":
            size = int(sys.argv[i + 1])
    os.makedirs(out_dir, exist_ok=True)

    import stillleben_tpu as sl

    sl.init()
    scene = sl.Scene((size, size))
    scene.seed(7)
    scene.ambient_light = (0.3, 0.3, 0.3)
    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    sphere = sl.Mesh("primitive://sphere")
    sphere.scale_to_bbox_diagonal(0.18)
    for m in (cube, sphere, cube):
        scene.add_object(sl.Object(m))
    scene.simulate_tabletop_scene()
    scene.choose_random_camera_pose()

    v = sl.Viewer(scene)
    W, H = scene.viewport

    import imageio.v2 as imageio

    idx = {"i": 0}

    def save(ev, img):
        p = os.path.join(out_dir, f"frame_{idx['i']:02d}.png")
        imageio.imwrite(p, img)
        print(f"  [{idx['i']:02d}] {ev[0]:<7} -> {v._status_line()}")
        idx["i"] += 1

    frames = v.play_script(demo_script(W, H), frame_cb=save)
    strip = np.concatenate(frames[: min(6, len(frames))], axis=1)
    imageio.imwrite(os.path.join(out_dir, "contact_sheet.png"), strip)
    print(f"viewer_demo: {len(frames)} frames -> {out_dir}")


if __name__ == "__main__":
    main()
