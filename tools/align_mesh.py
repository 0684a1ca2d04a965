#!/usr/bin/env python
"""Author ``<mesh>.pretransform`` sidecar files (the reference's align_mesh
GUI, tools/align_mesh/align_mesh.cpp) — batch CLI *and* interactive visual
alignment.

Batch: compose rotations/translations/scales in the given order; the result
is validated (uniform scale) and written next to the mesh:

    python tools/align_mesh.py model.obj --rot-x 90 --scale 0.001 \
        --center --write

Interactive (``--interactive``, needs a display): renders the mesh with axes
overlay and edits the pretransform live — the same operation set as the
reference GUI's R+/r+/T+/S+ button grid:

    axis select  x / y / z
    rotate       left / right (5 deg), shift+left/right (90 deg)
    translate    up / down (1 cm), shift+up/down (10 cm) along the axis
    scale        + / -  (x1.1 each)
    center bbox  c       unit-diagonal scale  u
    write        w       print matrix  p      mouse = arcball orbit

``--web`` serves the same alignment window over HTTP for headless TPU
hosts (browser arrow keys map to the handler above; see viewer_web.py).
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
    parser.add_argument("--interactive", action="store_true",
                        help="open the visual alignment window")
    parser.add_argument("--web", action="store_true",
                        help="serve the alignment window over HTTP "
                             "(headless hosts)")
    parser.add_argument("--port", type=int, default=8646)
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

    if args.web:
        AlignSession(mesh).run_web(port=args.port)
        return
    if args.interactive:
        AlignSession(mesh).run_window()
        return

    if args.write:
        write_pretransform(args.mesh, P)
    else:
        print("(dry run — pass --write to save)")


def write_pretransform(mesh_path: str, P: np.ndarray) -> str:
    out = str(mesh_path) + ".pretransform"
    with open(out, "w") as f:
        for row in P:
            f.write(" ".join(f"{v:.8g}" for v in row) + "\n")
    print(f"wrote {out}")
    return out


class AlignSession:
    """Scriptable interactive-alignment core (the reference GUI's operation
    set: per-axis 90-deg/fine rotations, coarse/fine translations, scale,
    tools/align_mesh/align_mesh.cpp:458-560). A matplotlib window drives it
    when available; tests drive it headless."""

    def __init__(self, mesh):
        self.mesh = mesh
        self.axis = 2  # z

    # -- operations (compose LEFT of the current pretransform, i.e. applied
    # after it — matching the reference's incremental edit buttons) --------

    def _compose(self, D: np.ndarray) -> None:
        self.mesh.pretransform = D.astype(np.float32) @ self.mesh.pretransform

    def rotate(self, axis: int, degrees: float) -> None:
        import jax.numpy as jnp

        from stillleben_tpu.core import math as m

        fn = (m.rotation_x, m.rotation_y, m.rotation_z)[axis]
        D = np.eye(4, dtype=np.float32)
        D[:3, :3] = np.asarray(fn(jnp.float32(np.deg2rad(degrees))))
        self._compose(D)

    def translate(self, axis: int, dist: float) -> None:
        D = np.eye(4, dtype=np.float32)
        D[axis, 3] = dist
        self._compose(D)

    def scale(self, factor: float) -> None:
        D = np.eye(4, dtype=np.float32) * factor
        D[3, 3] = 1.0
        self._compose(D)

    def center_bbox(self) -> None:
        self.mesh.center_bbox()

    def unit_diagonal(self) -> None:
        self.mesh.scale_to_bbox_diagonal(1.0)

    def write(self) -> str:
        return write_pretransform(self.mesh.filename, self.mesh.pretransform)

    def handle_key(self, k: str) -> bool:
        """One keyboard edit (matplotlib key names; the web window maps
        browser keys to the same names). True = state changed, re-render."""
        if k in ("x", "y", "z"):
            self.axis = "xyz".index(k)
        elif k == "left":
            self.rotate(self.axis, -5.0)
        elif k == "right":
            self.rotate(self.axis, 5.0)
        elif k == "shift+left":
            self.rotate(self.axis, -90.0)
        elif k == "shift+right":
            self.rotate(self.axis, 90.0)
        elif k == "up":
            self.translate(self.axis, 0.01)
        elif k == "down":
            self.translate(self.axis, -0.01)
        elif k == "shift+up":
            self.translate(self.axis, 0.1)
        elif k == "shift+down":
            self.translate(self.axis, -0.1)
        elif k in ("+", "="):
            self.scale(1.1)
        elif k == "-":
            self.scale(1 / 1.1)
        elif k == "c":
            self.center_bbox()
        elif k == "u":
            self.unit_diagonal()
        elif k == "w":
            self.write()
        elif k == "p":
            print(self.mesh.pretransform)
            return False
        else:
            return False
        return True

    # -- rendering ------------------------------------------------------------

    def render(self, size=(480, 480)) -> np.ndarray:
        """Debug render: mesh + object axes overlay at the current
        pretransform (uint8 RGB)."""
        import stillleben_tpu as sl
        from stillleben_tpu.debug import render_debug_image

        scene = sl.Scene(size)
        obj = sl.Object(self.mesh)
        scene.add_object(obj)
        d = max(self.mesh.bbox.diagonal, 1e-3)
        scene.set_camera_look_at([1.8 * d, 1.2 * d, 0.9 * d], [0, 0, 0])
        scene.choose_random_light_direction()
        self._scene = scene
        return np.asarray(render_debug_image(scene))[..., :3]

    def run_window(self):
        import matplotlib

        matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        im = ax.imshow(self.render())
        ax.axis("off")
        title = ax.set_title(self._status())

        def redraw():
            im.set_data(self.render())
            title.set_text(self._status())
            fig.canvas.draw_idle()

        def on_key(ev):
            if self.handle_key(ev.key or ""):
                redraw()

        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.show()

    def run_web(self, port: int = 8646, block: bool = True):
        """Serve the alignment window over HTTP (the reference SDL2 GUI on a
        headless TPU host — same edit keys as run_window)."""
        from stillleben_tpu.viewer_web import AppServer, CallbackAppState

        state = CallbackAppState(self.render, self.handle_key, self._status)
        srv = AppServer(state, port=port)
        if block:
            srv.serve_forever()
        else:
            srv.start()
        return srv

    def _status(self) -> str:
        b = self.mesh.bbox
        return (
            f"align_mesh — axis: {'xyz'[self.axis]}  diag: {b.diagonal:.4f}\n"
            "x/y/z axis · arrows rotate/translate (shift=coarse) · +/- scale ·"
            " c center · u unit-diag · w write"
        )


if __name__ == "__main__":
    main()
