"""Interactive viewer (reference src/viewer.cpp + python ``sl.view(scene)``).

The reference opens an X11 window with an imgui dashboard showing a 2x2 grid
of RGB / normals / instance segmentation / object coordinates with physics
controls. Headless TPU hosts have no GL window; this viewer renders the same
2x2 dashboard with matplotlib when a display is available and otherwise
writes it to a PNG (path printed), with the same colorization rules as
ViewerShader (per-instance colors; bbox-normalized coordinates —
src/shaders/viewer/viewer_shader.frag:22-54).
"""

from __future__ import annotations

import os

import numpy as np


def _colorize_instances(inst: np.ndarray) -> np.ndarray:
    """Stable per-instance colors (golden-ratio hue walk)."""
    import colorsys

    out = np.zeros(inst.shape + (3,), np.float32)
    for idx in np.unique(inst):
        if idx == 0:
            continue
        h = (idx * 0.61803398875) % 1.0
        out[inst == idx] = colorsys.hsv_to_rgb(h, 0.8, 1.0)
    return out


def _colorize_coords(coords: np.ndarray, valid: np.ndarray) -> np.ndarray:
    c = np.where(valid[..., None], coords, 0.0)
    lo = c.min(axis=(0, 1), keepdims=True)
    hi = c.max(axis=(0, 1), keepdims=True)
    rng = np.where(hi - lo < 1e-9, 1.0, hi - lo)
    return np.where(valid[..., None], (c - lo) / rng, 0.0)


class Viewer:
    def __init__(self, scene):
        self.scene = scene
        self.shading = "pbr"
        self.ssao_enabled = True
        self.draw_physics = False

    def dashboard(self) -> np.ndarray:
        """Render the 2x2 dashboard image (H*2, W*2, 3) uint8."""
        from .render.render_pass import RenderPass

        rp = RenderPass(shading=self.shading, ssao=self.ssao_enabled)
        res = rp.render(self.scene)
        rgb = np.asarray(res.rgb())[..., :3]
        normals = np.asarray(res.normals())
        inst = np.asarray(res.instance_index())
        coords = np.asarray(res.coordinates())
        valid = inst != 0

        n_img = np.where(
            valid[..., None], (normals[..., :3] * 0.5 + 0.5) * 255, 0
        ).astype(np.uint8)
        i_img = (_colorize_instances(inst) * 255).astype(np.uint8)
        c_img = (_colorize_coords(coords, valid) * 255).astype(np.uint8)

        top = np.concatenate([rgb, n_img], axis=1)
        bottom = np.concatenate([i_img, c_img], axis=1)
        return np.concatenate([top, bottom], axis=0)

    def run(self, out_path: str | None = None):
        """Interactive window when a display exists; PNG fallback otherwise."""
        img = self.dashboard()
        has_display = bool(os.environ.get("DISPLAY"))
        if has_display:
            try:
                import matplotlib

                matplotlib.use("TkAgg")
                import matplotlib.pyplot as plt

                fig, ax = plt.subplots(figsize=(12, 9))
                ax.imshow(img)
                ax.set_title("stillleben_tpu viewer — RGB | normals / instances | coords")
                ax.axis("off")
                plt.show()
                return
            except Exception:
                pass
        out_path = out_path or "/tmp/stillleben_tpu_viewer.png"
        import imageio.v2 as imageio

        imageio.imwrite(out_path, img)
        print(f"Viewer (headless): dashboard written to {out_path}")


def view(scene):
    """(reference python/src/py_viewer.cpp ``sl.view``)"""
    Viewer(scene).run()
