"""User-facing texture wrappers.

Parity with the reference python bindings (py_magnum.cpp): ``Texture`` (a GL
RectangleTexture: non-mipmapped, used for background images & stickers) and
``Texture2D`` (mipmapped, clamp-to-border in the reference for stickers,
src/context.cpp:567-649). Both accept a filename or an (H, W, 3|4) uint8
array. Device upload happens lazily where consumed.
"""

from __future__ import annotations

import numpy as np


class Texture:
    def __init__(self, source):
        import pathlib

        if isinstance(source, pathlib.Path):
            source = str(source)
        if isinstance(source, str):
            from PIL import Image

            img = Image.open(source).convert("RGBA")
            self.pixels = np.asarray(img, dtype=np.uint8)
        else:
            arr = np.asarray(source)
            if arr.dtype != np.uint8:
                raise TypeError("Texture expects uint8 data")
            if arr.ndim != 3 or arr.shape[2] not in (3, 4):
                raise ValueError("Texture expects (H, W, 3|4)")
            if arr.shape[2] == 3:
                arr = np.concatenate(
                    [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=2
                )
            self.pixels = arr.copy()

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    def linear_f32(self) -> np.ndarray:
        """(H, W, 4) f32 linear (gamma 2.2, matching the frag's toLinear)."""
        arr = self.pixels.astype(np.float32) / 255.0
        arr[..., :3] = arr[..., :3] ** 2.2
        return arr


class Texture2D(Texture):
    """Mipmapped variant; mip generation is done where consumed."""
