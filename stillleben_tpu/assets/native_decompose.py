"""ctypes binding for the native convex-decomposition library.

Builds ``native/sl_decompose.cpp`` on demand with g++ (cached next to the
source) and exposes ``decompose_native``/``convex_hull_native`` returning the
same structures as the Python fallback in assets/convex.py. The reference
keeps this stage native too (vendored V-HACD, contrib/v-hacd); here it is the
asset-cook hot path (the results are content-hash cached per asset).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib: "ctypes.CDLL | None | bool" = None  # None = not tried, False = unavailable

MAX_HULL_VERTS = 64
MAX_HULL_PLANES = 64


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "native")


def _load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        src_dir = os.path.abspath(_native_dir())
        src = os.path.join(src_dir, "sl_decompose.cpp")
        so = os.path.join(src_dir, "libsl_decompose.so")
        try:
            if not os.path.exists(src):
                _lib = False
                return None
            if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.sl_decompose.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = False
            return None
        return _lib


def available() -> bool:
    return _load_library() is not None


def decompose_native(
    vertices: np.ndarray,
    faces: np.ndarray,
    concavity: float,
    max_hulls: int = 32,
    resolution: int = 48,
    force_single_hull: bool = False,
):
    """Returns a list of dicts (verts/planes/volume/com/inertia) or None when
    the native library is unavailable or fails."""
    lib = _load_library()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    n_verts = v.shape[0]
    n_tris = f.shape[0]
    mh = max_hulls

    out_verts = np.zeros((mh, MAX_HULL_VERTS, 3), np.float32)
    out_vc = np.zeros(mh, np.int32)
    out_planes = np.zeros((mh, MAX_HULL_PLANES, 4), np.float32)
    out_pc = np.zeros(mh, np.int32)
    out_vol = np.zeros(mh, np.float32)
    out_com = np.zeros((mh, 3), np.float32)
    out_inertia = np.zeros((mh, 3, 3), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n = lib.sl_decompose(
        ptr(v, ctypes.c_float), ctypes.c_int(n_verts),
        ptr(f, ctypes.c_int), ctypes.c_int(n_tris),
        ctypes.c_float(concavity), ctypes.c_int(mh), ctypes.c_int(resolution),
        ctypes.c_int(1 if force_single_hull else 0),
        ctypes.c_int(MAX_HULL_VERTS), ctypes.c_int(MAX_HULL_PLANES),
        ptr(out_verts, ctypes.c_float), ptr(out_vc, ctypes.c_int),
        ptr(out_planes, ctypes.c_float), ptr(out_pc, ctypes.c_int),
        ptr(out_vol, ctypes.c_float), ptr(out_com, ctypes.c_float),
        ptr(out_inertia, ctypes.c_float),
    )
    if n <= 0:
        return None
    hulls = []
    for i in range(n):
        nv = int(out_vc[i])
        np_ = int(out_pc[i])
        if nv < 4 or np_ < 4:
            continue
        hulls.append(
            dict(
                vertices=out_verts[i, :nv].copy(),
                planes=out_planes[i, :np_].copy(),
                volume=float(out_vol[i]),
                center_of_mass=out_com[i].copy(),
                inertia=out_inertia[i].copy(),
            )
        )
    return hulls or None
