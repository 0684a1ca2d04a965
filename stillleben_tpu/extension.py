"""User-extension helper (reference python/stillleben/extension.py).

The reference wraps torch.utils.cpp_extension.load with stillleben include
paths so users can JIT C++ extensions against libstillleben. The TPU-native
analogue: user extensions are JAX-traceable Python (compose with the
framework's pytrees directly), and native host helpers build against the
headers in the repo-root ``native/`` directory (sl_decompose.h).
"""

from __future__ import annotations

import os


def include_paths() -> list[str]:
    """Include directories for building native helpers against this package."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    return [os.path.abspath(os.path.join(pkg, "..", "native"))]


def load(name: str, sources: list[str], extra_cflags=None, **kwargs):
    """Build + load a C extension via cffi/ctypes-compatible shared object.

    Minimal equivalent of the reference's cpp_extension.load: compiles the
    sources with g++ into a shared library next to the first source and
    returns a ctypes.CDLL handle.
    """
    import ctypes
    import subprocess
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"{name}.so")
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17"]
        + [f"-I{p}" for p in include_paths()]
        + (extra_cflags or [])
        + sources
        + ["-o", out]
    )
    subprocess.run(cmd, check=True)
    return ctypes.CDLL(out)
