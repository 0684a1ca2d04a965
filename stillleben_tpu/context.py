"""Process context: device selection and global defaults.

The reference's Context (src/context.cpp) owns an EGL display + GL 4.5
context, a CUDA device match, and a PhysX foundation. On TPU all of that
collapses to JAX platform initialization: render outputs are natively
``jax.Array`` in device HBM (no interop layer), and physics is our own
batched solver (no external engine to boot).

API parity (reference python/src/py_context.cpp:60-112):
- ``init()`` — create the context.
- ``init_cuda(device_index=0, use_cuda=True)`` — accepted for compatibility;
  selects the given device index of the default JAX backend.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field

import jax
import numpy as np

# Default PBR material color used when a mesh has no material:
# reference src/context.cpp:382-384 (0x3bd267ff, a green).
DEFAULT_MATERIAL_COLOR = np.array(
    [0x3B / 255.0, 0xD2 / 255.0, 0x67 / 255.0, 1.0], dtype=np.float32
)

# Default physics material (reference src/context.cpp:250-252).
DEFAULT_STATIC_FRICTION = 0.3
DEFAULT_DYNAMIC_FRICTION = 0.2
DEFAULT_RESTITUTION = 0.1


class Context:
    """Global framework context (thread-safe singleton via init())."""

    def __init__(self, device: jax.Device | None = None):
        self.device = device if device is not None else jax.devices()[0]
        self.default_material_color = DEFAULT_MATERIAL_COLOR.copy()
        self.debug = bool(os.environ.get("STILLLEBEN_TPU_DEBUG", ""))

    @property
    def platform(self) -> str:
        return self.device.platform


_lock = threading.Lock()
_context: Context | None = None


def init() -> Context:
    """Initialize the global context on the default JAX device."""
    global _context
    with _lock:
        if _context is None:
            _context = Context()
    return _context


def init_cuda(device_index: int = 0, use_cuda: bool = True) -> Context:
    """Compatibility shim for the reference's CUDA init
    (python/src/py_context.cpp:87-100): selects device `device_index` on the
    default JAX backend. Outputs are jax.Arrays on that device."""
    global _context
    with _lock:
        if _context is None:
            devices = jax.devices()
            idx = min(device_index, len(devices) - 1)
            _context = Context(devices[idx])
    return _context


def context() -> Context:
    """Return the global context, initializing a default one if needed."""
    if _context is None:
        return init()
    return _context


def _reset_context_for_tests() -> None:
    global _context
    with _lock:
        _context = None
