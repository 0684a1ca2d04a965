"""User-facing quaternion helpers.

API parity with the reference's ``quat_to_matrix`` / ``matrix_to_quat``
(python/src/py_magnum.cpp bindings, python/stillleben/__init__.py:15-42).

The reference uses torch tensors with quaternion order (x, y, z, w)
(Magnum stores vector-first; the python binding exposes xyzw — see
python/stillleben/diff.py usage of quaternions). These helpers accept/return
xyzw-ordered quaternions to match, while the internal core uses wxyz.
"""

from __future__ import annotations

import numpy as np

from . import math as _m


def _to_np(x):
    return np.asarray(x, dtype=np.float32)


def quat_to_matrix(q):
    """xyzw quaternion -> 3x3 rotation matrix (numpy or jax input ok)."""
    q = _to_np(q)
    wxyz = np.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)
    return np.asarray(_m.quat_to_matrix(wxyz))


def matrix_to_quat(m):
    """3x3 (or 4x4) rotation matrix -> xyzw quaternion."""
    m = _to_np(m)
    wxyz = np.asarray(_m.matrix_to_quat(m))
    return np.concatenate([wxyz[..., 1:4], wxyz[..., 0:1]], axis=-1)
