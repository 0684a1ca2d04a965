"""Built-in primitive meshes, addressed as ``primitive://<name>``.

Parity with the reference's PrimitiveImporter
(src/utils/primitive_importer.cpp:50-94) which serves ``primitive://cube``
as a Magnum cube (half-extent 1, i.e. corners at ±1) with the default
material. We additionally provide sphere and plane primitives.
"""

from __future__ import annotations

import numpy as np

from .gltf import GltfDocument, GltfMaterial, GltfNode, GltfPrimitive

PRIMITIVE_SCHEME = "primitive://"


def _cube() -> GltfPrimitive:
    """Axis-aligned cube with corners at ±1, 24 vertices (per-face normals/uvs),
    matching Magnum Primitives::cubeSolid (used by primitive_importer.cpp:62)."""
    # face: (normal axis, sign)
    positions, normals, uvs, faces = [], [], [], []
    for axis in range(3):
        for sign in (1.0, -1.0):
            n = np.zeros(3, np.float32)
            n[axis] = sign
            u_axis = (axis + 1) % 3
            v_axis = (axis + 2) % 3
            base = len(positions)
            for du, dv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                p = n.copy()
                p[u_axis] = du * sign
                p[v_axis] = dv
                positions.append(p)
                normals.append(n)
                uvs.append([(du + 1) / 2, (dv + 1) / 2])
            faces.append([base, base + 1, base + 2])
            faces.append([base, base + 2, base + 3])
    return GltfPrimitive(
        positions=np.array(positions, np.float32),
        normals=np.array(normals, np.float32),
        texcoords=np.array(uvs, np.float32),
        indices=np.array(faces, np.uint32),
        material=0,
    )


def _uv_sphere(rings: int = 16, segments: int = 32) -> GltfPrimitive:
    ring_t = np.linspace(0.0, np.pi, rings + 1)
    seg_t = np.linspace(0.0, 2 * np.pi, segments + 1)
    tt, pp = np.meshgrid(ring_t, seg_t, indexing="ij")
    x = np.sin(tt) * np.cos(pp)
    y = np.sin(tt) * np.sin(pp)
    z = np.cos(tt)
    positions = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    uv = np.stack([pp / (2 * np.pi), tt / np.pi], axis=-1).reshape(-1, 2).astype(np.float32)
    faces = []
    for r in range(rings):
        for s in range(segments):
            a = r * (segments + 1) + s
            b = a + segments + 1
            faces.append([a, b, a + 1])
            faces.append([a + 1, b, b + 1])
    return GltfPrimitive(
        positions=positions,
        normals=positions.copy(),
        texcoords=uv,
        indices=np.array(faces, np.uint32),
        material=0,
    )


def _plane() -> GltfPrimitive:
    """Unit plane in XY (corners ±1), +Z normal."""
    positions = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    return GltfPrimitive(positions=positions, normals=normals, texcoords=uvs, indices=faces, material=0)


_GENERATORS = {
    "cube": _cube,
    "sphere": _uv_sphere,
    "plane": _plane,
}


def is_primitive_path(path: str) -> bool:
    return path.startswith(PRIMITIVE_SCHEME)


def load_primitive(path: str) -> GltfDocument:
    name = path[len(PRIMITIVE_SCHEME) :]
    if name not in _GENERATORS:
        raise ValueError(f"Unknown primitive '{name}' (have: {sorted(_GENERATORS)})")
    prim = _GENERATORS[name]()
    from ..context import DEFAULT_MATERIAL_COLOR

    mat = GltfMaterial(
        name="default",
        base_color=DEFAULT_MATERIAL_COLOR.copy(),
        metallic=0.04,
        roughness=0.5,
        has_metallic_factor=True,
        has_roughness_factor=True,
    )
    doc = GltfDocument(
        nodes=[GltfNode(name=name, mesh=0)],
        roots=[0],
        meshes=[[prim]],
        materials=[mat],
    )
    return doc
