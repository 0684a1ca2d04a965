"""The Mesh asset: import, consolidation, pretransform, physics cooking.

API parity with the reference ``sl::Mesh`` / python binding
(reference src/mesh.cpp, python/src/py_mesh.cpp):

- ``Mesh(filename, visual=True, physics=True, flags=0)`` — importer chosen by
  filename (``primitive://`` builtin; .gltf/.glb, .obj/.ply, .stl/.off/.dae/.fbx;
  reference src/mesh.cpp:203-240).
- ``Mesh.load_threaded(filenames)`` — thread-pool import
  (reference src/mesh.cpp:923-999).
- pretransform: uniform scale x rigid, SVD-decomposed, non-uniform scale
  rejected (src/mesh.cpp:1050-1073); ``center_bbox`` and
  ``scale_to_bbox_diagonal`` (src/mesh.cpp:1020-1043); ``.pretransform``
  text sidecar files (src/mesh.cpp:888-921).
- physics cooking: convex decomposition with single-hull shortcut + disk
  cache (src/mesh.cpp:340-511), see assets/convex.py.
- vertex editing for differentiable shape updates: 1-BASED indices
  (src/mesh.cpp:823-855), area-weighted recompute_normals
  (src/mesh.cpp:763-816).
"""

from __future__ import annotations

import enum
import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..core.range3d import Range3D
from .consolidate import ConsolidatedMesh, compute_smooth_normals, consolidate
from .convex import (
    PhysicsMeshData,
    decompose,
    load_cached_physics,
    store_cached_physics,
)
from .gltf import load_gltf
from .objfile import load_obj, load_ply
from .primitive import is_primitive_path, load_primitive


class MeshFlag(enum.IntFlag):
    NONE = 0
    PHYSICS_FORCE_CONVEX_HULL = 1  # reference Mesh::Flag::PhysicsForceConvexHull


class Mesh:
    Flag = MeshFlag

    def __init__(
        self,
        filename,
        visual: bool = True,
        physics: bool = True,
        flags: MeshFlag = MeshFlag.NONE,
        _defer_open: bool = False,
    ):
        self._filename = str(filename)  # pathlib.Path accepted
        self._flags = MeshFlag(flags)
        self._want_visual = visual
        self._want_physics = physics

        self._consolidated: ConsolidatedMesh | None = None
        self._raw_bbox = Range3D()
        self._scale = 1.0
        self._pretransform_rigid = np.eye(4, dtype=np.float32)
        self._pretransform = np.eye(4, dtype=np.float32)
        self._class_index = 0
        self._physics: PhysicsMeshData | None = None
        self._dirty = 0  # bumped on vertex edits; atlases watch this

        if not _defer_open:
            self.open_file()
            if physics:
                self.load_physics()

    # -- import ------------------------------------------------------------

    def open_file(self) -> None:
        """Parse + consolidate the asset (reference Mesh::openFile,
        src/mesh.cpp:186-301)."""
        if self._consolidated is not None:
            return
        fn = self._filename
        if is_primitive_path(fn):
            doc = load_primitive(fn)
        else:
            ext = os.path.splitext(fn)[1].lower()
            if ext in (".gltf", ".glb"):
                doc = load_gltf(fn)
            elif ext == ".obj":
                doc = load_obj(fn)
            elif ext == ".ply":
                doc = load_ply(fn)
            elif ext == ".stl":
                from .objfile import load_stl

                doc = load_stl(fn)
            elif ext == ".off":
                from .objfile import load_off

                doc = load_off(fn)
            elif ext == ".dae":
                from .objfile import load_dae

                doc = load_dae(fn)
            elif ext == ".fbx":
                from .fbxfile import load_fbx

                doc = load_fbx(fn)
            elif ext == ".3ds":
                from .legacy_formats import load_3ds

                doc = load_3ds(fn)
            elif ext == ".x":
                from .legacy_formats import load_x

                doc = load_x(fn)
            else:
                raise ValueError(
                    f"Unsupported mesh format '{ext}' (supported: .gltf .glb "
                    f".obj .ply .stl .off .dae .fbx .3ds .x, primitive://)"
                )
        self._consolidated = consolidate(doc, name=fn)
        self._update_raw_bbox()
        self._load_pretransform_sidecar()

    def _update_raw_bbox(self) -> None:
        self._raw_bbox = Range3D.from_points(self._consolidated.positions)

    def _load_pretransform_sidecar(self) -> None:
        """Optional <file>.pretransform 4x4 text sidecar
        (reference src/mesh.cpp:888-921)."""
        if is_primitive_path(self._filename):
            return
        path = self._filename + ".pretransform"
        if not os.path.exists(path):
            return
        vals = []
        with open(path) as f:
            for line in f:
                vals.extend(float(x) for x in line.replace(",", " ").split())
        if len(vals) != 16:
            raise ValueError(f"{path}: expected 16 values, got {len(vals)}")
        self.pretransform = np.array(vals, dtype=np.float32).reshape(4, 4)

    @staticmethod
    def load_threaded(
        filenames: list[str],
        visual: bool = True,
        physics: bool = True,
        flags: MeshFlag = MeshFlag.NONE,
        max_workers: int | None = None,
    ) -> list["Mesh"]:
        """Parallel import over a thread pool (reference src/mesh.cpp:923-999).
        Parsing/cooking is pure host work so threads are effective here."""
        meshes = [Mesh(str(f), visual, physics, flags, _defer_open=True) for f in filenames]

        def _load(m: Mesh):
            m.open_file()
            if physics:
                m.load_physics()
            return m

        workers = max_workers or min(32, (os.cpu_count() or 4))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(_load, meshes))
        return meshes

    # -- physics -----------------------------------------------------------

    def load_physics(self) -> None:
        """Cook convex hulls (with disk cache; reference src/mesh.cpp:303-511)."""
        if self._physics is not None:
            return
        c = self._consolidated
        if c is None:
            raise RuntimeError("No mesh found")
        is_prim = is_primitive_path(self._filename)
        if not is_prim:
            cached = load_cached_physics(self._filename, c.positions, c.faces, int(self._flags))
            if cached is not None:
                self._physics = cached
                return
        self._physics = decompose(
            c.positions,
            c.faces,
            force_single_hull=bool(self._flags & MeshFlag.PHYSICS_FORCE_CONVEX_HULL),
        )
        if not is_prim:
            store_cached_physics(
                self._filename, c.positions, c.faces, int(self._flags), self._physics
            )

    def load_visual(self) -> None:
        """GL upload in the reference (src/mesh.cpp:624-745); here a no-op —
        device upload happens when a scene atlas is built."""
        self.open_file()

    @property
    def physics_mesh_data(self) -> dict:
        """Hull data as arrays (reference py_mesh.cpp:248-302)."""
        self.load_physics()
        return {
            "vertices": [h.vertices.copy() for h in self._physics.hulls],
            "planes": [h.planes.copy() for h in self._physics.hulls],
            "volumes": np.array([h.volume for h in self._physics.hulls], np.float32),
            "centers_of_mass": np.stack([h.center_of_mass for h in self._physics.hulls]),
        }

    def dump_physics_meshes(self, prefix: str) -> None:
        """Write each collision hull as an OBJ file for inspection
        (reference py_mesh.cpp dump_physics_meshes)."""
        from scipy.spatial import ConvexHull as SciHull

        self.load_physics()
        for i, h in enumerate(self._physics.hulls):
            hull = SciHull(h.vertices.astype(np.float64), qhull_options="QJ")
            with open(f"{prefix}{i:03d}.obj", "w") as f:
                for v in h.vertices:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
                for s in hull.simplices:
                    # orient outward
                    a, b, c = h.vertices[s[0]], h.vertices[s[1]], h.vertices[s[2]]
                    n = np.cross(b - a, c - a)
                    centroid = h.vertices.mean(0)
                    if np.dot(n, a - centroid) < 0:
                        s = [s[0], s[2], s[1]]
                    f.write(f"f {s[0]+1} {s[1]+1} {s[2]+1}\n")

    # -- geometry accessors (copies, reference py_mesh.cpp) -----------------

    @property
    def filename(self) -> str:
        return self._filename

    @property
    def consolidated(self) -> ConsolidatedMesh:
        self.open_file()
        return self._consolidated

    def points(self, sub_mesh: int = -1) -> np.ndarray:
        return self._slice_attr(self.consolidated.positions, sub_mesh).copy()

    def normals(self, sub_mesh: int = -1) -> np.ndarray:
        return self._slice_attr(self.consolidated.normals, sub_mesh).copy()

    def colors(self, sub_mesh: int = -1) -> np.ndarray:
        return self._slice_attr(self.consolidated.colors, sub_mesh).copy()

    def faces(self, sub_mesh: int = -1) -> np.ndarray:
        c = self.consolidated
        if sub_mesh < 0:
            return c.faces.copy()
        sm = c.sub_meshes[sub_mesh]
        return c.faces[sm.face_offset : sm.face_offset + sm.face_count].copy()

    def _slice_attr(self, arr: np.ndarray, sub_mesh: int) -> np.ndarray:
        if sub_mesh < 0:
            return arr
        sm = self.consolidated.sub_meshes[sub_mesh]
        return arr[sm.vertex_offset : sm.vertex_offset + sm.vertex_count]

    @property
    def num_sub_meshes(self) -> int:
        return len(self.consolidated.sub_meshes)

    # -- vertex editing (differentiable shape path) --------------------------

    def update_positions(self, indices, positions) -> None:
        """Update vertex positions by 1-BASED global vertex index
        (reference src/mesh.cpp:823-855 — the GT vertex-index buffer is
        1-based, 0 = background)."""
        c = self.consolidated
        idx = np.asarray(indices).reshape(-1).astype(np.int64) - 1
        if idx.size and (idx.min() < 0 or idx.max() >= c.positions.shape[0]):
            raise IndexError("vertex indices out of range (remember: 1-based)")
        c.positions[idx] = np.asarray(positions, np.float32).reshape(-1, 3)
        self._after_vertex_edit()

    def update_colors(self, indices, colors) -> None:
        c = self.consolidated
        idx = np.asarray(indices).reshape(-1).astype(np.int64) - 1
        colors = np.asarray(colors, np.float32)
        if colors.shape[-1] == 3:
            colors = np.concatenate([colors, np.ones_like(colors[..., :1])], axis=-1)
        c.colors[idx] = colors.reshape(-1, 4)
        self._dirty += 1

    def update_positions_and_colors(self, indices, positions, colors) -> None:
        self.update_positions(indices, positions)
        self.update_colors(indices, colors)

    def set_new_positions(self, positions) -> None:
        c = self.consolidated
        positions = np.asarray(positions, np.float32).reshape(-1, 3)
        if positions.shape != c.positions.shape:
            raise ValueError(f"shape mismatch: {positions.shape} vs {c.positions.shape}")
        c.positions[:] = positions
        self._after_vertex_edit()

    def set_new_colors(self, colors) -> None:
        c = self.consolidated
        colors = np.asarray(colors, np.float32)
        if colors.shape[-1] == 3:
            colors = np.concatenate([colors, np.ones_like(colors[..., :1])], axis=-1)
        c.colors[:] = colors.reshape(c.colors.shape)
        self._dirty += 1

    def recompute_normals(self) -> None:
        """Area-weighted smooth normals (reference src/mesh.cpp:763-816)."""
        c = self.consolidated
        c.normals[:] = compute_smooth_normals(c.positions, c.faces)
        self._dirty += 1

    def _after_vertex_edit(self) -> None:
        self.recompute_normals()
        self._update_raw_bbox()
        self._dirty += 1

    # -- pretransform --------------------------------------------------------

    @property
    def bbox(self) -> Range3D:
        """Bounding box with pretransform applied (reference
        src/mesh.cpp:1075-1081 transforms the two corners)."""
        P = self._pretransform
        lo = P[:3, :3] @ self._raw_bbox.min + P[:3, 3]
        hi = P[:3, :3] @ self._raw_bbox.max + P[:3, 3]
        return Range3D(np.minimum(lo, hi), np.maximum(lo, hi))

    def center_bbox(self) -> None:
        """translation := -R_rigid @ raw_bbox.center (src/mesh.cpp:1020-1024)."""
        self._pretransform_rigid[:3, 3] = -(
            self._pretransform_rigid[:3, :3] @ self._raw_bbox.center
        )
        self._update_pretransform()

    def scale_to_bbox_diagonal(self, target_diagonal: float, mode: str = "exact") -> None:
        """Set uniform scale from the RAW bbox diagonal
        (src/mesh.cpp:1026-1043)."""
        diagonal = self._raw_bbox.diagonal
        scale = target_diagonal / diagonal
        if mode == "exact":
            self._scale = float(scale)
        elif mode in ("order_of_magnitude", "OrderOfMagnitude"):
            self._scale = float(10.0 ** np.round(np.log10(scale)))
        else:
            raise ValueError(f"unknown scale mode {mode!r}")
        self._update_pretransform()

    def _update_pretransform(self) -> None:
        S = np.eye(4, dtype=np.float32) * self._scale
        S[3, 3] = 1.0
        self._pretransform = (S @ self._pretransform_rigid).astype(np.float32)
        self._dirty += 1

    @property
    def pretransform(self) -> np.ndarray:
        return self._pretransform.copy()

    @pretransform.setter
    def pretransform(self, m) -> None:
        """SVD split into uniform scale + rigid; rejects non-uniform scale
        (reference src/mesh.cpp:1050-1073)."""
        m = np.asarray(m, np.float32).reshape(4, 4)
        U, w, Vt = np.linalg.svd(m[:3, :3].astype(np.float64))
        if w.max() - w.min() > 1e-5 * max(w.max(), 1.0):
            raise ValueError(f"Scaling is not uniform: {w}")
        self._scale = float((w.max() + w.min()) / 2.0)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            # keep proper rotation (reference Magnum svd yields proper U,V)
            U[:, -1] *= -1
            R = U @ Vt
        rigid = np.eye(4, dtype=np.float32)
        rigid[:3, :3] = R.astype(np.float32)
        rigid[:3, 3] = (m[:3, 3] / self._scale).astype(np.float32)
        self._pretransform_rigid = rigid
        self._update_pretransform()

    @property
    def pretransform_rigid(self) -> np.ndarray:
        return self._pretransform_rigid.copy()

    @property
    def pretransform_scale(self) -> float:
        return self._scale

    # -- misc ---------------------------------------------------------------

    @property
    def class_index(self) -> int:
        return self._class_index

    @class_index.setter
    def class_index(self, index: int) -> None:
        if not (0 <= index <= np.iinfo(np.uint16).max):
            raise ValueError("Mesh.class_index: out of uint16 range")
        self._class_index = int(index)

    def serialize_config(self, group) -> None:
        """Corrade ConfigurationGroup form (reference src/mesh.cpp:1091-1097)."""
        group.set_value("filename", self._filename)
        group.set_value("classIndex", int(self._class_index))
        group.set_value("scale", float(self._scale))
        group.set_value("rigidPretransform", self._pretransform_rigid)

    @staticmethod
    def deserialize_config(group, cache: "MeshCache | None" = None) -> "Mesh":
        """(reference src/mesh.cpp:1099-1115 + mesh_cache.cpp:21-36)"""
        from ..utils.corrade_config import parse_matrix

        fn = group.value("filename")
        if cache is not None:
            mesh = cache.get(fn)
            if mesh is not None:
                return mesh  # cache hit skips re-deserialize (mesh_cache.cpp:27-28)
            mesh = Mesh(fn)
            cache.add([mesh])
        else:
            mesh = Mesh(fn)
        if group.has_value("classIndex"):
            mesh.class_index = int(group.value("classIndex"))
        if group.has_value("scale"):
            mesh._scale = float(group.value("scale"))
        if group.has_value("rigidPretransform"):
            mesh._pretransform_rigid = parse_matrix(group.value("rigidPretransform"))
        mesh._update_pretransform()
        return mesh

    def serialize(self) -> dict:
        """(reference src/mesh.cpp:1091-1115)"""
        return {
            "filename": self._filename,
            "classIndex": self._class_index,
            "scale": self._scale,
            "rigidPretransform": self._pretransform_rigid.reshape(-1).tolist(),
        }

    @staticmethod
    def deserialize(group: dict, cache: "MeshCache | None" = None) -> "Mesh":
        fn = group["filename"]
        if cache is not None:
            mesh = cache.get(fn)
            if mesh is None:
                mesh = Mesh(fn)
                cache.add([mesh])
        else:
            mesh = Mesh(fn)
        if "classIndex" in group:
            mesh.class_index = int(group["classIndex"])
        if "scale" in group:
            mesh._scale = float(group["scale"])
        if "rigidPretransform" in group:
            mesh._pretransform_rigid = np.array(
                group["rigidPretransform"], np.float32
            ).reshape(4, 4)
        mesh._update_pretransform()
        return mesh

    def __repr__(self):
        n = self._consolidated.num_vertices if self._consolidated else 0
        return f"Mesh({self._filename!r}, vertices={n})"


class MeshCache:
    """filename -> Mesh dedupe map used by Scene.deserialize
    (reference src/mesh_cache.cpp:21-44)."""

    def __init__(self):
        self._meshes: dict[str, Mesh] = {}
        self._lock = threading.Lock()

    def add(self, meshes: list[Mesh]) -> None:
        with self._lock:
            for m in meshes:
                self._meshes[m.filename] = m

    def get(self, filename: str) -> Mesh | None:
        with self._lock:
            return self._meshes.get(filename)

    def load(self, group: dict) -> Mesh:
        fn = group["filename"]
        with self._lock:
            mesh = self._meshes.get(fn)
        if mesh is None:
            mesh = Mesh.deserialize(group)
            self.add([mesh])
            return mesh
        return Mesh.deserialize(group, cache=self)
