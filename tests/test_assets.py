import numpy as np
import pytest

from stillleben_tpu.assets.consolidate import consolidate
from stillleben_tpu.assets.convex import convex_hull, decompose
from stillleben_tpu.assets.gltf import load_gltf
from stillleben_tpu.assets.mesh import Mesh
from stillleben_tpu.assets.primitive import load_primitive


def test_cube_glb_loads(cube_glb):
    c = consolidate(load_gltf(cube_glb), "cube")
    assert c.num_vertices == 24
    assert c.num_faces == 12
    np.testing.assert_allclose(c.positions.min(0), [-1, -1, -1])
    np.testing.assert_allclose(c.positions.max(0), [1, 1, 1])
    # 1-based global vertex indices (reference consolidate.cpp:333-335)
    assert c.vertex_indices[0] == 1
    assert c.vertex_indices[-1] == 24
    # normals unit length
    np.testing.assert_allclose(np.linalg.norm(c.normals, axis=1), 1.0, atol=1e-5)


def test_bunny_loads(bunny_gltf):
    c = consolidate(load_gltf(bunny_gltf), "bunny")
    assert c.num_vertices == 41210
    assert c.num_faces == 69451
    assert len(c.images) == 1  # base color texture
    np.testing.assert_allclose(np.linalg.norm(c.normals, axis=1), 1.0, atol=1e-3)
    # tangents orthogonal to normals
    dots = np.abs(np.sum(c.normals * c.tangents[:, :3], axis=1))
    assert np.percentile(dots, 99) < 0.1


def test_primitive_cube():
    c = consolidate(load_primitive("primitive://cube"), "prim")
    assert c.num_vertices == 24
    np.testing.assert_allclose(c.positions.min(0), [-1, -1, -1])
    # winding: all face normals point outward
    v0 = c.positions[c.faces[:, 0]]
    v1 = c.positions[c.faces[:, 1]]
    v2 = c.positions[c.faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    centers = (v0 + v1 + v2) / 3
    assert np.all(np.sum(fn * centers, axis=1) > 0)


def test_convex_hull_cube_mass_properties():
    pts = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float64
    )
    h = convex_hull(pts)
    assert abs(h.volume - 8.0) < 1e-6
    np.testing.assert_allclose(h.center_of_mass, 0.0, atol=1e-6)
    # solid box inertia (unit density, m = 8): I = m/12 * (a^2+b^2) = 5.3333
    np.testing.assert_allclose(np.diag(h.inertia), 8.0 / 12 * 8.0, atol=1e-4)
    assert len(h.vertices) == 8
    assert len(h.planes) == 6
    # all vertices inside/on all planes
    d = h.vertices @ h.planes[:, :3].T + h.planes[:, 3]
    assert d.max() < 1e-5


def test_decompose_cube_single_hull(cube_glb):
    c = consolidate(load_gltf(cube_glb), "cube")
    ph = decompose(c.positions, c.faces)
    # convex object -> single-hull shortcut (reference src/mesh.cpp:424-429)
    assert len(ph.hulls) == 1
    assert abs(ph.hulls[0].volume - 8.0) < 0.01


def test_mesh_api(cube_glb):
    mesh = Mesh(cube_glb, physics=True)
    bbox = mesh.bbox
    np.testing.assert_allclose(bbox.min, [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(bbox.size, [2, 2, 2], atol=1e-6)
    assert abs(bbox.diagonal - np.sqrt(12)) < 1e-5

    mesh.scale_to_bbox_diagonal(0.1)
    assert abs(mesh.bbox.diagonal - 0.1) < 1e-6
    # order-of-magnitude mode rounds to power of 10 (src/mesh.cpp:1026-1043)
    mesh.scale_to_bbox_diagonal(0.1, mode="order_of_magnitude")
    assert abs(mesh.pretransform_scale - 0.01) < 1e-9

    mesh.center_bbox()
    np.testing.assert_allclose(mesh.bbox.center, 0.0, atol=1e-6)

    # pretransform round trip via serialize
    d = mesh.serialize()
    mesh2 = Mesh.deserialize(d)
    np.testing.assert_allclose(mesh2.pretransform, mesh.pretransform, atol=1e-6)

    # class index validation
    mesh.class_index = 7
    assert mesh.class_index == 7
    with pytest.raises(ValueError):
        mesh.class_index = 1 << 17


def test_mesh_nonuniform_scale_rejected(cube_glb):
    mesh = Mesh(cube_glb, physics=False)
    bad = np.diag([1.0, 2.0, 1.0, 1.0]).astype(np.float32)
    with pytest.raises(ValueError):
        mesh.pretransform = bad


def test_vertex_editing_one_based(cube_glb):
    mesh = Mesh(cube_glb, physics=False)
    orig = mesh.points()
    mesh.update_positions(np.array([1]), np.array([[5.0, 5.0, 5.0]]))
    assert np.allclose(mesh.points()[0], [5, 5, 5])  # index 1 -> row 0
    with pytest.raises(IndexError):
        mesh.update_positions(np.array([0]), np.array([[0.0, 0.0, 0.0]]))
    mesh.set_new_positions(orig)
    np.testing.assert_allclose(mesh.points(), orig)


def test_physics_cache_roundtrip(cube_glb, tmp_path, monkeypatch):
    import shutil

    # sidecar writes are opt-in (asset dirs may be read-only datasets)
    monkeypatch.setenv("STILLLEBEN_TPU_SIDECAR_CACHE", "1")
    local = tmp_path / "cube.glb"
    shutil.copy(cube_glb, local)
    m1 = Mesh(str(local), physics=True)
    assert (tmp_path / "cube.glb.sl_mesh.npz").exists()
    # second load hits the cache
    m2 = Mesh(str(local), physics=True)
    np.testing.assert_allclose(
        m1.physics_mesh_data["volumes"], m2.physics_mesh_data["volumes"]
    )


def test_load_threaded(cube_glb, bunny_gltf):
    meshes = Mesh.load_threaded([cube_glb, "primitive://cube"], physics=False)
    assert len(meshes) == 2
    assert meshes[0].consolidated.num_vertices == 24


def test_obj_roundtrip(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 4/4 3/3\n"
    )
    from stillleben_tpu.assets.objfile import load_obj

    doc = load_obj(str(obj))
    c = consolidate(doc, "tri")
    assert c.num_faces == 2  # fan-triangulated quad
    assert c.num_vertices == 4


def test_native_decomposition_matches_python(cube_glb):
    """The C++ decomposition (native/sl_decompose.cpp) must agree with the
    Python fallback on the selection rule and hull quality."""
    from stillleben_tpu.assets import native_decompose

    if not native_decompose.available():
        pytest.skip("native library not built (g++ unavailable)")

    c = consolidate(load_gltf(cube_glb), "cube")
    hulls = native_decompose.decompose_native(
        c.positions, c.faces.astype(np.int32), 0.002
    )
    assert hulls is not None
    assert len(hulls) == 1  # convex -> single-hull shortcut
    assert abs(hulls[0]["volume"] - 8.0) < 1e-3
    np.testing.assert_allclose(hulls[0]["center_of_mass"], 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.diag(hulls[0]["inertia"]), 8.0 / 12 * 8.0, atol=1e-2
    )
    # hull planes contain all vertices
    d = hulls[0]["vertices"] @ hulls[0]["planes"][:, :3].T + hulls[0]["planes"][:, 3]
    assert d.max() < 1e-4


def test_load_stl_binary_and_ascii(tmp_path):
    """STL import (Assimp-breadth formats, reference src/mesh.cpp:203-240):
    binary + ascii parse, independent triangles welded."""
    import struct

    import stillleben_tpu as sl

    # one right triangle + its mirror sharing an edge (4 unique verts)
    tris = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    # binary
    b = tmp_path / "quad.stl"
    with open(b, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, np.float32).tobytes())
            f.write(t.astype(np.float32).tobytes())
            f.write(b"\0\0")
    mesh = sl.Mesh(str(b), physics=False)
    c = mesh.consolidated
    assert c.num_vertices == 4  # welded
    assert c.faces.shape == (2, 3)

    # ascii
    a = tmp_path / "tri.stl"
    a.write_text(
        "solid t\n facet normal 0 0 1\n  outer loop\n"
        "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
        "  endloop\n endfacet\nendsolid t\n"
    )
    mesh2 = sl.Mesh(str(a), physics=False)
    assert mesh2.consolidated.faces.shape == (1, 3)


def test_load_off(tmp_path):
    import stillleben_tpu as sl

    p = tmp_path / "quad.off"
    p.write_text("OFF\n4 1 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n")
    mesh = sl.Mesh(str(p), physics=False)
    c = mesh.consolidated
    assert c.num_vertices == 4
    assert c.faces.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_allclose(mesh.bbox.diagonal, np.sqrt(2), atol=1e-6)


def test_load_dae(tmp_path):
    """COLLADA triangles + node transform + diffuse color."""
    import stillleben_tpu as sl

    dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_effects>
  <effect id="red-fx"><profile_COMMON><technique sid="t"><lambert>
   <diffuse><color>1 0 0 1</color></diffuse>
  </lambert></technique></profile_COMMON></effect>
 </library_effects>
 <library_materials>
  <material id="red"><instance_effect url="#red-fx"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="tri-geom"><mesh>
   <source id="pos"><float_array id="pos-arr" count="9">0 0 0 1 0 0 0 1 0</float_array>
    <technique_common><accessor source="#pos-arr" count="3" stride="3"/></technique_common>
   </source>
   <vertices id="verts"><input semantic="POSITION" source="#pos"/></vertices>
   <triangles material="red" count="1">
    <input semantic="VERTEX" source="#verts" offset="0"/>
    <p>0 1 2</p>
   </triangles>
  </mesh></geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node name="tri">
    <matrix>1 0 0 2 0 1 0 0 0 0 1 0 0 0 0 1</matrix>
    <instance_geometry url="#tri-geom"/>
   </node>
  </visual_scene>
 </library_visual_scenes>
 <scene><instance_visual_scene url="#scene"/></scene>
</COLLADA>
"""
    p = tmp_path / "tri.dae"
    p.write_text(dae)
    mesh = sl.Mesh(str(p), physics=False)
    c = mesh.consolidated
    assert c.faces.shape == (1, 3)
    # node matrix translates x by 2
    assert abs(float(c.positions[:, 0].min()) - 2.0) < 1e-6
    gm = c.materials[0]
    np.testing.assert_allclose(gm.base_color, [1, 0, 0, 1], atol=1e-6)


def _fbx_prop_L(v):
    import struct

    return b"L" + struct.pack("<q", v)


def _fbx_prop_S(s):
    import struct

    b = s.encode()
    return b"S" + struct.pack("<I", len(b)) + b


def _fbx_prop_D(v):
    import struct

    return b"D" + struct.pack("<d", v)


def _fbx_prop_arr(tag, arr, compress=False):
    import struct
    import zlib

    dt = {"d": np.float64, "i": np.int32}[tag]
    raw = np.asarray(arr, dt).tobytes()
    if compress:
        comp = zlib.compress(raw)
        return tag.encode() + struct.pack("<III", len(arr), 1, len(comp)) + comp
    return tag.encode() + struct.pack("<III", len(arr), 0, len(raw)) + raw


class _FbxWriter:
    """Just enough of a binary FBX 7.4 serializer to round-trip the loader
    (u32 node records, absolute end offsets, 13-byte null terminators)."""

    NULL = b"\x00" * 13

    def node(self, name, props=(), children=()):
        return (name.encode(), list(props), list(children))

    def _ser(self, node, base):
        import struct

        name, props, children = node
        pb = b"".join(props)
        body = pb
        hdr = 13 + len(name)
        kids = b""
        if children:
            pos = base + hdr + len(pb)
            for c in children:
                s = self._ser(c, pos)
                kids += s
                pos += len(s)
            kids += self.NULL
        end = base + hdr + len(pb) + len(kids)
        return (
            struct.pack("<IIIB", end, len(props), len(pb), len(name))
            + name
            + body
            + kids
        )

    def dumps(self, top_nodes):
        import struct

        out = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
        for n in top_nodes:
            out += self._ser(n, len(out))
        return out + self.NULL


def test_load_fbx_binary(tmp_path):
    """Binary FBX import (the biggest Assimp-breadth format, reference
    src/mesh.cpp:203-240): quads fan-triangulated, ByPolygonVertex normals,
    IndexToDirect UVs, ByPolygon material split, Model TRS transform,
    zlib-compressed arrays."""
    import stillleben_tpu as sl
    from stillleben_tpu.assets.fbxfile import load_fbx

    w = _FbxWriter()
    # unit cube (+-0.5), 6 quads
    P = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
        np.float64,
    )  # index bits: x*4 + y*2 + z
    quads = [
        [0, 1, 3, 2],  # -x
        [4, 6, 7, 5],  # +x
        [0, 4, 5, 1],  # -y
        [2, 3, 7, 6],  # +y
        [0, 2, 6, 4],  # -z
        [1, 5, 7, 3],  # +z
    ]
    pvi = []
    for q in quads:
        pvi.extend(q[:3] + [~q[3]])
    qn = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    normals = np.repeat(np.array(qn, np.float64), 4, axis=0).reshape(-1)
    uv_table = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    uv_index = np.tile(np.arange(4), 6)

    geo = w.node(
        "Geometry",
        [_fbx_prop_L(100), _fbx_prop_S("Geometry::cube\x00\x01"), _fbx_prop_S("Mesh")],
        [
            w.node("Vertices", [_fbx_prop_arr("d", P.reshape(-1), compress=True)]),
            w.node("PolygonVertexIndex", [_fbx_prop_arr("i", pvi)]),
            w.node(
                "LayerElementNormal",
                [_fbx_prop_L(0)],
                [
                    w.node("MappingInformationType", [_fbx_prop_S("ByPolygonVertex")]),
                    w.node("ReferenceInformationType", [_fbx_prop_S("Direct")]),
                    w.node("Normals", [_fbx_prop_arr("d", normals)]),
                ],
            ),
            w.node(
                "LayerElementUV",
                [_fbx_prop_L(0)],
                [
                    w.node("MappingInformationType", [_fbx_prop_S("ByPolygonVertex")]),
                    w.node("ReferenceInformationType", [_fbx_prop_S("IndexToDirect")]),
                    w.node("UV", [_fbx_prop_arr("d", uv_table.reshape(-1))]),
                    w.node("UVIndex", [_fbx_prop_arr("i", uv_index)]),
                ],
            ),
            w.node(
                "LayerElementMaterial",
                [_fbx_prop_L(0)],
                [
                    w.node("MappingInformationType", [_fbx_prop_S("ByPolygon")]),
                    w.node("ReferenceInformationType", [_fbx_prop_S("IndexToDirect")]),
                    w.node("Materials", [_fbx_prop_arr("i", [0, 0, 0, 1, 1, 1])]),
                ],
            ),
        ],
    )

    def p70(name, ptype, *vals):
        return w.node(
            "P",
            [_fbx_prop_S(name), _fbx_prop_S(ptype), _fbx_prop_S(""), _fbx_prop_S("A")]
            + [_fbx_prop_D(v) for v in vals],
        )

    model = w.node(
        "Model",
        [_fbx_prop_L(200), _fbx_prop_S("Model::cube\x00\x01"), _fbx_prop_S("Mesh")],
        [
            w.node(
                "Properties70",
                [],
                [
                    p70("Lcl Translation", "Lcl Translation", 1.0, 2.0, 3.0),
                    p70("Lcl Rotation", "Lcl Rotation", 0.0, 0.0, 90.0),
                    p70("Lcl Scaling", "Lcl Scaling", 2.0, 2.0, 2.0),
                ],
            )
        ],
    )
    mat_red = w.node(
        "Material",
        [_fbx_prop_L(300), _fbx_prop_S("Material::red\x00\x01"), _fbx_prop_S("")],
        [
            w.node(
                "Properties70", [], [p70("DiffuseColor", "Color", 0.8, 0.1, 0.2)]
            )
        ],
    )
    mat_blue = w.node(
        "Material",
        [_fbx_prop_L(301), _fbx_prop_S("Material::blue\x00\x01"), _fbx_prop_S("")],
        [
            w.node(
                "Properties70", [], [p70("DiffuseColor", "Color", 0.1, 0.2, 0.9)]
            )
        ],
    )

    def conn(child, parent):
        return w.node("C", [_fbx_prop_S("OO"), _fbx_prop_L(child), _fbx_prop_L(parent)])

    data = w.dumps(
        [
            w.node("Objects", [], [geo, model, mat_red, mat_blue]),
            w.node(
                "Connections",
                [],
                [conn(100, 200), conn(300, 200), conn(301, 200), conn(200, 0)],
            ),
        ]
    )
    path = tmp_path / "cube.fbx"
    path.write_bytes(data)

    doc = load_fbx(str(path))
    assert len(doc.meshes) == 1
    prims = doc.meshes[0]
    assert len(prims) == 2  # split by the two material slots
    assert sum(p.indices.shape[0] for p in prims) == 12  # 6 quads fanned
    by_mat = {p.material: p for p in prims}
    np.testing.assert_allclose(
        doc.materials[prims[0].material].base_color, [0.8, 0.1, 0.2, 1], atol=1e-6
    )
    assert {doc.materials[m].name for m in by_mat} == {"Material::red", "Material::blue"}
    for p in prims:
        assert p.normals is not None and p.texcoords is not None
        np.testing.assert_allclose(
            np.linalg.norm(p.normals, axis=1), 1.0, atol=1e-6
        )

    # full facade: consolidation applies the Model TRS
    mesh = sl.Mesh(str(path), physics=False)
    c = mesh.consolidated
    # +-0.5 cube, scale 2 -> +-1, Rz90 keeps the box, translate (1,2,3)
    np.testing.assert_allclose(c.positions.min(0), [0, 1, 2], atol=1e-5)
    np.testing.assert_allclose(c.positions.max(0), [2, 3, 4], atol=1e-5)


def test_load_fbx_ascii(tmp_path):
    """ASCII FBX parses into the same node tree the binary reader produces —
    same quads/normals/material-split/transform handling downstream."""
    import stillleben_tpu as sl

    quads = [
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3],
    ]
    P = [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    verts = ",".join(f"{v:.1f}" for p in P for v in p)
    pvi = ",".join(
        str(i) for q in quads for i in (q[0], q[1], q[2], ~q[3])
    )
    qn = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]
    normals = ",".join(str(float(c)) for nq in qn for _ in range(4) for c in nq)

    text = f"""; FBX 7.4.0 project file
FBXHeaderExtension:  {{
    FBXVersion: 7400
}}
Objects:  {{
    Geometry: 100, "Geometry::cube", "Mesh" {{
        Vertices: *{len(P) * 3} {{
            a: {verts}
        }}
        PolygonVertexIndex: *{len(quads) * 4} {{
            a: {pvi}
        }}
        LayerElementNormal: 0 {{
            MappingInformationType: "ByPolygonVertex"
            ReferenceInformationType: "Direct"
            Normals: *{len(quads) * 12} {{
                a: {normals}
            }}
        }}
    }}
    Model: 200, "Model::cube", "Mesh" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A", 1.0, 2.0, 3.0
            P: "Lcl Scaling", "Lcl Scaling", "", "A", 2.0, 2.0, 2.0
        }}
    }}
    Material: 300, "Material::red", "" {{
        Properties70:  {{
            P: "DiffuseColor", "Color", "", "A", 0.8, 0.1, 0.2
        }}
    }}
}}
Connections:  {{
    C: "OO", 100, 200
    C: "OO", 300, 200
    C: "OO", 200, 0
}}
"""
    path = tmp_path / "cube_ascii.fbx"
    path.write_text(text)
    mesh = sl.Mesh(str(path), physics=False)
    c = mesh.consolidated
    assert c.num_faces == 12  # 6 quads fanned
    np.testing.assert_allclose(c.positions.min(0), [0, 1, 2], atol=1e-5)
    np.testing.assert_allclose(c.positions.max(0), [2, 3, 4], atol=1e-5)
    np.testing.assert_allclose(c.materials[0].base_color, [0.8, 0.1, 0.2, 1], atol=1e-6)
