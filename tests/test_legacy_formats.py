"""3DS + DirectX .x importers (assets/legacy_formats.py) — the Assimp
exotic-format tail (reference src/mesh.cpp:219-239 extension list)."""

import struct

import numpy as np
import pytest

import stillleben_tpu as sl


def _chunk(cid: int, payload: bytes) -> bytes:
    return struct.pack("<HI", cid, 6 + len(payload)) + payload


def _make_3ds(tmp_path, with_material=True):
    """Two triangles (a quad split), one material on face 0 only."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2, 0], [0, 2, 3, 0]], np.uint16)

    v_pl = struct.pack("<H", 4) + verts.tobytes()
    uv_pl = struct.pack("<H", 4) + uvs.tobytes()
    f_pl = struct.pack("<H", 2) + faces.tobytes()
    if with_material:
        f_pl += _chunk(
            0x4130,  # MSH_MAT_GROUP: "red" owns face 0
            b"red\0" + struct.pack("<HH", 1, 0),
        )
    trimesh = _chunk(0x4110, v_pl) + _chunk(0x4140, uv_pl) + _chunk(0x4120, f_pl)
    obj = _chunk(0x4000, b"quad\0" + _chunk(0x4100, trimesh))

    mat = _chunk(
        0xAFFF,
        _chunk(0xA000, b"red\0")
        + _chunk(0xA020, _chunk(0x0011, bytes([255, 0, 0]))),
    )
    editor = _chunk(0x3D3D, mat + obj)
    blob = _chunk(0x4D4D, editor)
    path = tmp_path / "quad.3ds"
    path.write_bytes(blob)
    return path


_X_TEXT = """xof 0303txt 0032
// a unit quad with one red material on every face
Mesh quad {
 4;
 0.0;0.0;0.0;,
 1.0;0.0;0.0;,
 1.0;1.0;0.0;,
 0.0;1.0;0.0;;
 2;
 3;0,1,2;,
 3;0,2,3;;
 MeshTextureCoords {
  4;
  0.0;0.0;,
  1.0;0.0;,
  1.0;1.0;,
  0.0;1.0;;
 }
 MeshMaterialList {
  1;
  2;
  0,
  0;;
  Material red {
   1.0;0.0;0.0;1.0;;
   5.0;
   0.0;0.0;0.0;;
   0.0;0.0;0.0;;
  }
 }
}
"""


def test_load_3ds_document(tmp_path):
    from stillleben_tpu.assets.legacy_formats import load_3ds

    doc = load_3ds(str(_make_3ds(tmp_path)))
    assert len(doc.meshes) == 1
    prims = doc.meshes[0]
    # face 0 grouped to "red", face 1 falls back to the default material
    assert len(prims) == 2
    red = doc.materials[prims[0].material]
    np.testing.assert_allclose(red.base_color, [1, 0, 0, 1], atol=1 / 255)
    assert prims[1].material == -1
    total = sum(len(pr.indices) for pr in prims)
    assert total == 2
    np.testing.assert_allclose(prims[0].positions[1], [1, 0, 0])
    np.testing.assert_allclose(prims[0].texcoords[2], [1, 1])


def test_load_3ds_through_mesh(tmp_path):
    mesh = sl.Mesh(str(_make_3ds(tmp_path)), physics=False)
    lo = np.asarray(mesh.bbox.min)
    hi = np.asarray(mesh.bbox.max)
    np.testing.assert_allclose(lo, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hi, [1, 1, 0], atol=1e-6)


def test_load_3ds_rejects_non3ds(tmp_path):
    bad = tmp_path / "bad.3ds"
    bad.write_bytes(b"not a 3ds file at all")
    with pytest.raises(ValueError, match="0x4D4D"):
        sl.Mesh(str(bad), physics=False)


def test_load_x_document(tmp_path):
    from stillleben_tpu.assets.legacy_formats import load_x

    path = tmp_path / "quad.x"
    path.write_text(_X_TEXT)
    doc = load_x(str(path))
    assert len(doc.meshes) == 1
    prims = doc.meshes[0]
    assert len(prims) == 1  # both faces share material 0
    assert prims[0].indices.shape == (2, 3)
    mat = doc.materials[prims[0].material]
    np.testing.assert_allclose(mat.base_color, [1, 0, 0, 1])
    np.testing.assert_allclose(prims[0].texcoords[3], [0, 1])


def test_load_x_through_mesh(tmp_path):
    path = tmp_path / "quad.x"
    path.write_text(_X_TEXT)
    mesh = sl.Mesh(str(path), physics=False)
    np.testing.assert_allclose(np.asarray(mesh.bbox.max), [1, 1, 0], atol=1e-6)


def test_load_x_rejects_binary(tmp_path):
    path = tmp_path / "bin.x"
    path.write_bytes(b"xof 0303bin 0032" + b"\0" * 16)
    with pytest.raises(ValueError, match="text-format"):
        sl.Mesh(str(path), physics=False)
