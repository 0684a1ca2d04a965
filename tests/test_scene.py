import numpy as np
import pytest

import stillleben_tpu as sl


def _cube_scene(n=2, scale=0.2, seed=0):
    scene = sl.Scene((256, 256))
    scene.seed(seed)
    mesh = sl.Mesh("primitive://cube")
    mesh.scale_to_bbox_diagonal(scale)
    for _ in range(n):
        obj = sl.Object(mesh)
        scene.add_object(obj)
    return scene


def test_default_camera():
    scene = sl.Scene((640, 480))
    P = scene.projection_matrix()
    # default 58 deg horizontal FOV (reference src/scene.cpp:138-145)
    fx = P[0, 0] * 640 / 2
    assert abs(fx - 640 / (2 * np.tan(np.deg2rad(29)))) < 0.1
    np.testing.assert_allclose(scene.camera_pose(), np.eye(4))


def test_instance_index_auto_assign():
    scene = _cube_scene(3)
    assert [o.instance_index for o in scene.objects] == [1, 2, 3]


def test_physics_gravity_and_velocity():
    """Reference tests/test_python.py:111-130 via the Scene API."""
    scene = _cube_scene(1)
    obj = scene.objects[0]
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 10]
    obj.set_pose(T)
    obj.linear_velocity = [1.0, 0.0, 0.0]
    for _ in range(10):
        scene.simulate(0.002)
    v = obj.linear_velocity
    assert abs(v[0] - 1.0) < 1e-4
    assert abs(v[2] - (-9.81 * 0.02)) < 1e-3
    p = obj.pose()[:3, 3]
    assert p[2] < 10.0


def test_tabletop_settle():
    scene = _cube_scene(3, scale=0.2, seed=42)
    scene.simulate_tabletop_scene()
    half = 0.2 / np.sqrt(12)  # cube half-extent for diagonal 0.2
    for o in scene.objects:
        p = o.pose()[:3, 3]
        # settled on/above the floor plane (top at z = 0.04), not fallen
        z_center = (o.pose() @ np.append(o.mesh.bbox.center, 1.0))[2]
        assert z_center > 0.0, f"object fell: {p}"
        assert z_center < 1.0, f"object flew away: {p}"
        assert np.linalg.norm(p[:2]) < 1.0
    # camera was repositioned to look at the pile
    cp = scene.camera_pose()
    assert not np.allclose(cp, np.eye(4))
    # objects project inside the image
    from stillleben_tpu.render.camera import project_points
    import jax.numpy as jnp

    W, H = scene.viewport
    inv = np.linalg.inv(cp)
    for o in scene.objects:
        center_world = (o.pose() @ np.append(o.mesh.bbox.center, 1.0))[:3]
        center_cam = inv[:3, :3] @ center_world + inv[:3, 3]
        u, v, w = project_points(
            jnp.asarray(scene.projection_matrix()), jnp.asarray(center_cam), W, H
        )
        assert float(w) > 0, "object behind camera"
        assert -W * 0.2 < float(u) < W * 1.2
        assert -H * 0.2 < float(v) < H * 1.2


def test_find_noncolliding_pose():
    scene = _cube_scene(2, scale=0.3, seed=1)
    a, b = scene.objects
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 1.0]
    a.set_pose(T)
    ok = scene.find_noncolliding_pose(b, sampler="random", max_iterations=20)
    assert ok
    assert not scene.is_object_colliding(b)


def test_find_noncolliding_pose_view_corrected():
    scene = _cube_scene(1, scale=0.3, seed=2)
    obj = scene.objects[0]
    ok = scene.find_noncolliding_pose(
        obj, sampler="view_corrected", orientation=np.eye(3), max_iterations=5
    )
    assert ok


def test_serialization_roundtrip(cube_glb):
    scene = sl.Scene((320, 240))
    scene.seed(3)
    mesh = sl.Mesh(cube_glb)
    mesh.scale_to_bbox_diagonal(0.5)
    obj = sl.Object(mesh)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32
    )
    T[:3, 3] = [0.1, 0.2, 0.3]
    obj.set_pose(T)
    obj.metallic = 0.7
    scene.add_object(obj)
    scene.ambient_light = [0.1, 0.2, 0.3]
    scene.manual_exposure = 2.0

    text = scene.serialize()
    scene2 = sl.Scene((320, 240))
    cache = sl.MeshCache()
    scene2.deserialize(text, cache)

    assert scene2.viewport == (320, 240)
    np.testing.assert_allclose(scene2.objects[0].pose(), T, atol=1e-6)
    np.testing.assert_allclose(
        scene2.objects[0].mesh.pretransform, mesh.pretransform, atol=1e-6
    )
    assert scene2.objects[0].metallic == pytest.approx(0.7)
    assert scene2.manual_exposure == 2.0

    # MeshCache dedupe (reference tests/basic.cpp:309-373)
    scene3 = sl.Scene((320, 240))
    scene3.deserialize(text, cache)
    assert scene3.objects[0].mesh is scene2.objects[0].mesh

    # the default format is the reference's Corrade Configuration schema
    assert text.lstrip()[0] != "{"
    assert "cameraPosition=" in text and "[object/mesh]" in text

    # the JSON alternate still round-trips
    jtext = scene.serialize(format="json")
    scene4 = sl.Scene((320, 240))
    scene4.deserialize(jtext, sl.MeshCache())
    np.testing.assert_allclose(scene4.objects[0].pose(), T, atol=1e-6)


def test_deserialize_reference_schema(cube_glb):
    """A scene file in exactly the shape the reference emits
    (src/scene.cpp:761-799, include/stillleben/scene.h:41-67: Corrade
    Configuration text, column-major matrices, x-y-z-w quaternions) loads."""
    text = f"""\
viewport=320 240
projection=1.8 0 0 0 0 2.4 0 0 0 0 -1.0002 -1 0 0 -0.20002 0
cameraPosition=0.5 -0.25 1.5
cameraRotation=0 0 0.7071068 0.7071068
ambientLight=0.1 0.2 0.3
numObjects=1
manualExposure=1.5

[light]
direction=0 0.707107 -0.707107
color=3 2.9 2.7

[object]
pose=0 1 0 0 -1 0 0 0 0 0 1 0 0.1 0.2 0.3 1
instanceIndex=1
metallic=0.25
roughness=0.6
casts_shadows=false
static=true
linearVelocityLimit=inf

[object/mesh]
filename={cube_glb}
classIndex=7
scale=1
"""
    scene = sl.Scene((64, 64))
    scene.deserialize(text, sl.MeshCache())
    assert scene.viewport == (320, 240)
    # cameraRotation is 90 deg about z (Magnum text order x y z w)
    cp = scene.camera_pose()
    np.testing.assert_allclose(cp[:3, 3], [0.5, -0.25, 1.5], atol=1e-6)
    np.testing.assert_allclose(
        cp[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )
    # column-major pose text -> row-major matrix
    obj = scene.objects[0]
    np.testing.assert_allclose(
        obj.pose()[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )
    np.testing.assert_allclose(obj.pose()[:3, 3], [0.1, 0.2, 0.3], atol=1e-6)
    assert obj.instance_index == 1
    assert obj.metallic == pytest.approx(0.25)
    assert obj.casts_shadows is False
    assert obj.static is True
    assert np.isinf(obj.linear_velocity_limit)
    assert obj.mesh.class_index == 7
    np.testing.assert_allclose(
        scene.light_directions[0], [0, 0.707107, -0.707107], atol=1e-6
    )
    np.testing.assert_allclose(scene.ambient_light, [0.1, 0.2, 0.3], atol=1e-6)
    assert scene.manual_exposure == pytest.approx(1.5)


def test_camera_look_at():
    scene = sl.Scene((100, 100))
    scene.set_camera_look_at([0, 0, 2], [0, 0, 0], up=[0, 1, 0])
    cp = scene.camera_pose()
    np.testing.assert_allclose(cp[:3, 2], [0, 0, -1], atol=1e-6)  # +z toward target


def test_pose_rigidity_check():
    scene = _cube_scene(1)
    bad = np.eye(4, dtype=np.float32)
    bad[0, 0] = 2.0
    with pytest.raises(ValueError):
        scene.objects[0].set_pose(bad)
    with pytest.raises(ValueError):
        scene.set_camera_pose(bad)


def test_find_noncolliding_pose_viewpoint():
    """Viewpoint sampler: object's +X axis faces the camera
    (reference pose.h:132-192)."""
    scene = _cube_scene(1, scale=0.3, seed=9)
    obj = scene.objects[0]
    ok = scene.find_noncolliding_pose(
        obj, sampler="viewpoint", viewpoint=[1.0, 0.0, 0.0], max_iterations=5
    )
    assert ok
    T = obj.pose()
    # the object axis mapped from the viewpoint points at the camera (origin)
    view_dir = -T[:3, 3] / np.linalg.norm(T[:3, 3])
    obj_axis_world = T[:3, :3] @ np.array([1.0, 0.0, 0.0])
    assert float(obj_axis_world @ view_dir) > 0.99


def test_place_object_randomly_in_frustum():
    scene = sl.Scene((320, 240))
    scene.seed(12)
    P = scene.projection_matrix()
    for _ in range(10):
        T = scene.place_object_randomly(diameter=0.2)
        x, y, z = T[:3, 3]
        # inside 80% of the frustum (reference pose.h:56-99)
        assert z > 0
        assert abs(x) <= 0.8 * z / P[0, 0] + 1e-5
        assert abs(y) <= 0.8 * z / P[1, 1] + 1e-5
