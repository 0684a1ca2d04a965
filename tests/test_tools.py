"""Tests for camera_model, losses, profiling, IO, animator, job queue,
manipulation sim, viewer, debug — the auxiliary API surface."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stillleben_tpu as sl
from stillleben_tpu import camera_model, losses, profiling


def _test_img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((3, 32, 32), np.float32))


def test_chromatic_aberration_identity():
    img = _test_img()
    out = camera_model.chromatic_aberration(
        img, np.zeros((3, 2), np.float32), np.ones(3, np.float32)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_blur_preserves_mean():
    img = _test_img()
    out = camera_model.blur(img, 1.0)
    # 'same'-mode zero padding bleeds a little at the borders
    assert abs(float(out.mean()) - float(img.mean())) < 0.03


def test_exposure():
    img = jnp.full((3, 4, 4), 0.5)
    brighter = camera_model.exposure(img, -1.0)
    darker = camera_model.exposure(img, 1.0)
    assert float(brighter.mean()) > 0.5 > float(darker.mean())


def test_noise_ranges():
    img = _test_img()
    out = camera_model.noise(img, 0.04, 0.02, key=jax.random.PRNGKey(0))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(img))


def test_color_jitter_identity_and_shift():
    img = _test_img()
    out0 = camera_model.color_jitter(img, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-4)
    out1 = camera_model.color_jitter(img, 0.3)
    assert not np.allclose(np.asarray(out1), np.asarray(img), atol=1e-2)
    # jitter preserves value (max channel)
    np.testing.assert_allclose(
        np.asarray(out1.max(axis=0)), np.asarray(img.max(axis=0)), atol=1e-4
    )


def test_process_image_runs():
    img = _test_img()
    out = camera_model.process_image(img, key=jax.random.PRNGKey(1))
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_neg_iou_loss():
    a = jnp.ones((1, 1, 8, 8))
    loss_same, img = losses.neg_iou_loss(a, a)
    assert abs(float(loss_same)) < 1e-5
    b = jnp.zeros((1, 1, 8, 8))
    loss_diff, _ = losses.neg_iou_loss(a, b)
    assert float(loss_diff) > 0.9


def test_profiling_timer(capsys):
    profiling.Timer.enabled = True
    try:
        with profiling.Timer("outer"):
            with profiling.Timer("inner"):
                pass
        out = capsys.readouterr().out
        assert "outer" in out and "inner" in out
    finally:
        profiling.Timer.enabled = False


def test_image_saver_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    img16 = (np.random.default_rng(1).random((16, 16)) * 65535).astype(np.uint16)
    with sl.ImageSaver() as saver:
        saver.save(img, str(tmp_path / "a.png"))
        saver.save(img16, str(tmp_path / "b.png"))
    from PIL import Image

    back = np.asarray(Image.open(tmp_path / "a.png"))
    np.testing.assert_array_equal(back, img)
    back16 = np.asarray(Image.open(tmp_path / "b.png"))
    np.testing.assert_array_equal(back16, img16)


def test_image_loader(tmp_path):
    from PIL import Image

    for i in range(3):
        arr = np.full((8, 8, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    loader = sl.ImageLoader(str(tmp_path), seed=0)
    tex = loader.next_texture()
    assert tex.pixels.shape == (8, 8, 4)
    tex2 = loader.next_texture2d()
    assert tex2.pixels.shape == (8, 8, 4)
    loader.close()


def test_animator():
    p0 = np.eye(4, dtype=np.float32)
    p1 = np.eye(4, dtype=np.float32)
    p1[:3, 3] = [1, 0, 0]
    anim = sl.Animator([p0, p1], ticks=5)
    poses = list(anim)
    assert len(poses) == 5
    np.testing.assert_allclose(poses[0][:3, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(poses[-1][:3, 3], [1, 0, 0], atol=1e-6)
    assert poses[2][0, 3] == pytest.approx(0.5, abs=1e-6)


def test_job_queue():
    mesh = sl.Mesh("primitive://cube")
    mesh.scale_to_bbox_diagonal(0.2)
    scenes = []
    for i in range(2):
        s = sl.Scene((32, 32))
        s.seed(i)
        s.add_object(sl.Object(mesh))
        scenes.append(s)
    q = sl.JobQueue(num_threads=2)
    for s in scenes:
        q.add_scene(s)
    done = [q.retrieve_scene() for _ in scenes]
    assert set(map(id, done)) == set(map(id, scenes))
    for s in done:
        z = s.objects[0].pose()[2, 3]
        assert 0.0 < z < 1.0  # settled above the floor
    q.close()


def test_manipulation_sim():
    mesh = sl.Mesh("primitive://cube")
    mesh.scale_to_bbox_diagonal(0.2)
    scene = sl.Scene((32, 32))
    scene.gravity = [0.0, 0.0, 0.0]  # pure impedance behavior
    obj = sl.Object(mesh)
    scene.add_object(obj)
    sim = sl.ManipulationSim(scene, obj, np.eye(4, dtype=np.float32))
    goal = np.eye(4, dtype=np.float32)
    goal[:3, 3] = [0.2, 0.0, 0.0]
    for _ in range(100):
        sim.step(goal, 0.01)
    p = obj.pose()[:3, 3]
    assert p[0] > 0.05, f"manipulator did not move toward goal: {p}"
    np.testing.assert_allclose(obj.pose()[:3, :3], np.eye(3), atol=1e-5)


def test_manipulation_torque_transfer():
    """Pushing a free cube off-center must SPIN the pushed cube (reaction
    torques propagate through the solver-level joint), while the rotation
    lock keeps the manipulator itself unrotated through the contact — the
    reference D6 joint behavior (src/manipulation_sim.cpp:46-55)."""
    mesh = sl.Mesh("primitive://cube")
    mesh.scale_to_bbox_diagonal(0.2)
    scene = sl.Scene((32, 32))
    scene.gravity = [0.0, 0.0, 0.0]

    pusher = sl.Object(mesh)
    scene.add_object(pusher)
    target = sl.Object(mesh)
    tpose = np.eye(4, dtype=np.float32)
    # offset in +x, shifted in y so the push line misses the target's COM
    tpose[:3, 3] = [0.18, 0.07, 0.0]
    target.set_pose(tpose)
    scene.add_object(target)

    sim = sl.ManipulationSim(scene, pusher, np.eye(4, dtype=np.float32))
    goal = np.eye(4, dtype=np.float32)
    goal[:3, 3] = [0.35, 0.0, 0.0]
    for _ in range(120):
        sim.step(goal, 0.01)

    # the target was hit off-center: it must translate AND rotate
    assert target.pose()[0, 3] > 0.20, f"target not pushed: {target.pose()[:3, 3]}"
    spin = float(np.abs(np.asarray(target.angular_velocity)).max())
    Rt = target.pose()[:3, :3]
    rot_angle = float(np.arccos(np.clip((np.trace(Rt) - 1) / 2, -1, 1)))
    assert spin > 1e-3 or rot_angle > 5e-3, (
        f"no angular momentum transferred (spin={spin}, angle={rot_angle})"
    )
    # the manipulator's rotation lock held through the contact
    np.testing.assert_allclose(pusher.pose()[:3, :3], np.eye(3), atol=1e-5)


def test_viewer_dashboard(cube_glb):
    mesh = sl.Mesh(cube_glb, physics=False)
    scene = sl.Scene((64, 64))
    scene.add_object(sl.Object(mesh))
    scene.set_camera_look_at([3, 2, 3], [0, 0, 0])
    img = sl.Viewer(scene).dashboard()
    assert img.shape == (128, 128, 3)
    assert img.max() > 0


def test_render_debug_image(cube_glb):
    mesh = sl.Mesh(cube_glb, physics=False)
    scene = sl.Scene((64, 64))
    scene.add_object(sl.Object(mesh))
    scene.set_camera_look_at([3, 2, 3], [0, 0, 0])
    img = sl.render_debug_image(scene)
    assert img.shape == (64, 64, 4)
    # axis overlay drew some saturated pixels
    assert (img[..., :3] == 255).any()


def test_viewer_interactive_controls(cube_glb):
    """The scriptable viewer core: physics run/pause/step, object reset,
    shading/exposure controls (reference src/viewer.cpp menu semantics)."""
    mesh = sl.Mesh(cube_glb)
    scene = sl.Scene((48, 48))
    obj = sl.Object(mesh)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.0
    obj.set_pose(T)
    scene.add_object(obj)
    scene.set_camera_look_at([3.0, 0.0, 1.0], [0.0, 0.0, 0.5])

    v = sl.Viewer(scene)
    # paused: step() is a no-op
    v.step()
    np.testing.assert_allclose(scene.objects[0].pose(), T)
    # running: gravity pulls the cube down
    v.toggle_simulation()
    for _ in range(10):
        v.step()
    assert scene.objects[0].pose()[2, 3] < T[2, 3] - 1e-3
    assert v.sim_iteration == 10
    # reset restores the initial pose
    v.reset_objects()
    np.testing.assert_allclose(scene.objects[0].pose(), T)
    assert v.sim_iteration == 0
    # shading cycle + exposure + segmentation toggle all re-render fine
    v.cycle_shading()
    assert v.shading == "flat"
    v.adjust_exposure(+1.0)
    assert scene.manual_exposure == 2.0
    v.show_instances = False
    img = v.dashboard()
    assert img.shape == (96, 96, 3)


def test_viewer_play_script(cube_glb):
    """A saved interaction script drives the SAME handlers as the window
    event loop (arcball drag, zoom, keys, physics frames) and produces a
    frame per state change — the headless demonstration of interactivity
    (tools/viewer_demo.py runs the full canned session)."""
    mesh = sl.Mesh(cube_glb)
    scene = sl.Scene((48, 48))
    obj = sl.Object(mesh)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.6
    obj.set_pose(T)
    scene.add_object(obj)
    scene.set_camera_look_at([3.0, 0.0, 1.0], [0.0, 0.0, 0.5])

    v = sl.Viewer(scene)
    W, H = scene.viewport
    cam0 = scene.camera_pose().copy()
    events = [
        ("drag", (W, H), (int(W * 1.6), H), 5),  # orbit
        ("scroll", 2),                            # zoom in
        ("key", " "),                             # run physics
        ("frames", 5),                            # cube falls
        ("key", "i"),                             # class segmentation
    ]
    seen = []
    frames = v.play_script(events, frame_cb=lambda ev, img: seen.append(ev[0]))
    assert seen == ["drag", "scroll", "key", "frames", "key"]
    assert len(frames) == 5 and all(f.shape == (96, 96, 3) for f in frames)
    # the drag actually orbited the camera (rigid, radius preserved by zoom
    # semantics is covered in test_arcball_orbit)
    assert not np.allclose(scene.camera_pose(), cam0, atol=1e-4)
    # the physics frames actually advanced the simulation
    assert v.sim_iteration == 5
    assert scene.objects[0].pose()[2, 3] < 0.6 - 1e-3
    # consecutive frames differ (the script visibly changed the image)
    assert any(
        (frames[i] != frames[i + 1]).any() for i in range(len(frames) - 1)
    )


def test_arcball_orbit():
    """Arcball drags orbit the eye at constant radius and keep the pose rigid
    (reference src/utils/arc_ball.cpp behavior)."""
    from stillleben_tpu.utils.arcball import ArcBall

    ball = ArcBall(eye=[0, -3, 1], center=[0, 0, 0.5], up=[0, 0, 1], window_size=(200, 200))
    r0 = np.linalg.norm(np.asarray(ball.eye) - ball.center)
    ball.start(100, 100)
    moved = ball.drag(140, 90)
    assert moved
    r1 = np.linalg.norm(ball.eye - ball.center)
    assert abs(r1 - r0) < 1e-9  # orbit preserves radius
    T = ball.camera_pose()
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5
    # camera still looks at the center: center is on the +z axis
    c_cam = R.T @ (np.asarray(ball.center) - T[:3, 3])
    assert c_cam[2] > 0
    np.testing.assert_allclose(c_cam[:2], 0.0, atol=1e-6)
    # dolly zoom moves along the view ray
    ball.zoom(2.0)
    assert abs(np.linalg.norm(ball.eye - ball.center) - r1 / 2) < 1e-9


def test_align_session(cube_glb, tmp_path):
    """Interactive align_mesh core (reference tools/align_mesh GUI operation
    set): rotations/translations/scale compose onto the pretransform, render
    works, sidecar write round-trips through Mesh loading."""
    import shutil
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from align_mesh import AlignSession

    mesh_path = tmp_path / "cube.glb"
    shutil.copy(cube_glb, mesh_path)
    mesh = sl.Mesh(str(mesh_path), physics=False)

    s = AlignSession(mesh)
    s.rotate(2, 90.0)  # +90 about z
    s.translate(0, 0.5)
    s.scale(2.0)
    P = mesh.pretransform
    # scale is uniform 2, rotation is 90 deg about z, translation doubled+rotated
    R = P[:3, :3] / 2.0
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(R[:2, :2], [[0, -1], [1, 0]], atol=1e-5)
    img = s.render(size=(64, 64))
    assert img.shape == (64, 64, 3)

    s.write()
    mesh2 = sl.Mesh(str(mesh_path), physics=False)  # sidecar auto-loads
    np.testing.assert_allclose(mesh2.pretransform, P, atol=1e-6)


def test_align_session_web(cube_glb, tmp_path):
    """align_mesh --web: the alignment window served over HTTP (reference
    SDL2 GUI on headless hosts) — browser keys map to the same handler."""
    import json
    import shutil
    import sys
    import urllib.request

    sys.path.insert(0, "/root/repo/tools")
    from align_mesh import AlignSession

    mesh_path = tmp_path / "cube.glb"
    shutil.copy(cube_glb, mesh_path)
    mesh = sl.Mesh(str(mesh_path), physics=False)
    s = AlignSession(mesh)
    srv = s.run_web(port=0, block=False)
    try:
        def event(ev):
            req = urllib.request.Request(
                srv.url.rstrip("/") + "/event",
                data=json.dumps(ev).encode(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        P0 = np.asarray(mesh.pretransform).copy()
        out = event({"type": "key", "key": "ArrowRight", "shift": True})
        assert out["seq"] == 1  # 90-deg rotate changed state
        R = np.asarray(mesh.pretransform)[:3, :3]
        np.testing.assert_allclose(R[:2, :2], [[0, 0], [0, 0]], atol=2)
        assert not np.allclose(P0, mesh.pretransform)
        assert "axis: z" in out["status"]
        # axis select + fine translate along x
        event({"type": "key", "key": "x"})
        out = event({"type": "key", "key": "ArrowUp", "shift": False})
        assert abs(mesh.pretransform[0, 3] - P0[0, 3] - 0.01) < 1e-6
        # the frame endpoint renders the debug view
        with urllib.request.urlopen(srv.url + "frame.png", timeout=120) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        # write key produces the sidecar
        event({"type": "key", "key": "w"})
        assert (tmp_path / "cube.glb.pretransform").exists()
    finally:
        srv.close()
