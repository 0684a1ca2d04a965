"""Physics telemetry recorder (physics/telemetry.py) — PVD-stream analogue
(reference src/context.cpp:224-234)."""

import numpy as np

import stillleben_tpu as sl
from stillleben_tpu.physics.telemetry import PhysicsTelemetry


def _scene(n=2):
    scene = sl.Scene((64, 48))
    mesh = sl.Mesh("primitive://cube")
    for _ in range(n):
        scene.add_object(sl.Object(mesh))
    return scene


def test_record_through_settle(tmp_path):
    scene = _scene()
    tele = PhysicsTelemetry()
    scene.simulate_tabletop_scene(vis_cb=tele.vis_cb(scene))
    s = tele.summary()
    assert s["frames"] >= 50  # one record per settle iteration
    assert s["bodies"] == 2
    # a settled pile ends calm and reports contact separations
    assert s["resting_at_end"]
    assert s["kinetic_last"] <= max(s["kinetic_first"], 1e-3)
    assert s["max_penetration"] < 0.02  # within solver slop
    # separations are populated by simulate() steps (physics_step reports);
    # the settle writeback is pose-only. Overlap the two cubes so the step
    # has a contact to report.
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = scene.objects[0].pose()[:3, 3]
    T[0, 3] += 0.05  # cube edge 0.1 -> 0.05 apart = interpenetrating
    scene.objects[1].set_pose(T)
    scene.simulate(0.004)
    f = tele.record(scene)
    assert f["min_separation"] is not None

    # JSONL round-trip (the extra simulate record is included)
    path = str(tmp_path / "capture.jsonl")
    tele.save(path)
    frames, summary = PhysicsTelemetry.load(path)
    assert len(frames) == tele.summary()["frames"]
    assert summary["bodies"] == 2
    np.testing.assert_allclose(
        frames[-1]["bodies"][0]["pos"],
        [b["pos"] for b in tele.frames[-1]["bodies"]][0],
    )


def test_replay_writes_poses_back():
    scene = _scene(1)
    tele = PhysicsTelemetry()
    tele.record(scene)
    p0 = scene.objects[0].pose().copy()
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.3, 0.2, 0.9]
    scene.objects[0].set_pose(T)
    tele.record(scene)
    tele.replay(scene, 0)
    np.testing.assert_allclose(scene.objects[0].pose(), p0, atol=1e-5)
    tele.replay(scene, 1)
    np.testing.assert_allclose(scene.objects[0].pose()[:3, 3], T[:3, 3],
                               atol=1e-5)


def test_redrop_detection():
    scene = _scene(1)
    tele = PhysicsTelemetry()
    tele.record(scene)
    T = scene.objects[0].pose().copy()
    T[:3, 3] = T[:3, 3] + np.array([0, 0, 1.0], np.float32)  # teleport up
    scene.objects[0].set_pose(T)
    f = tele.record(scene)
    assert f["redrops"] == 1
    assert tele.summary()["total_redrops"] == 1
