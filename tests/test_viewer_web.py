"""Web viewer front-end (viewer_web.py) — the headless-host interactive
window (reference src/viewer.cpp analogue, served over HTTP)."""

import json
import urllib.request

import numpy as np
import pytest

import stillleben_tpu as sl
from stillleben_tpu.viewer import Viewer


@pytest.fixture(scope="module")
def server():
    scene = sl.Scene((64, 48))
    mesh = sl.Mesh("primitive://cube")
    obj = sl.Object(mesh)
    obj.set_pose(np.eye(4, dtype=np.float32))
    scene.add_object(obj)
    scene.set_camera_look_at([0.8, 0.6, 1.5], [0, 0, 0], up=[0, 0, 1])
    viewer = Viewer(scene)
    srv = viewer.serve(port=0, block=False)  # ephemeral port
    yield srv
    srv.close()


def _get(srv, path):
    with urllib.request.urlopen(srv.url.rstrip("/") + path, timeout=30) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _event(srv, ev):
    req = urllib.request.Request(
        srv.url.rstrip("/") + "/event",
        data=json.dumps(ev).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_index_page(server):
    status, ctype, body = _get(server, "/")
    assert status == 200 and "text/html" in ctype
    assert b"stillleben_tpu viewer" in body
    assert b"/frame.png" in body and b"/event" in body


def test_frame_png_renders(server):
    status, ctype, body = _get(server, "/frame.png?seq=0")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    import imageio.v2 as imageio

    img = imageio.imread(body)
    # 2x2 dashboard of the 64x48 viewport
    assert img.shape[:2] == (96, 128)
    assert img.any()


def test_frame_cache_reuses_png(server):
    a = _get(server, "/frame.png")[2]
    b = _get(server, "/frame.png")[2]
    assert a == b  # same seq -> cached bytes, no re-render


def test_drag_writes_camera_back(server):
    scene = server.state.viewer.scene
    before = np.asarray(scene.camera_pose()).copy()
    seq0 = _event(server, {"type": "tick"})["seq"]
    _event(server, {"type": "drag_start", "x": 30.0, "y": 40.0})
    out = _event(server, {"type": "drag", "x": 90.0, "y": 60.0})
    _event(server, {"type": "drag_end"})
    after = np.asarray(scene.camera_pose())
    assert out["seq"] > seq0  # drag produced a new frame
    assert not np.allclose(before, after)  # arcball wrote the pose back


def test_scroll_dollies(server):
    scene = server.state.viewer.scene
    before = np.asarray(scene.camera_pose())[:3, 3].copy()
    _event(server, {"type": "scroll", "n": 2})
    after = np.asarray(scene.camera_pose())[:3, 3]
    assert not np.allclose(before, after)


def test_key_controls_roundtrip(server):
    v = server.state.viewer
    exp0 = v.scene.manual_exposure
    out = _event(server, {"type": "key", "key": "+"})
    assert v.scene.manual_exposure != exp0
    assert "ssao=on" in out["status"] or "ssao=off" in out["status"]
    ssao0 = v.ssao_enabled
    _event(server, {"type": "key", "key": "o"})
    assert v.ssao_enabled is (not ssao0)
    _event(server, {"type": "key", "key": "o"})  # restore


def test_tick_steps_physics_when_running(server):
    v = server.state.viewer
    it0 = v.sim_iteration
    _event(server, {"type": "key", "key": " "})  # run
    _event(server, {"type": "tick"})
    assert v.sim_iteration == it0 + 1
    _event(server, {"type": "key", "key": " "})  # pause
    seq = _event(server, {"type": "tick"})["seq"]
    assert _event(server, {"type": "tick"})["seq"] == seq  # paused: no frames


def test_bad_routes(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/nope")
    assert ei.value.code == 404
