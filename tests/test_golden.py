"""Golden-image regression: the renderer's output must stay stable across
refactors (tests/golden/* were generated on the CPU backend with fixed
camera/light/exposure)."""

import os

import numpy as np
import pytest

import stillleben_tpu as sl

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def rendered(cube_glb):
    mesh = sl.Mesh(cube_glb, physics=False)
    scene = sl.Scene((160, 120))
    obj = sl.Object(mesh)
    scene.add_object(obj)
    scene.set_camera_look_at([3.0, 2.0, 3.0], [0, 0, 0])
    scene.light_directions = np.array([[-0.5, -0.3, -0.8]], np.float32)
    scene.manual_exposure = 1.0
    return sl.RenderPass(ssao=False).render(scene)


def test_golden_instance_exact(rendered):
    golden = np.load(os.path.join(GOLDEN, "cube_instance.npy"))
    inst = np.asarray(rendered.instance_index())
    # coverage identical up to a tiny tolerance for edge tie-breaks
    assert (inst != golden).mean() < 0.002


def test_golden_depth(rendered):
    golden = np.load(os.path.join(GOLDEN, "cube_depth.npy")).astype(np.float32)
    depth = np.asarray(rendered.depth())
    both = (golden < 2999) & (depth < 2999)
    assert both.sum() > 1000
    np.testing.assert_allclose(depth[both], golden[both], atol=5e-3)


def test_golden_rgb(rendered):
    from PIL import Image

    golden = np.asarray(Image.open(os.path.join(GOLDEN, "cube_rgb.png")))
    rgb = np.asarray(rendered.rgb())
    same_coverage = (golden[..., 3] > 0) == (rgb[..., 3] > 0)
    assert same_coverage.mean() > 0.998
    on = (golden[..., 3] > 0) & (rgb[..., 3] > 0)
    diff = np.abs(golden[on][:, :3].astype(int) - rgb[on][:, :3].astype(int))
    assert diff.mean() < 2.0, f"mean abs rgb diff {diff.mean()}"


@pytest.fixture(scope="module")
def rendered_default(cube_glb):
    """DEFAULT pipeline (ssao on, VSM shadows): cube above the background
    plane with a low sun — pins the out-of-box look including the contact
    shadow (reference default: render_shader.frag:321-338 4x4 PCF; our
    default is the documented VSM variant, agreement test in
    tests/test_render.py::test_vsm_shadows_match_pcf)."""
    mesh = sl.Mesh(cube_glb, physics=False)
    scene = sl.Scene((160, 120))
    obj = sl.Object(mesh)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.75
    obj.set_pose(T)
    scene.add_object(obj)
    scene.background_plane_size = [12.0, 12.0]
    scene.background_plane_color = [0.7, 0.7, 0.7, 1.0]
    scene.set_camera_look_at([6.0, 3.0, 5.0], [0, 0, 0.8])
    scene.light_directions = np.array([[-0.35, -0.25, -0.9]], np.float32)
    scene.light_colors = np.array([[3.0, 3.0, 3.0]], np.float32)
    scene.manual_exposure = 1.0
    return sl.RenderPass().render(scene)


def test_golden_shadow_rgb(rendered_default):
    from PIL import Image

    golden = np.asarray(Image.open(os.path.join(GOLDEN, "cube_shadow_rgb.png")))
    rgb = np.asarray(rendered_default.rgb())
    same_coverage = (golden[..., 3] > 0) == (rgb[..., 3] > 0)
    assert same_coverage.mean() > 0.998
    on = (golden[..., 3] > 0) & (rgb[..., 3] > 0)
    diff = np.abs(golden[on][:, :3].astype(int) - rgb[on][:, :3].astype(int))
    assert diff.mean() < 2.0, f"mean abs rgb diff {diff.mean()}"
    # the golden contains a real contact shadow; losing it must fail here
    lum = rgb[..., :3].mean(-1).astype(float)
    inst = np.asarray(rendered_default.instance_index())
    ground = (inst == 0) & (rgb[..., 3] > 0)
    assert (lum[ground] < 0.55 * np.median(lum[ground])).sum() > 20


def test_golden_shadow_instance_depth(rendered_default):
    golden_i = np.load(os.path.join(GOLDEN, "cube_shadow_instance.npy"))
    inst = np.asarray(rendered_default.instance_index())
    assert (inst != golden_i).mean() < 0.002
    golden_d = np.load(os.path.join(GOLDEN, "cube_shadow_depth.npy")).astype(
        np.float32
    )
    depth = np.asarray(rendered_default.depth())
    both = (golden_d < 2999) & (depth < 2999)
    assert both.sum() > 1000
    np.testing.assert_allclose(depth[both], golden_d[both], atol=2e-2)
