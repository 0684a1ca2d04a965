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
