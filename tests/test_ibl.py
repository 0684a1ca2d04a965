"""Image-based lighting tests: sIBL/.hdr loading, precompute, rendering."""

import os

import numpy as np
import pytest

import stillleben_tpu as sl


@pytest.fixture(scope="module")
def hdr_env(tmp_path_factory):
    """Synthetic equirect HDR: bright sky above (+z), dim ground below."""
    d = tmp_path_factory.mktemp("ibl")
    H, W = 64, 128
    img = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        t = y / (H - 1)  # 0 = top (+z), 1 = bottom (-z)
        img[y] = [4.0 * (1 - t) + 0.1, 4.0 * (1 - t) + 0.1, 5.0 * (1 - t) + 0.1]
    path = str(d / "env.hdr")
    import cv2

    cv2.imwrite(path, img[..., ::-1])  # cv2 writes BGR
    return path


@pytest.fixture(scope="module")
def ibl_file(hdr_env, tmp_path_factory):
    """sIBL descriptor referencing the HDR + one analytic sun."""
    d = os.path.dirname(hdr_env)
    path = os.path.join(d, "env.ibl")
    with open(path, "w") as f:
        f.write(
            "[Reflection]\n"
            "REFfile = env.hdr\n"
            "REFmap = 1\n"
            "REFgamma = 1.0\n"
            "REFmulti = 1.0\n"
            "[Sun]\n"
            "SUNcolor = 255,240,200\n"
            "SUNmulti = 2.0\n"
            "SUNu = 0.25\n"
            "SUNv = 0.2\n"
        )
    return path


def test_lightmap_precompute(hdr_env):
    lm = sl.LightMap(hdr_env)
    d = lm.data
    assert d.cubemap.shape == (6, 512, 512, 3)
    assert d.irradiance.shape == (6, 32, 32, 3)
    assert d.prefilter0.shape == (6, 128, 128, 3)
    assert d.prefilter4.shape == (6, 8, 8, 3)
    cm = np.asarray(d.cubemap)
    assert np.isfinite(cm).all()
    # +Z face (sky) brighter than -Z face (ground)
    assert cm[4].mean() > 2 * cm[5].mean()
    irr = np.asarray(d.irradiance)
    assert np.isfinite(irr).all() and irr.min() >= 0
    # irradiance also brighter looking up
    assert irr[4].mean() > irr[5].mean()


def test_ibl_descriptor_lights(ibl_file):
    lm = sl.LightMap(ibl_file)
    assert lm.light_directions.shape == (1, 3)
    assert lm.light_colors.shape == (1, 3)
    np.testing.assert_allclose(
        np.linalg.norm(lm.light_directions[0]), 1.0, atol=1e-5
    )
    # SUNmulti * color/255
    assert abs(lm.light_colors[0][0] - 2.0) < 1e-5


def test_render_with_lightmap(ibl_file, cube_glb):
    mesh = sl.Mesh(cube_glb, physics=False)
    scene = sl.Scene((64, 64))
    obj = sl.Object(mesh)
    scene.add_object(obj)
    scene.set_camera_look_at([4.0, 0.0, 1.0], [0.0, 0.0, 0.0])
    scene.light_colors = np.zeros((1, 3), np.float32)  # IBL only
    scene.light_map = sl.LightMap(ibl_file)
    scene.manual_exposure = 1.0

    res = sl.RenderPass(ssao=False).render(scene)
    rgb = np.asarray(res.rgb())
    inst = np.asarray(res.instance_index())
    on = inst == 1
    # IBL lights the object
    assert rgb[on][:, :3].mean() > 10
    # the background is the skybox (lit, alpha 1)
    bg = ~on
    assert rgb[bg][:, :3].mean() > 5
    assert np.all(rgb[bg][:, 3] == 255)
    # brute-force rasterizer path agrees (skybox-independent check): top half
    # of the image (sky direction) brighter than bottom (ground)
    assert rgb[:16, :, :3].mean() > rgb[-16:, :, :3].mean()


def test_ibl_descriptor_quirks(hdr_env, tmp_path):
    """Hand-authored sIBL quirks must not crash the parser: UTF-8 BOM,
    CRLF line endings, '%' in values (configparser interpolation trap),
    duplicated keys, mixed-case option names, unknown sections."""
    d = os.path.dirname(hdr_env)
    path = str(tmp_path / "quirky.ibl")
    body = (
        "[Header]\r\n"
        "Name = 100% Quirky Env\r\n"
        "Author = someone ; inline note\r\n"
        "[Reflection]\r\n"
        "REFFILE = env.hdr\r\n"     # mixed case
        "REFgamma = 1.0\r\n"
        "REFgamma = 1.0\r\n"        # duplicate key
        "REFmulti = 1.0\r\n"
        "[Sun]\r\n"
        "SUNcolor = 255,255,255\r\n"
        "SUNmulti = 1.0\r\n"
        "SUNu = 0.0\r\n"
        "SUNv = 0.25\r\n"
        "[Unknown Extra]\r\n"
        "weird=1\r\n"
    )
    with open(path, "wb") as f:
        f.write(b"\xef\xbb\xbf" + body.encode())
    # descriptor references env.hdr relative to its own directory
    import shutil

    shutil.copy(os.path.join(d, "env.hdr"), str(tmp_path / "env.hdr"))
    lm = sl.LightMap(path)
    assert lm.light_directions.shape[0] == 1
    assert np.isfinite(np.asarray(lm.data.cubemap)).all()

    # a non-sIBL ini gives a clear error, not a KeyError
    bad = str(tmp_path / "bad.ibl")
    with open(bad, "w") as f:
        f.write("[Header]\nName=x\n")
    with pytest.raises(ValueError, match="Reflection"):
        sl.LightMap(bad)


def test_sh_irradiance_matches_cubemap(hdr_env):
    """SH-2 irradiance reconstruction tracks the 32^2 cubemap within a few
    percent of its dynamic range (the cosine convolution leaves almost no
    energy above band 2)."""
    from stillleben_tpu.render.light_map import (
        LightMap,
        eval_irradiance_sh,
        face_directions,
        project_irradiance_sh,
    )

    import jax.numpy as jnp

    lm = LightMap(hdr_env)
    d = lm.data
    assert d.irradiance_sh is not None and d.irradiance_sh.shape == (9, 3)

    dirs = np.asarray(face_directions(8)).reshape(-1, 3)  # 384 probe dirs
    from stillleben_tpu.render.light_map import sample_cubemap

    ref = np.asarray(sample_cubemap(d.irradiance, jnp.asarray(dirs)))
    sh = np.asarray(eval_irradiance_sh(d.irradiance_sh, jnp.asarray(dirs)))
    scale = max(float(ref.max()), 1e-6)
    err = np.abs(sh - ref) / scale
    assert err.mean() < 0.03, f"mean rel err {err.mean():.3f}"
    assert err.max() < 0.15, f"max rel err {err.max():.3f}"
