import jax.numpy as jnp
import numpy as np

from stillleben_tpu.render import camera


def test_projection_pinhole_mapping():
    """A camera-space point must land at u = fx*x/z + cx, v = fy*y/z + cy."""
    W, H = 640, 480
    fx, fy, cx, cy = 525.0, 520.0, 319.5, 239.5
    P = camera.projection_from_intrinsics(fx, fy, cx, cy, W, H)
    pts = jnp.array(
        [
            [0.0, 0.0, 1.0],
            [0.1, -0.05, 0.8],
            [-0.3, 0.2, 2.0],
        ]
    )
    u, v, w = camera.project_points(P, pts, W, H)
    for i, (x, y, z) in enumerate(np.asarray(pts)):
        assert abs(float(u[i]) - (fx * x / z + cx)) < 1e-3
        assert abs(float(v[i]) - (fy * y / z + cy)) < 1e-3
        assert abs(float(w[i]) - z) < 1e-6  # clip w = camera depth


def test_projection_matches_reference_structure():
    """Against hand-evaluated reference formula (src/scene.cpp:222-253)."""
    W, H = 640, 480
    fx, fy, cx, cy = 500.0, 500.0, 320.0, 240.0
    P = np.asarray(camera.projection_from_intrinsics(fx, fy, cx, cy, W, H))
    n, f = 0.1, 10.0
    L, R = -cx * n / fx, (W - cx) * n / fx
    T, B = -cy * n / fy, (H - cy) * n / fy
    expected = np.array(
        [
            [2 * n / (R - L), 0, (R + L) / (L - R), 0],
            [0, 2 * n / (B - T), (T + B) / (T - B), 0],
            [0, 0, (f + n) / (f - n), 2 * f * n / (n - f)],
            [0, 0, 1, 0],
        ],
        dtype=np.float32,
    )
    np.testing.assert_allclose(P, expected, atol=1e-6)


def test_projection_from_fov():
    W, H = 640, 480
    P = camera.projection_from_fov(np.deg2rad(58.0), W, H)
    fx, fy, cx, cy = camera.intrinsics_from_projection(P, W, H)
    assert abs(float(fx) - W / (2 * np.tan(np.deg2rad(29)))) < 1e-2
    assert abs(float(cx) - W / 2) < 1e-4
    assert abs(float(cy) - H / 2) < 1e-4


def test_min_distance_for_diameter():
    P = camera.projection_from_fov(np.deg2rad(90.0), 640, 640)
    # 90 deg fov: P00 = 1 -> min dist for diameter d is d/2
    d = camera.minimum_distance_for_object_diameter(2.0, P)
    assert abs(float(d) - 1.0) < 1e-5


def test_rotation_correction():
    pos = jnp.array([0.0, 0.0, 3.0])
    R = camera.rotation_correction_for_translation(pos)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)
    pos2 = jnp.array([1.0, 0.5, 2.0])
    R2 = np.asarray(camera.rotation_correction_for_translation(pos2))
    # R2^T maps normalize(pos2) onto z
    mapped = R2.T @ np.asarray(pos2) / np.linalg.norm(pos2)
    np.testing.assert_allclose(mapped, [0, 0, 1], atol=1e-5)
