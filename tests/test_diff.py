"""Differentiable-rendering acceptance tests.

The key test mirrors the reference's tests/test_grad.py:125-153: perturb the
GT pose by +0.01 in each of the 6 pose-delta parameters, compute the image
loss gradient, backpropagate to poses, and assert the gradient component for
the perturbed parameter is POSITIVE (i.e. gradient descent walks back toward
the ground-truth pose).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stillleben_tpu as sl
from stillleben_tpu import diff


@pytest.fixture(scope="module")
def grad_scene(bunny_gltf):
    # the reference's acceptance test also uses a textured asymmetric mesh
    # (tests/test_grad.py uses a YCB object) — a symmetric cube makes the
    # rotational gradients ambiguous
    mesh = sl.Mesh(bunny_gltf, physics=False)
    mesh.center_bbox()
    mesh.scale_to_bbox_diagonal(0.3)
    scene = sl.Scene((128, 128))
    scene.seed(21)
    obj = sl.Object(mesh)
    scene.add_object(obj)
    # place in front of the camera (camera at identity, +z forward), tilted
    # so every rotation axis visibly sweeps the silhouette/texture
    from stillleben_tpu.core import math as _m
    import jax.numpy as _jnp

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(
        _m.rotation_y(_jnp.float32(0.5)) @ _m.rotation_x(_jnp.float32(0.4))
    )
    T[:3, 3] = [0.0, 0.0, 0.8]
    obj.set_pose(T)
    # ambient-only lighting + fixed exposure: the Sobel chain models pixel
    # MOTION, not shading/exposure changes, so the acceptance test isolates
    # the geometric gradient (the reference test uses a texture-dominated
    # object for the same reason)
    scene.light_colors = np.zeros((1, 3), np.float32)
    scene.ambient_light = [1.0, 1.0, 1.0]
    scene.manual_exposure = 1.0
    return scene


def _render_rgb_float(scene):
    res = sl.RenderPass(ssao=False).render(scene)
    return res, jnp.asarray(np.asarray(res.rgb())[..., :3], jnp.float32) / 255.0


def _image_loss_grad(img, target):
    """dL/dI for a blurred L2 loss, 3xHxW (the role of the reference's
    torch-autograd pyramid loss in test_grad.py:21-62)."""
    kernel = diff.gaussian_kernel(5, 1.0)

    def loss(i):
        bi = jax.vmap(lambda c: jax.scipy.signal.convolve2d(c, kernel, mode="same"))(
            i.transpose(2, 0, 1)
        )
        bt = jax.vmap(lambda c: jax.scipy.signal.convolve2d(c, kernel, mode="same"))(
            target.transpose(2, 0, 1)
        )
        return 0.5 * jnp.sum((bi - bt) ** 2)

    g = jax.grad(loss)(img)  # HxWx3
    return g.transpose(2, 0, 1)  # 3xHxW


def test_gradient_direction_all_six_params(grad_scene):
    """The 6-parameter descent-direction test (reference test_grad.py:125-153)."""
    scene = grad_scene
    obj = scene.objects[0]
    gt_pose = obj.pose()
    _, gt_img = _render_rgb_float(scene)

    failures = []
    for k in range(6):
        delta = np.zeros(6, np.float32)
        delta[k] = 0.01
        perturbed = np.asarray(diff.apply_pose_delta(gt_pose, delta))
        obj.set_pose(perturbed)
        result, img = _render_rgb_float(scene)

        dL_dI = _image_loss_grad(img, gt_img)
        grad = np.asarray(
            diff.backpropagate_gradient_to_poses(scene, result, dL_dI)
        )
        # positive gradient component -> -grad step reduces the perturbation
        if not grad[0, k] > 0:
            failures.append((k, float(grad[0, k])))
        obj.set_pose(gt_pose)

    assert not failures, f"wrong gradient direction for params: {failures}"


def test_apply_pose_delta_roundtrip():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.1, 0.2, 0.3]
    delta = np.array([0.02, -0.01, 0.03, 0.001, -0.002, 0.004], np.float32)
    out = np.asarray(diff.apply_pose_delta(pose, delta))
    # rotation stays orthonormal
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(out[:3, 3], pose[:3, 3] + delta[3:], atol=1e-6)
    # batched
    out_b = np.asarray(
        diff.apply_pose_delta(np.stack([pose, pose]), np.stack([delta, -delta]))
    )
    assert out_b.shape == (2, 4, 4)
    np.testing.assert_allclose(out_b[0], out, atol=1e-6)


def test_sobel_valid_mask_occlusion_boundary():
    inst = np.zeros((8, 8), np.int32)
    depth = np.full((8, 8), 3000.0, np.float32)
    inst[2:6, 2:6] = 1
    depth[2:6, 2:6] = 2.0
    inst[3:5, 3:5] = 2  # closer object in front
    depth[3:5, 3:5] = 1.0
    mask = np.asarray(diff.generate_sobel_valid_mask(inst, depth))
    # pixels of object 1 adjacent to the closer object 2 are invalid
    assert not mask[2, 2]  # has a diagonal neighbor from object 2 at (3,3)
    # object 2 (closer) stays valid
    assert mask[3, 3]
    # background stays valid
    assert mask[0, 0]


def test_dilate_object_mask():
    mask = np.zeros((6, 6), bool)
    mask[2:4, 2:4] = True
    valid = np.ones((6, 6), bool)
    coords = np.zeros((6, 6, 3), np.float32)
    coords[2:4, 2:4] = 5.0
    out_mask, out_coords = diff.dilate_object_mask(mask, valid, coords)
    out_mask = np.asarray(out_mask)
    assert out_mask[1, 1] and out_mask[4, 4]  # grown by 1px
    assert not out_mask[0, 0]
    # grown pixels copied neighboring object coordinates
    assert np.all(np.asarray(out_coords)[1, 2] == 5.0)


def test_bp_to_vertices_returns_indices(grad_scene):
    scene = grad_scene
    result, img = _render_rgb_float(scene)
    dL_dI = jnp.ones((3,) + img.shape[:2], jnp.float32)
    vi, gv, gc = diff.bp_to_vertices_and_colors(scene, result, dL_dI)
    assert len(vi) == 1
    assert vi[0].min() >= 1  # 1-based vertex ids
    assert vi[0].max() <= 41210
    assert gv[0].shape == (len(vi[0]), 3)
    assert gc[0].shape == (len(vi[0]), 3)


def test_soft_forward_kernel_width():
    # reference _init_diff uses an 11x11 sigma=1 Gaussian (diff.py:65)
    assert diff.KS == 11
    k = diff.gaussian_kernel(diff.KS, 1.0)
    assert k.shape == (11, 11)
    assert abs(float(k.sum()) - 1.0) < 1e-6


def test_soft_forward(grad_scene):
    scene = grad_scene
    rp = sl.RenderPass(ssao=False)
    r0 = rp.render(scene)
    r1 = rp.render(scene, depth_peel=r0)
    obs = jnp.asarray(np.asarray(r0.rgb())[..., :3], jnp.float32).transpose(2, 0, 1) / 255.0

    from stillleben_tpu.losses import neg_iou_loss

    soft, rgbs, loss_img, loss, vi, gv, gc = diff.soft_forward(
        scene, [r0, r1], obs, lambda a, b: neg_iou_loss(a, b)
    )
    assert soft.shape == obs.shape
    assert len(rgbs) == 2
    assert np.isfinite(loss)
    assert len(vi) >= 1
