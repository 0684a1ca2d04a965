"""Per-object dataset annotations from a rendered result.

The reference leaves annotation assembly to its users (examples/ycb.py
renders buffers and stops); pose-estimation datasets (YCB-Video, the BOP
benchmark family) additionally need, per object: the camera-frame pose, the
2-D bounding box, visible pixel counts and the occlusion-aware visibility
fraction (BOP's ``visib_fract`` = visible px / unoccluded px). This module
computes all of it from the GT buffers the renderer already produces — the
unoccluded count via one solo re-render per object using the draw
predicate (reference render-pass predicate semantics).
"""

from __future__ import annotations

import numpy as np

__all__ = ["object_annotations"]


def _mask_bbox(mask: np.ndarray):
    """Tight [x, y, w, h] of a boolean mask, or None when empty."""
    ys, xs = np.nonzero(mask)
    if xs.size == 0:
        return None
    return [int(xs.min()), int(ys.min()),
            int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]


def object_annotations(scene, result, compute_visibility: bool = True):
    """List of per-object annotation dicts for one rendered ``result``.

    Keys: ``instance_index``, ``class_index``, ``pose`` (object->world 4x4),
    ``cam_pose`` (object->camera 4x4), ``bbox`` ([x, y, w, h] of the visible
    mask, None if fully occluded/out of frame), ``px_count_visib``, and —
    with ``compute_visibility`` — ``px_count_all`` (unoccluded solo render)
    plus ``visib_fract``. Camera intrinsics come from
    ``scene.projection_matrix`` when a consumer (e.g. a BOP writer) needs
    them.
    """
    inst = np.asarray(result.instance_index())
    world_to_cam = np.linalg.inv(np.asarray(scene.camera_pose()))

    solo_masks = {}
    if compute_visibility:
        # one cheap flat re-render per object (same geometry path) with the
        # draw predicate isolating it — its mask is the unoccluded extent
        from .render.render_pass import RenderPass

        rp = RenderPass(shading="flat", ssao=False)
        for o in scene.objects:
            solo = rp.render(scene, predicate=lambda x, o=o: x is o)
            solo_masks[o.instance_index] = (
                np.asarray(solo.instance_index()) == o.instance_index
            )

    out = []
    for o in scene.objects:
        idx = o.instance_index
        pose = np.asarray(o.pose())
        visible = inst == idx
        n_vis = int(visible.sum())
        ann = {
            "instance_index": int(idx),
            "class_index": int(o.mesh.class_index),
            "pose": pose,
            "cam_pose": world_to_cam @ pose,
            "bbox": _mask_bbox(visible),
            "px_count_visib": n_vis,
        }
        if compute_visibility:
            n_all = int(solo_masks[idx].sum())
            ann["px_count_all"] = n_all
            ann["visib_fract"] = (n_vis / n_all) if n_all else 0.0
        out.append(ann)
    return out
