"""Loss functions for the differentiation package
(reference python/stillleben/losses.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def neg_iou_loss(predict, target):
    """Negative intersection-over-union (reference losses.py:5-21).

    :param predict: BxCxHxW image
    :param target: BxCxHxW image
    :return: (scalar loss, per-pixel loss image)
    """
    predict = jnp.asarray(predict, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    dims = tuple(range(1, predict.ndim))
    _intersect = predict * target
    intersect = _intersect.sum(dims)
    _union = predict + target - predict * target
    union = _union.sum(dims) + 1e-6
    loss_img = jax.lax.stop_gradient(1.0 - _intersect / (_union + 1e-6))
    return 1.0 - (intersect / union).sum() / intersect.size, loss_img
