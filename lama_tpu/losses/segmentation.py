"""Weighted 2-D cross entropy for ADE20k segmentation-guided ablations
(reference losses/segmentation.py:8-43), NHWC JAX."""
from typing import Optional

import jax
import jax.numpy as jnp

from .constants import weights as constant_weights


def cross_entropy_2d(predict, target, weights: Optional[str] = None,
                     ignore_label: int = 255, reduction: str = 'mean'):
    """predict: (N, H, W, C) logits; target: (N, H, W) or (N, H, W, 1) int
    labels. Pixels with label < 0 or == ignore_label are excluded."""
    if target.ndim == 4:
        target = target[..., 0]
    target = target.astype(jnp.int32)
    n_classes = predict.shape[-1]
    valid = (target >= 0) & (target != ignore_label)
    safe_target = jnp.where(valid, target, 0)

    log_probs = jax.nn.log_softmax(predict.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(log_probs, safe_target[..., None], axis=-1)[..., 0]
    loss = -picked

    if weights is not None:
        w = jnp.asarray(constant_weights[weights], jnp.float32)
        pixel_w = w[safe_target]
        loss = loss * pixel_w
        denom = jnp.sum(pixel_w * valid)
    else:
        denom = jnp.sum(valid)

    loss = loss * valid
    if reduction == 'mean':
        return jnp.sum(loss) / jnp.maximum(denom, 1e-8)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


class CrossEntropy2d:
    def __init__(self, reduction='mean', ignore_label=255, weights=None, **kwargs):
        self.reduction = reduction
        self.ignore_label = ignore_label
        self.weights = weights

    def __call__(self, predict, target):
        return cross_entropy_2d(predict, target, weights=self.weights,
                                ignore_label=self.ignore_label,
                                reduction=self.reduction)
