"""Pixel and feature-matching losses (reference
saicinpainting/training/losses/feature_matching.py:7-33), NHWC."""
from typing import List, Optional

import jax.numpy as jnp

from ..ops.resize import interpolate


def masked_l1_loss(pred, target, mask, weight_known, weight_missing):
    per_pixel = jnp.abs(pred - target)
    weights = mask * weight_missing + (1 - mask) * weight_known
    return jnp.mean(weights * per_pixel)


def masked_l2_loss(pred, target, mask, weight_known, weight_missing):
    per_pixel = jnp.square(pred - target)
    weights = mask * weight_missing + (1 - mask) * weight_known
    return jnp.mean(weights * per_pixel)


def feature_matching_loss(fake_features: List, target_features: List, mask: Optional[jnp.ndarray] = None):
    if mask is None:
        losses = [jnp.mean(jnp.square(f - t)) for f, t in zip(fake_features, target_features)]
        return jnp.mean(jnp.stack(losses))
    res = 0.0
    for f, t in zip(fake_features, target_features):
        cur_mask = interpolate(mask, size=f.shape[1:3], mode='bilinear', align_corners=False)
        res = res + jnp.mean(jnp.square(f - t) * (1 - cur_mask))
    return res / len(fake_features)
