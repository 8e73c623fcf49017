"""Mask distance weighting — reweights the supervision mask by distance from
the hole boundary (reference losses/distance_weighting.py:9-126), NHWC JAX.

Kinds: none | blur (gaussian·mask) | edt (dilate known + blur) |
pps (iterative VGG-feature-similarity knownness propagation).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.aux.vgg import VGG19_CFG, VGGFeatures, imagenet_normalize
from ..ops.pad import pad2d
from ..ops.resize import interpolate


def dummy_distance_weighter(real_img, pred_img, mask):
    return mask


def get_gauss_kernel(kernel_size, width_factor=1):
    """The reference's unusual gaussian (distance_weighting.py:13-19):
    exp(-sum((x-c)^2)/kernel_size/width_factor), normalised."""
    coords = np.stack(np.meshgrid(np.arange(kernel_size), np.arange(kernel_size),
                                  indexing='ij'), axis=0).astype(np.float64)
    diff = np.exp(-((coords - kernel_size // 2) ** 2).sum(0) / kernel_size / width_factor)
    diff /= diff.sum()
    return diff.astype(np.float32)


def _conv_replicate(x, kernel2d):
    k = kernel2d.shape[0]
    xp = pad2d(x, k // 2, mode='replicate')
    kern = jnp.asarray(kernel2d)[:, :, None, None]
    return jax.lax.conv_general_dilated(xp, kern, (1, 1), 'VALID',
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class BlurMask:
    def __init__(self, kernel_size=5, width_factor=1):
        self.kernel = get_gauss_kernel(kernel_size, width_factor)

    def __call__(self, real_img, pred_img, mask):
        return jax.lax.stop_gradient(_conv_replicate(mask, self.kernel) * mask)


class EmulatedEDTMask:
    def __init__(self, dilate_kernel_size=5, blur_kernel_size=5, width_factor=1):
        self.dilate_kernel = np.ones((dilate_kernel_size, dilate_kernel_size), np.float32)
        self.blur_kernel = get_gauss_kernel(blur_kernel_size, width_factor)

    def __call__(self, real_img, pred_img, mask):
        known = 1 - mask
        dilated_known = (_conv_replicate(known, self.dilate_kernel) > 1).astype(mask.dtype)
        return jax.lax.stop_gradient(
            _conv_replicate(1 - dilated_known, self.blur_kernel) * mask)


class PropagatePerceptualSim:
    """Iteratively propagate 'knownness' along VGG-feature-similar directions
    (reference distance_weighting.py:52-113)."""

    def __init__(self, level=2, max_iters=10, temperature=500, erode_mask_size=3,
                 vgg_variables=None, vgg_weights_path: Optional[str] = None):
        taps, idx, relu_count = [], 0, 0
        for v in VGG19_CFG:
            if v == 'M':
                idx += 1
            else:
                idx += 2  # conv + relu
                relu_count += 1
                if relu_count == level:
                    taps.append(idx - 1)
                    break
        self.model = VGGFeatures(cfg=tuple(VGG19_CFG), tap_indices=tuple(taps),
                                 pool='avg', stop_after=taps[-1] + 1)
        if vgg_variables is None:
            vgg_variables = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
            if vgg_weights_path:
                import os
                if os.path.exists(vgg_weights_path):
                    import torch
                    from ..training.convert import torch_to_flax
                    state = torch.load(vgg_weights_path, map_location='cpu', weights_only=False)
                    vgg_variables = torch_to_flax(state, vgg_variables, model=self.model,
                                                  strict=False)
        self.variables = jax.tree.map(jax.lax.stop_gradient, vgg_variables)
        self.max_iters = max_iters
        self.temperature = temperature
        self.erode_mask_size = erode_mask_size

    def __call__(self, real_img, pred_img, mask):
        real_feats = self.model.apply(self.variables, imagenet_normalize(real_img))[0]
        # NHWC: vertical = along H (axis 1), horizontal = along W (axis 2)
        vert_sim = jnp.exp(-jnp.sum(jnp.square(real_feats[:, 1:] - real_feats[:, :-1]),
                                    axis=-1, keepdims=True) / self.temperature)
        horz_sim = jnp.exp(-jnp.sum(jnp.square(real_feats[:, :, 1:] - real_feats[:, :, :-1]),
                                    axis=-1, keepdims=True) / self.temperature)

        mask_scaled = interpolate(mask, size=real_feats.shape[1:3], mode='bilinear',
                                  align_corners=False)
        if self.erode_mask_size > 0:
            k = np.ones((self.erode_mask_size, self.erode_mask_size), np.float32)
            mask_scaled = (_conv_replicate(mask_scaled, k) > 1).astype(mask.dtype)

        knowness = 1 - mask_scaled

        def body(_, cur):
            top = pad2d(cur[:, :-1] * vert_sim, ((1, 0), (0, 0)), mode='replicate')
            bottom = pad2d(cur[:, 1:] * vert_sim, ((0, 1), (0, 0)), mode='replicate')
            left = pad2d(cur[:, :, :-1] * horz_sim, ((0, 0), (1, 0)), mode='replicate')
            right = pad2d(cur[:, :, 1:] * horz_sim, ((0, 0), (0, 1)), mode='replicate')
            new = jnp.maximum(jnp.maximum(top, bottom), jnp.maximum(left, right))
            return jnp.maximum(cur, new)

        knowness = jax.lax.fori_loop(0, self.max_iters, body, knowness)
        knowness = interpolate(knowness, size=mask.shape[1:3], mode='bilinear')
        return jax.lax.stop_gradient(jnp.minimum(mask, 1 - knowness))


def make_mask_distance_weighter(kind='none', **kwargs):
    if kind == 'none':
        return dummy_distance_weighter
    if kind == 'blur':
        return BlurMask(**kwargs)
    if kind == 'edt':
        return EmulatedEDTMask(**kwargs)
    if kind == 'pps':
        return PropagatePerceptualSim(**kwargs)
    raise ValueError(f'Unknown mask distance weighter kind {kind}')
