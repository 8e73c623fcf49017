"""FakeFakesGenerator — data-augmented "fake fakes" for discriminator
regularisation (reference training/modules/fake_fakes.py:6-47): blends
permuted / randomly-affine-warped images into the masks through a random
gradient alpha. Functional JAX with explicit PRNG keys; affine warps use
reflection padding like kornia's RandomAffine(SamplePadding.REFLECTION).
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.geometry import random_affine


class FakeFakesGenerator:
    def __init__(self, aug_proba=0.5, img_aug_degree=30, img_aug_translate=0.2):
        self.aug_proba = aug_proba
        self.img_aug_degree = img_aug_degree
        self.img_aug_translate = img_aug_translate

    def __call__(self, key, input_images, masks) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k1, k2 = jax.random.split(key)
        blend_masks = self._fill_masks_with_gradient(k1, masks)
        blend_target = self._make_blend_target(k2, input_images)
        result = input_images * (1 - blend_masks) + blend_target * blend_masks
        return result, blend_masks

    def _make_blend_target(self, key, input_images):
        b = input_images.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        permuted = input_images[jax.random.permutation(k1, b)]
        augmented = random_affine(k2, input_images, degrees=self.img_aug_degree,
                                  translate=self.img_aug_translate)
        is_aug = (jax.random.uniform(k3, (b, 1, 1, 1)) < self.aug_proba
                  ).astype(input_images.dtype)
        return augmented * is_aug + permuted * (1 - is_aug)

    def _fill_masks_with_gradient(self, key, masks):
        b, h, w, _ = masks.shape
        grad = jnp.broadcast_to(jnp.linspace(0, 1, w * 2)[None, None, :, None],
                                (b, h * 2, w * 2, 1)).astype(masks.dtype)
        grad = random_affine(key, grad, degrees=360.0, translate=0.2)
        # centre crop back to (h, w)
        top, left = h // 2, w // 2
        grad = grad[:, top:top + h, left:left + w]
        grad = grad * masks

        grad_for_min = grad + (1 - masks) * 10
        mins = jnp.min(grad_for_min.reshape(b, -1), axis=-1)[:, None, None, None]
        grad = grad - mins
        maxs = jnp.max(grad.reshape(b, -1), axis=-1)[:, None, None, None]
        grad = grad / (maxs + 1e-6)
        return jnp.clip(grad, 0, 1)
