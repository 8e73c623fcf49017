"""Gaussian blur and binary morphology for NHWC tensors.

Replaces the kornia dependency of the reference (refinement.py:4-6 uses
gaussian_blur2d + erosion; distance_weighting.py uses gaussian kernels;
fake_fakes.py uses affine warps — see ops/geometry.py). Gaussian kernel matches
the OpenCV/kornia formulation (symmetric, normalised).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    ax = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur2d(x, kernel_size, sigma, border_type='reflect'):
    """Separable gaussian blur, NHWC; kernel_size/(sigma) per (h, w)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(sigma, (int, float)):
        sigma = (float(sigma), float(sigma))
    kh = jnp.asarray(gaussian_kernel1d(kernel_size[0], sigma[0]))
    kw = jnp.asarray(gaussian_kernel1d(kernel_size[1], sigma[1]))
    c = x.shape[-1]
    ph, pw = kernel_size[0] // 2, kernel_size[1] // 2
    mode = {'reflect': 'reflect', 'replicate': 'edge', 'constant': 'constant'}[border_type]
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
    # depthwise separable: H pass then W pass
    kern_h = jnp.tile(kh.reshape(kernel_size[0], 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(kw.reshape(1, kernel_size[1], 1, 1), (1, 1, 1, c))
    dn = ('NHWC', 'HWIO', 'NHWC')
    out = jax.lax.conv_general_dilated(xp, kern_h, (1, 1), 'VALID',
                                       feature_group_count=c, dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, kern_w, (1, 1), 'VALID',
                                       feature_group_count=c, dimension_numbers=dn)
    return out


def erosion(x, kernel_size: int):
    """Binary/greyscale erosion with an all-ones square structuring element
    (kornia.morphology.erosion equivalent for flat kernels)."""
    p = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='constant',
                 constant_values=jnp.inf)
    return jax.lax.reduce_window(xp, jnp.inf, jax.lax.min,
                                 (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), 'VALID')


def dilation(x, kernel_size: int):
    p = kernel_size // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode='constant',
                 constant_values=-jnp.inf)
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                                 (1, kernel_size, kernel_size, 1), (1, 1, 1, 1), 'VALID')
