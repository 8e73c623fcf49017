"""Windowed gaussian SSIM, NHWC, pure JAX.

Matches the reference implementation (evaluation/losses/ssim.py:6-74,
Po-Hsun-Su port): 11×11 gaussian window sigma 1.5, per-channel depthwise
convs with zero 'same' padding, C1=0.01², C2=0.03², per-image mean
(size_average=False)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         size_average: bool = False):
    """img1, img2: NHWC float in [0,1]. Returns per-image SSIM (B,) or scalar."""
    c = img1.shape[-1]
    w2d = _gaussian_window(window_size, sigma)
    kernel = jnp.asarray(np.tile(w2d[:, :, None, None], (1, 1, 1, c)))
    pad = window_size // 2

    def filt(x):
        # Precision.HIGHEST is load-bearing: TPU's default precision truncates
        # fp32 conv operands to bf16, and the E[x²]−μ² variance cancellation
        # below then explodes on low-variance windows (observed on-chip:
        # SSIM=23.8 for one val image in the round-3 training campaign).
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel, (1, 1), ((pad, pad), (pad, pad)),
            feature_group_count=c, dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / \
               ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
