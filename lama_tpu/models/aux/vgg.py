"""VGG16/19 feature extractors (torchvision layout), NHWC.

Used by: LPIPS (vgg16 relu1_2..relu5_3 slices — reference
evaluation/losses/lpips.py PNetLin/vgg16), the VGG19 perceptual loss
(losses/perceptual.py:14-85, maxpool→avgpool swap), and perceptual-similarity
mask weighting (losses/distance_weighting.py).

Conv layers are named features_<torch sequential index> so torchvision
state_dicts (features.N.weight) convert mechanically.
"""
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.conv import Conv2d, avg_pool2d, max_pool2d

Dtype = Any

VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
             512, 512, 512, 'M', 512, 512, 512, 'M']
VGG19_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
             512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']

# torch sequential indices of the relu outputs LPIPS taps (vgg16):
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG16_LPIPS_TAPS = (3, 8, 15, 22, 29)


class VGGFeatures(nn.Module):
    """Runs the `features` trunk and returns activations at `tap_indices`
    (torch sequential indices, i.e. the output *after* that layer)."""
    cfg: Sequence = tuple(VGG16_CFG)
    tap_indices: Sequence[int] = VGG16_LPIPS_TAPS
    pool: str = 'max'          # 'avg' for the perceptual-loss variant
    stop_after: Optional[int] = None  # truncate the trunk (e.g. 30 for VGG19 PL)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        idx = 0
        for v in self.cfg:
            if self.stop_after is not None and idx >= self.stop_after:
                break
            if v == 'M':
                x = max_pool2d(x, 2, 2) if self.pool == 'max' else avg_pool2d(x, 2, 2)
                if idx in self.tap_indices:
                    taps.append(x)
                idx += 1
            else:
                x = Conv2d(v, kernel_size=3, padding=1, name=f'features_{idx}',
                           dtype=self.dtype)(x)
                if idx in self.tap_indices:
                    taps.append(x)
                idx += 1
                x = jax.nn.relu(x)
                if idx in self.tap_indices:
                    taps.append(x)
                idx += 1
        return taps


# plain tuples, NOT device arrays: a module-level jnp constant would
# initialise the jax backend at import time (pinning the platform too early)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(x):
    """[0,1] RGB NHWC -> ImageNet-normalised (reference perceptual.py:10-11)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std
